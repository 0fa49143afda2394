#!/bin/bash
# Chip chain 18 (round 5): equal-wall-clock small-net A/Bs + throughput.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain18.pid
LOG=runs/chipchain18.log
S=runs/models_run19/snapshot_iter200_20260821_094115.ckpt

run_with_retry() {
  local OUT=$1; shift
  for attempt in 1 2 3 4 5; do
    timeout 2400 "$@" > "$OUT" 2>&1
    RC=$?
    grep -q "not in the list of known backends" "$OUT" || break
    sleep 150
  done
  return $RC
}

echo "=== [$(date -u)] chain18: student@96 vs best@64 (equal wall-clock, n=128) ===" >> $LOG
run_with_retry runs/ab_eqwc_96.log python tools/cross_net_arena.py \
  "$S" checkpoints/best_gomoku.ckpt --games 128 --sims 96 --sims-b 64 \
  --search gumbel --seed 41
tail -1 runs/ab_eqwc_96.log >> $LOG

echo "=== [$(date -u)] chain18: student@128 vs best@64 (n=128) ===" >> $LOG
run_with_retry runs/ab_eqwc_128.log python tools/cross_net_arena.py \
  "$S" checkpoints/best_gomoku.ckpt --games 128 --sims 128 --sims-b 64 \
  --search gumbel --seed 42
tail -1 runs/ab_eqwc_128.log >> $LOG

echo "=== [$(date -u)] chain18: student gumbel@96 throughput ===" >> $LOG
run_with_retry runs/bench_student96.log python - << 'PYEOF'
import json
from bench import run_bench
r = run_bench(batch_games=256, n_simulations=96, search="gumbel",
              measure_moves=48, infer="int8", n_res_blocks=4,
              channels=96, repeats=2)
print(json.dumps({"student_gumbel96_int8": r["value"],
                  "mfu_pct": r["detail"]["mfu_pct"],
                  "runs": r["detail"]["runs_moves_per_sec"]}), flush=True)
PYEOF
tail -1 runs/bench_student96.log >> $LOG
echo "=== [$(date -u)] chain18 done, chip free ===" >> $LOG
