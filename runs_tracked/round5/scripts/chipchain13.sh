#!/bin/bash
# Chip chain 13 (round 5, phase 2): int8 fused-tower decisive measurement
# + corrected backend parity + gumbel flip-rate bound + run-16 closure.
#   1. net_microbench int8 vs int8_tower at b128/256 (VERDICT #1 lever b)
#   2. bench --infer int8t configs #3 and #6
#   3. CORRECTED device_parity (round-4 version compared packed to itself)
#   4. gumbel_flip_probe: >=1k positions + packed-vs-XLA mirrored arena
#   5. iter70 vs best_gomoku at n=128 (run-16 final word)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain13.pid
LOG=runs/chipchain13.log

run_with_retry() {
  local OUT=$1; shift
  local RC=0
  for attempt in 1 2 3 4 5; do
    timeout 3000 "$@" > "$OUT" 2>&1
    RC=$?
    grep -q "not in the list of known backends" "$OUT" || break
    echo "[$(date -u)] tunnel busy; retry $attempt" >> $LOG
    sleep 150
  done
  return $RC
}

echo "=== [$(date -u)] chain13: net_microbench int8 vs tower ===" >> $LOG
run_with_retry runs/int8t_microbench.log \
  python tools/net_microbench.py --batches 128 256 --iters 100 --only int8
grep '"mode"' runs/int8t_microbench.log >> $LOG

echo "=== [$(date -u)] chain13: bench int8t config #3 + #6 ===" >> $LOG
run_with_retry runs/bench_int8t.log python - << 'EOF'
import json
from bench import run_bench
for tile in (8, 16):
    r3 = run_bench(batch_games=256, measure_moves=24, infer="int8t",
                   int8t_tile=tile, repeats=2)
    print(json.dumps({"config3_int8t": r3["value"], "tile": tile,
                      "mfu_pct": r3["detail"]["mfu_pct"],
                      "runs": r3["detail"]["runs_moves_per_sec"]}),
          flush=True)
r6 = run_bench(batch_games=256, n_simulations=64, search="gumbel",
               measure_moves=48, infer="int8t", repeats=2)
print(json.dumps({"config6_int8t": r6["value"],
                  "mfu_pct": r6["detail"]["mfu_pct"],
                  "runs": r6["detail"]["runs_moves_per_sec"]}), flush=True)
EOF
grep "config" runs/bench_int8t.log >> $LOG

echo "=== [$(date -u)] chain13: corrected device_parity ===" >> $LOG
run_with_retry runs/device_parity_r5.log python tools/device_parity.py
tail -2 runs/device_parity_r5.log >> $LOG

echo "=== [$(date -u)] chain13: gumbel flip probe ===" >> $LOG
run_with_retry runs/gumbel_flip.log python tools/gumbel_flip_probe.py \
  --ckpt checkpoints/best_gomoku.ckpt --sims 64 --m 16 --batch 192 \
  --arena-games 64
tail -3 runs/gumbel_flip.log >> $LOG

echo "=== [$(date -u)] chain13: iter70 vs best (n=128) ===" >> $LOG
run_with_retry runs/run16_70best.log \
  python tools/compare_snapshots.py \
    runs/models_run16/snapshot_iter70_20260821_023739.ckpt \
    checkpoints/best_gomoku.ckpt \
    --games 128 --sims 400 --seed 81
tail -1 runs/run16_70best.log >> $LOG

echo "=== [$(date -u)] chain13 done, chip free ===" >> $LOG
