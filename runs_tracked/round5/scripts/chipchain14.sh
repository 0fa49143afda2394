#!/bin/bash
# Chip chain 14 (round 5, phase 3): small-net distillation (VERDICT #5).
#   1. distill 4x96 and 3x64 students from the run-16 replay buffer
#      (gen-2-level self-play data; search-pi + z targets)
#   2. ground-truth strength A/Bs vs best_gomoku (6x128):
#      gumbel@64 (the equal-strength workload) and puct@400 f32
#   3. throughput of the winning student at gumbel@64 (config #7 numbers)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain14.pid
LOG=runs/chipchain14.log

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

BUF=runs/models_run16/replay_buffer_latest.npz

echo "=== [$(date -u)] chain14: distill 4x96 ===" >> $LOG
run_with_retry runs/distill_4x96.log \
  python tools/distill_net.py $BUF --blocks 4 --channels 96 \
    --epochs 12 --batch 256 --out checkpoints/distill_4x96.ckpt
tail -2 runs/distill_4x96.log >> $LOG

echo "=== [$(date -u)] chain14: distill 3x64 ===" >> $LOG
run_with_retry runs/distill_3x64.log \
  python tools/distill_net.py $BUF --blocks 3 --channels 64 \
    --epochs 12 --batch 256 --out checkpoints/distill_3x64.ckpt
tail -2 runs/distill_3x64.log >> $LOG

echo "=== [$(date -u)] chain14: 4x96 vs best @ gumbel64 (n=64) ===" >> $LOG
run_with_retry runs/ab_4x96_gumbel.log \
  python tools/cross_net_arena.py checkpoints/distill_4x96.ckpt \
    checkpoints/best_gomoku.ckpt --games 64 --sims 64 --search gumbel \
    --seed 5
tail -1 runs/ab_4x96_gumbel.log >> $LOG

echo "=== [$(date -u)] chain14: 4x96 vs best @ puct400 (n=64) ===" >> $LOG
run_with_retry runs/ab_4x96_puct.log \
  python tools/cross_net_arena.py checkpoints/distill_4x96.ckpt \
    checkpoints/best_gomoku.ckpt --games 64 --sims 400 --seed 6
tail -1 runs/ab_4x96_puct.log >> $LOG

echo "=== [$(date -u)] chain14: 3x64 vs best @ gumbel64 (n=64) ===" >> $LOG
run_with_retry runs/ab_3x64_gumbel.log \
  python tools/cross_net_arena.py checkpoints/distill_3x64.ckpt \
    checkpoints/best_gomoku.ckpt --games 64 --sims 64 --search gumbel \
    --seed 7
tail -1 runs/ab_3x64_gumbel.log >> $LOG

echo "=== [$(date -u)] chain14: small-net gumbel throughput ===" >> $LOG
run_with_retry runs/bench_smallnet.log python - << 'EOF'
import json
from bench import run_bench
for blocks, ch in ((4, 96), (3, 64)):
    r = run_bench(batch_games=256, n_simulations=64, search="gumbel",
                  measure_moves=48, infer="int8", n_res_blocks=blocks,
                  channels=ch, repeats=2)
    print(json.dumps({"config7_gumbel64_int8": r["value"],
                      "net": f"{blocks}x{ch}",
                      "mfu_pct": r["detail"]["mfu_pct"],
                      "runs": r["detail"]["runs_moves_per_sec"]}),
          flush=True)
EOF
grep "config7" runs/bench_smallnet.log >> $LOG

echo "=== [$(date -u)] chain14 done, chip free ===" >> $LOG
