#!/bin/bash
# Chip chain 15 (round 5): probe re-runs between chain14 and run-17.
#   1. fixed matmul-rate probe (independent dots, K=128 and K=1152)
#   2. gumbel flip probe at batch 128 (lane-tiling multiple), 1024 pos
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain15.pid
LOG=runs/chipchain15.log

run_with_retry() {
  local OUT=$1; shift
  local RC=0
  for attempt in 1 2 3 4 5; do
    timeout 2400 "$@" > "$OUT" 2>&1
    RC=$?
    grep -q "not in the list of known backends" "$OUT" || break
    echo "[$(date -u)] tunnel busy; retry $attempt" >> $LOG
    sleep 150
  done
  return $RC
}

echo "=== [$(date -u)] chain15: fixed matmul rate probe ===" >> $LOG
run_with_retry runs/mosaic_matmul_rate2.log \
  python tools/mosaic_matmul_rate.py
tail -1 runs/mosaic_matmul_rate2.log >> $LOG

echo "=== [$(date -u)] chain15: gumbel flip probe (batch 128) ===" >> $LOG
run_with_retry runs/gumbel_flip.log python tools/gumbel_flip_probe.py \
  --ckpt checkpoints/best_gomoku.ckpt --sims 64 --m 16 --batch 128 \
  --plies 2 4 6 10 14 18 22 26 --arena-games 64
tail -3 runs/gumbel_flip.log >> $LOG

echo "=== [$(date -u)] chain15 done ===" >> $LOG
