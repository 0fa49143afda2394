#!/bin/bash
# Chip chain 13b (round 5): resumed chain 13 minus the t16/t32 tower
# variants (t16's Mosaic compile hung the worker-side compile >10 min —
# killed; the t8 number, 2.47 ms/eval vs 0.57 XLA int8, already settles
# the end-to-end verdict).  Adds the matmul-rate probe that explains it.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain13b.pid
LOG=runs/chipchain13.log

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

echo "=== [$(date -u)] chain13b: mosaic matmul rate probe ===" >> $LOG
run_with_retry runs/mosaic_matmul_rate.log \
  python tools/mosaic_matmul_rate.py
tail -1 runs/mosaic_matmul_rate.log >> $LOG

echo "=== [$(date -u)] chain13b: corrected device_parity ===" >> $LOG
run_with_retry runs/device_parity_r5.log python tools/device_parity.py
tail -2 runs/device_parity_r5.log >> $LOG

echo "=== [$(date -u)] chain13b: gumbel flip probe ===" >> $LOG
run_with_retry runs/gumbel_flip.log python tools/gumbel_flip_probe.py \
  --ckpt checkpoints/best_gomoku.ckpt --sims 64 --m 16 --batch 192 \
  --arena-games 64
tail -3 runs/gumbel_flip.log >> $LOG

echo "=== [$(date -u)] chain13b: iter70 vs best (n=128) ===" >> $LOG
run_with_retry runs/run16_70best.log \
  python tools/compare_snapshots.py \
    runs/models_run16/snapshot_iter70_20260821_023739.ckpt \
    checkpoints/best_gomoku.ckpt \
    --games 128 --sims 400 --seed 81
tail -1 runs/run16_70best.log >> $LOG

echo "=== [$(date -u)] chain13 done, chip free ===" >> $LOG
