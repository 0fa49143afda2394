#!/bin/bash
# Chip chain 19: run-20 ground-truth arenas (7i rule) then run-21.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
LOG=runs/chipchain19.log
echo $$ > /tmp/chipchain19.pid

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

echo "=== [$(date -u)] chain19: run20 iter40 vs best (n=128) ===" >> $LOG
run_with_retry runs/run20_promo40.log python tools/compare_snapshots.py \
  runs/models_run20/snapshot_iter40_20260821_102103.ckpt \
  checkpoints/best_gomoku.ckpt --games 128 --sims 400 --seed 50
tail -1 runs/run20_promo40.log >> $LOG

echo "=== [$(date -u)] chain19: run20 iter50 vs best (n=128) ===" >> $LOG
run_with_retry runs/run20_promo50.log python tools/compare_snapshots.py \
  runs/models_run20/snapshot_iter50_20260821_102449.ckpt \
  checkpoints/best_gomoku.ckpt --games 128 --sims 400 --seed 51
tail -1 runs/run20_promo50.log >> $LOG
echo "=== [$(date -u)] chain19 done ===" >> $LOG

sleep 180
bash /root/repo/runs/run21_pente_gen3.sh
