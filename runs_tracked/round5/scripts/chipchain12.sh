#!/bin/bash
# Chip chain 12 (round 5, phase 1): run-16 closure + fault axes + profile.
#   1. search_cost_split at the headline shape (lever decision, VERDICT #1)
#   2. run-16 promotion arena: iter-40 peak vs best_gomoku, n=128, f32
#      puct@400 (VERDICT #2)
#   3. decline diagnosis head-to-heads: iter70-vs-iter40, iter50-vs-iter40
#   4. parent+pallas full-length probe under claim discipline (VERDICT #3)
#   5. batch-512 xla axis (VERDICT #3, chain-11 leftover)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain12.pid
LOG=runs/chipchain12.log

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

echo "=== [$(date -u)] chain12: search_cost_split b256@400 ===" >> $LOG
run_with_retry runs/cost_split_r5.log \
  python tools/search_cost_split.py --batches 256 --sims 400 --moves 16
tail -2 runs/cost_split_r5.log >> $LOG

echo "=== [$(date -u)] chain12: run-16 promotion arena iter40 vs best (n=128, f32 puct@400) ===" >> $LOG
run_with_retry runs/run16_promo_arena.log \
  python tools/compare_snapshots.py \
    runs_tracked/run16/snapshot_iter40_anchor594.ckpt \
    checkpoints/best_gomoku.ckpt \
    --games 128 --sims 400 --seed 77
tail -1 runs/run16_promo_arena.log >> $LOG

echo "=== [$(date -u)] chain12: iter70 vs iter40 (n=64) ===" >> $LOG
run_with_retry runs/run16_7040.log \
  python tools/compare_snapshots.py \
    runs/models_run16/snapshot_iter70_20260821_023739.ckpt \
    runs_tracked/run16/snapshot_iter40_anchor594.ckpt \
    --games 64 --sims 400 --seed 78
tail -1 runs/run16_7040.log >> $LOG

echo "=== [$(date -u)] chain12: iter50 vs iter40 (n=64) ===" >> $LOG
run_with_retry runs/run16_5040.log \
  python tools/compare_snapshots.py \
    runs/models_run16/snapshot_iter50_20260821_023002.ckpt \
    runs_tracked/run16/snapshot_iter40_anchor594.ckpt \
    --games 64 --sims 400 --seed 79
tail -1 runs/run16_5040.log >> $LOG

echo "=== [$(date -u)] chain12: parent+pallas longrun (prod shape) ===" >> $LOG
run_with_retry runs/parent_longrun.log \
  python repro/parent_pallas_longrun.py 10
RC=$?
if grep -q "DONE parent@cap56" runs/parent_longrun.log; then
  echo "parent longrun CLEAN" >> $LOG
else
  echo "parent longrun FAULT rc=$RC (see runs/parent_longrun.log)" >> $LOG
  tail -5 runs/parent_longrun.log >> $LOG
fi
sleep 150

echo "=== [$(date -u)] chain12: batch-512 xla axis ===" >> $LOG
run_with_retry runs/bisect512_r5.log \
  python repro/bisect_batch512_fault.py selfplay 512 400 48 f32 xla
RC=$?
echo "xla-512 rc=$RC" >> $LOG
tail -3 runs/bisect512_r5.log >> $LOG

echo "=== [$(date -u)] chain12 done, chip free ===" >> $LOG
