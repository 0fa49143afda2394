#!/bin/bash
# run-20 (round 5): gomoku gen-2 with fpu_mode=parent self-play — the
# axis unblocked by closing the parent+pallas fault (DECISIONS round 5).
# Same recipe as run-16 (the control: anchor band 0.33-0.59 over 50
# iters) with parent-FPU search in self-play AND the candidate arena.
#
# run-15 established the recipe is sound (iter-200 at parity puct@400,
# BETTER at low budgets, trajectory ascending) but its artifacts died
# uncommitted in a VM reboot, twice.  This is the same gen-2 recipe
# restarted from the committed checkpoints/best_gomoku.ckpt with a
# fresh buffer, PLUS:
#   - the round-3 anchor fix: anchor arena at the PROMOTION config
#     (f32 puct@400), not the training config (gumbel@64) that hid
#     run-15's recovery;
#   - artifact discipline: runs/run20_commit_loop.sh snapshots the
#     newest checkpoint + history + buffer manifest into the TRACKED
#     runs_tracked/run20/ dir and commits hourly — /runs/ is gitignored
#     and does not survive reboots (TRAINING_GUIDE case study 7h).
#
# Keepalive pattern: relaunch on segment death (axon tunnel resets);
# pid files for external stop/harvest.  Probe the device first — a
# backend-init failure right after boot is transient.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

ANCHOR=checkpoints/best_gomoku.ckpt
DIR=runs/models_run20
echo $$ > /tmp/run20_keepalive.pid
while true; do
  # NO separate probe process: every probe leaves a dead claim on the
  # relay, and a segment launched right behind one queues its first
  # device execution behind the stale claim forever (round-4 wedge
  # pattern: banner prints, then futex-wait with zero progress).  The
  # segment IS the probe — the stall watchdog below reaps it if the
  # worker is genuinely wedged, and the inter-cycle sleep lets our own
  # claim expire before the next attach.
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path $DIR/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 50 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --mcts-fpu-mode parent \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 --eval-every 2 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --anchor-search puct --anchor-mcts-simulations 400 \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir $DIR \
    --seed $((ITER + 6100)) \
    "${ARGS[@]}" >> runs/run20.log 2>&1 &
  echo $! > /tmp/run20.pid
  # stall watchdog: a segment whose log stops advancing for 10 min is
  # host-futex-waiting on a wedged device program (iter-32 hang, round
  # 4) — kill it so the probe loop can wait out the worker instead
  SEG=$(cat /tmp/run20.pid)
  while kill -0 "$SEG" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y runs/run20.log) ))
    if [ "$AGE" -gt 600 ]; then
      echo "[keepalive] log stalled ${AGE}s — killing wedged segment $(date -u)" >> runs/run20.log
      kill "$SEG" 2>/dev/null
      sleep 10
      kill -9 "$SEG" 2>/dev/null
      break
    fi
  done
  wait "$SEG" 2>/dev/null
  echo "[keepalive] segment ended at $(date -u)" >> runs/run20.log
  LAST=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 50 ] && break
  sleep 180   # let this cycle's dead claim expire before re-attaching
done
echo "[keepalive] run complete at $(date -u)" >> runs/run20.log
