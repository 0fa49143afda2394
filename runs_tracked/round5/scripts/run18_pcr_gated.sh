#!/bin/bash
# run-18 (round 5, VERDICT #6): PCR to a gate — run it or retire it.
#
# Playout-cap randomization (KataGo 1902.10565; --pcr-cheap-sims) has
# been CPU-validated but never trained.  This is the run-11 recipe
# (puct@400 self-play, cheap@100 at p=0.7) from best_gomoku with a
# fresh buffer, capped at 40 iterations, anchor track at the promotion
# config every 10.  Verdict written to DECISIONS either way:
# promoted / neutral (trajectory comparable to run-16's 40-iter band at
# comparable wall-clock) / harmful.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

ANCHOR=checkpoints/best_gomoku.ckpt
DIR=runs/models_run18
echo $$ > /tmp/run18_keepalive.pid
while true; do
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path $DIR/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 40 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 --mcts-reuse-budget 192 \
    --pcr-cheap-sims 100 --pcr-full-prob 0.3 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 --eval-every 2 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --anchor-search puct --anchor-mcts-simulations 400 \
    --temp-threshold 20 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir $DIR \
    --seed $((ITER + 5300)) \
    "${ARGS[@]}" >> runs/run18.log 2>&1 &
  echo $! > /tmp/run18.pid
  SEG=$(cat /tmp/run18.pid)
  while kill -0 "$SEG" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y runs/run18.log) ))
    if [ "$AGE" -gt 600 ]; then
      echo "[keepalive] log stalled ${AGE}s — killing wedged segment $(date -u)" >> runs/run18.log
      kill "$SEG" 2>/dev/null; sleep 10; kill -9 "$SEG" 2>/dev/null
      break
    fi
  done
  wait "$SEG" 2>/dev/null
  echo "[keepalive] segment ended at $(date -u)" >> runs/run18.log
  LAST=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 40 ] && break
  sleep 180
done
echo "[keepalive] run-18 complete at $(date -u)" >> runs/run18.log
