#!/bin/bash
# run-17 (round 5, VERDICT #8): pente plateau probe — ONE recipe change.
#
# run-14 promoted at iter-70 then plateaued through iter-210 (0.52-0.56
# vs iter-70, no promotion).  The named change: a FRESH buffer restart
# from the shipped best (the run-16 gomoku pattern), 50 iterations,
# anchor track at the promotion config (f32 puct@400 vs best_pente
# every 10 iters).  Promote on CI-low > 0.5 at n>=128 ground truth
# (TRAINING_GUIDE 7i: never promote off one n=64 anchor reading);
# otherwise write the plateau post-mortem.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

ANCHOR=checkpoints/best_pente.ckpt
DIR=runs/models_run17
echo $$ > /tmp/run17_keepalive.pid
while true; do
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path $DIR/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  python train.py \
    --board-size 15 --game pente --pente-capture-planes \
    --num-iterations 50 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 --eval-every 2 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --anchor-search puct --anchor-mcts-simulations 400 \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir $DIR \
    --seed $((ITER + 5100)) \
    "${ARGS[@]}" >> runs/run17.log 2>&1 &
  echo $! > /tmp/run17.pid
  SEG=$(cat /tmp/run17.pid)
  while kill -0 "$SEG" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y runs/run17.log) ))
    if [ "$AGE" -gt 600 ]; then
      echo "[keepalive] log stalled ${AGE}s — killing wedged segment $(date -u)" >> runs/run17.log
      kill "$SEG" 2>/dev/null; sleep 10; kill -9 "$SEG" 2>/dev/null
      break
    fi
  done
  wait "$SEG" 2>/dev/null
  echo "[keepalive] segment ended at $(date -u)" >> runs/run17.log
  LAST=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 50 ] && break
  sleep 180   # let this cycle's dead claim expire before re-attaching
done
echo "[keepalive] run-17 complete at $(date -u)" >> runs/run17.log
