#!/bin/bash
# Run 10 (Pente continuation): the run-8 recipe applied to Pente —
# opening diversity 6 plies + temp 20 + int8 self-play/arenas + subtree
# reuse, track-gated with the shipped best_pente.ckpt as the protective
# anchor (TRAINING_GUIDE case study 7e). 400-sim eval arenas per 7d.
cd /root/repo
echo $$ > /tmp/run10_keepalive.pid
ANCHOR=checkpoints/best_pente.ckpt
while true; do
  SNAP=$(ls runs/models_run10/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run10/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game pente --pente-capture-planes \
    --num-iterations 150 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 --mcts-reuse-budget 192 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --temp-threshold 20 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run10 \
    --seed $((ITER + 2100)) \
    "${ARGS[@]}" >> runs/run10.log 2>&1 &
  echo $! > /tmp/run10.pid
  wait $(cat /tmp/run10.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run10.log
  LAST=$(ls runs/models_run10/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 150 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run10.log
