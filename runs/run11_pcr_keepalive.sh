#!/bin/bash
# Run 11 (PCR validation): the run-8/9 anti-blitz recipe with playout cap
# randomization on (--pcr-cheap-sims 100 --pcr-full-prob 0.3): ~2.1x
# cheaper value data per game (0.3*400 + 0.7*100 = 190 sims/ply mean),
# policy targets only from full-search plies. Gate-watched like every
# new data lever (track gate + shipped-best anchor arena every 10).
cd /root/repo
echo $$ > /tmp/run11_keepalive.pid
ANCHOR=checkpoints/best_gomoku.ckpt
while true; do
  SNAP=$(ls runs/models_run11/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run11/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 --mcts-reuse-budget 192 \
    --pcr-cheap-sims 100 --pcr-full-prob 0.3 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --temp-threshold 20 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run11 \
    --seed $((ITER + 2300)) \
    "${ARGS[@]}" >> runs/run11.log 2>&1 &
  echo $! > /tmp/run11.pid
  wait $(cat /tmp/run11.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run11.log
  LAST=$(ls runs/models_run11/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run11.log
