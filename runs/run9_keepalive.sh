#!/bin/bash
# Run 9: first long training run with cross-move subtree reuse ON in
# self-play (--mcts-reuse-budget 192: ~45% of each move's 400 sims
# recur per tools/tt_rate_probe.py, so the kept prefix makes each move
# search effectively deeper at the same cost — changes pi targets,
# standard AZ practice; gate-watched per ROADMAP 5b). Everything else is
# the run-8 anti-blitz DATA recipe that finally beat the shipped peak
# (opening diversity 6 plies + temp 20 + int8 self-play + track gate).
# Starts from and anchors against the run-8 promoted best.
cd /root/repo
echo $$ > /tmp/run9_keepalive.pid
ANCHOR=checkpoints/best_gomoku.ckpt
while true; do
  SNAP=$(ls runs/models_run9/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run9/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 --mcts-reuse-budget 192 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --temp-threshold 20 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run9 \
    --seed $((ITER + 1900)) \
    "${ARGS[@]}" >> runs/run9.log 2>&1 &
  echo $! > /tmp/run9.pid
  wait $(cat /tmp/run9.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run9.log
  LAST=$(ls runs/models_run9/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run9.log
