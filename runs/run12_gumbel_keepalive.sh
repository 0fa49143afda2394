#!/bin/bash
# Run 12 (EXPERIMENTAL — launch only if tools/gumbel_ab.py on the chip
# shows gumbel@64-100 holding near 0.5 vs puct@400): gumbel self-play at
# 64 sims/move — ~6x fewer simulations per move than the run-8/9 recipe,
# i.e. several times more games per hour into the buffer. Policy targets
# are the completed-Q improved policies; no Dirichlet/temperature (the
# per-move root Gumbel explores), so the anti-blitz lever stays the
# 6-ply random opening. Track-gated with the shipped best as anchor;
# eval arenas ALSO gumbel (400 sims) for internal consistency — the
# anchor arena is the absolute cross-check.
cd /root/repo
echo $$ > /tmp/run12_keepalive.pid
ANCHOR=checkpoints/best_gomoku.ckpt
while true; do
  SNAP=$(ls runs/models_run12/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run12/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run12 \
    --seed $((ITER + 2500)) \
    "${ARGS[@]}" >> runs/run12.log 2>&1 &
  echo $! > /tmp/run12.pid
  wait $(cat /tmp/run12.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run12.log
  LAST=$(ls runs/models_run12/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run12.log
