#!/bin/bash
# Run 14 (Pente gumbel): the run-12 recipe applied to Pente. Gumbel
# sequential-halving self-play at 64 sims/move (m=16) with capture
# planes, trained FROM the shipped best_pente.ckpt, track-gated with the
# same net as the protective anchor. Launch only after tools/gumbel_ab.py
# --game pente shows gumbel@64 holding near 0.5 vs puct@400 on
# best_pente (the run-12 protocol: validate the equal-strength search
# swap on the exact starting net before spending chip hours).
# No Dirichlet/temperature — the per-move root Gumbel explores; the
# anti-blitz lever stays the 6-ply random opening.
cd /root/repo
echo $$ > /tmp/run14_keepalive.pid
ANCHOR=checkpoints/best_pente.ckpt
while true; do
  SNAP=$(ls runs/models_run14/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run14/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game pente --pente-capture-planes \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run14 \
    --seed $((ITER + 2700)) \
    "${ARGS[@]}" >> runs/run14.log 2>&1 &
  echo $! > /tmp/run14.pid
  wait $(cat /tmp/run14.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run14.log
  LAST=$(ls runs/models_run14/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run14.log
