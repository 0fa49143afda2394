#!/bin/bash
# Run 8: Gomoku anti-blitz DATA recipe (runs 5/6/7 showed continuation
# training degrades on blitz-equilibrium self-play data; this run attacks
# the data, not the gate): 6 random opening plies (masked from policy
# records) put self-play into positions the P1-blitz line never reaches,
# temp 20 keeps sampling longer, and eval/anchor arenas run at 400 sims
# (TRAINING_GUIDE 7d). gate_mode=track + strong anchor protect the peak.
# Self-play/arena inference is the bias-corrected int8 path (first
# long-run production use; strength-neutral per tools/int8_ab.py).
cd /root/repo
echo $$ > /tmp/run8_keepalive.pid
while true; do
  SNAP=$(ls runs/models_run8/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path checkpoints/best_gomoku.ckpt)
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run8/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path checkpoints/best_gomoku.ckpt \
    --temp-threshold 20 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run8 \
    --seed $((ITER + 1200)) \
    "${ARGS[@]}" >> runs/run8.log 2>&1 &
  echo $! > /tmp/run8.pid
  wait $(cat /tmp/run8.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run8.log
  LAST=$(ls runs/models_run8/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run8.log
