#!/bin/bash
# Run 7: Gomoku gated continuation from the shipped run-5-iter200 peak.
# gate_mode=track — candidate trains gatelessly (run-6 continuity) while
# `best` only advances on a 64-game mirrored arena at >=0.55, so the
# promoted net can never drift below the starting peak (DECISIONS.md
# round-2 "next levers"). Anchored vs the STRONG shipped checkpoint
# (not the random start, which saturates immediately).
cd /root/repo
echo $$ > /tmp/run7_keepalive.pid
while true; do
  SNAP=$(ls runs/models_run7/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path checkpoints/best_gomoku.ckpt)
  # resume: best from its protected alias, candidate from ITS snapshot
  # (snapshots persist the candidate as of the track-mode fix)
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run7/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 400 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 400 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path checkpoints/best_gomoku.ckpt \
    --temp-threshold 16 --dirichlet-epsilon 0.25 --dirichlet-n-moves 20 \
    --dirichlet-alpha 0.05 --value-target-mix 0.25 --opening-random-moves 2 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run7 \
    --seed $((ITER + 1100)) \
    "${ARGS[@]}" >> runs/run7.log 2>&1 &
  echo $! > /tmp/run7.pid
  wait $(cat /tmp/run7.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run7.log
  LAST=$(ls runs/models_run7/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run7.log
