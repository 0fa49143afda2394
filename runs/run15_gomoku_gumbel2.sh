#!/bin/bash
# Run 15 (Gomoku gumbel, generation 2): the run-12 recipe re-applied to
# its own output — gumbel@64 self-play trained FROM the shipped
# best_gomoku.ckpt (itself the run-12 product) with a FRESH buffer, the
# shipped net as the protective track anchor.  ROADMAP item 1's stated
# next lever.  New vs run-12: --eval-every 2 (the 64-game arena was ~1/3
# of iteration wall time at gumbel self-play speeds; in track mode the
# arena only decides when best_latest advances, so halving its cadence
# trades gate latency for ~20% more training iterations per hour).
cd /root/repo
echo $$ > /tmp/run15_keepalive.pid
ANCHOR=checkpoints/best_gomoku.ckpt
while true; do
  SNAP=$(ls runs/models_run15/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path "$ANCHOR")
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run15/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  PYTHONPATH=/root/repo:$PYTHONPATH JAX_COMPILATION_CACHE_DIR=/root/jax_cache python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 200 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --n-res-blocks 6 --channels 128 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 --eval-every 2 \
    --win-rate-threshold 0.55 --gate-mode track \
    --anchor-arena-every 10 --anchor-model-path "$ANCHOR" \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir runs/models_run15 \
    --seed $((ITER + 3100)) \
    "${ARGS[@]}" >> runs/run15.log 2>&1 &
  echo $! > /tmp/run15.pid
  wait $(cat /tmp/run15.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run15.log
  LAST=$(ls runs/models_run15/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 200 ] && break
  sleep 60
done
echo "[keepalive] run complete at $(date -u)" >> runs/run15.log
