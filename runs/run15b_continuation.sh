#!/bin/bash
# run-15b (round 3): continue run-15 from iter-200 toward a promotion.
#
# Rationale (DECISIONS.md "run-15 gen-2 regression root-caused"): the
# deadline harvest measured iter-90 mid-dip; iter-200 had recovered to
# parity at f32 puct@400 (0.48-0.50 over 96 games) and was BETTER at
# lower budgets (0.625 @ puct@64) with the trajectory still ascending.
# Same recipe, persisted buffer, PLUS the round-3 anchor fix: the
# anchor arena now plays at the PROMOTION config (f32 puct@400) so the
# track reads the statistic promotions are decided under.
#
# Keepalive pattern: relaunch on segment death (axon tunnel resets have
# killed runs in past sessions); pid files for external stop/harvest.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

ANCHOR=checkpoints/best_gomoku.ckpt
DIR=runs/models_run15
echo $$ > /tmp/run15b_keepalive.pid
while true; do
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=200}"
  python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 400 --games-per-iteration 128 --n-simulations 64 \
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
    --seed $((ITER + 5300)) \
    --pretrained-model-path $DIR/best_latest.ckpt \
    --candidate-model-path "$SNAP" \
    --next-iteration-continuation $((ITER + 1)) \
    >> runs/run15b.log 2>&1 &
  echo $! > /tmp/run15b.pid
  wait $(cat /tmp/run15b.pid)
  echo "[keepalive] segment ended at $(date -u)" >> runs/run15b.log
  LAST=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 400 ] && break
  sleep 60
done
echo "[keepalive] run-15b complete at $(date -u)" >> runs/run15b.log
