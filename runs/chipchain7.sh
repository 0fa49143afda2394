#!/bin/bash
# Chip chain (round 2, session 7, link 7): after the lane-tile probes
# (chain6), put the chip back on strength training until the round ends.
#   - if the run-15 harvest PROMOTED (best_gomoku advanced): start run-16
#     = gumbel gen-3 from the new best with a FRESH buffer (the measured
#     pattern: the gumbel recipe's jump comes in the first ~70 iters off
#     a fresh buffer; same-buffer continuations plateau).
#   - else: continue run-15 toward iter 200 via its keepalive.
# The driver's round-end bench tolerates a concurrent run (~10% noise in
# past sessions); the next session can stop/harvest via pid files.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
CHAIN6_PID=${1:?usage: chipchain7.sh <chain6_pid>}

while kill -0 "$CHAIN6_PID" 2>/dev/null; do sleep 20; done
sleep 5

# Gate on the harvest JSON only if it is FRESH (written within the last
# 6 h, i.e. by this chain's chain5 link, not a stale or hand-edited file
# — advisor round-2 finding).  For new chains, prefer the stronger fix:
# have the harvest write a run-scoped filename (or embed the candidate
# checkpoint hash) and validate it here before branching.
PROMOTED=no
if [ -f metrics/run15_harvest_ab.json ]; then
  PROMOTED=$(python - << 'EOF'
import json, os, time
try:
    path = "metrics/run15_harvest_ab.json"
    fresh = time.time() - os.path.getmtime(path) < 6 * 3600
    d = json.load(open(path))
    print("yes" if fresh and d["ci95"][0] > 0.5 else "no")
except Exception:
    print("no")
EOF
)
fi
echo "=== [$(date -u)] chain7: run-15 promoted=$PROMOTED ==="

if [ "$PROMOTED" = "yes" ]; then
  mkdir -p runs/models_run16
  ANCHOR=checkpoints/best_gomoku.ckpt
  echo $$ > /tmp/run16_keepalive.pid
  while true; do
    SNAP=$(ls runs/models_run16/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
    ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
    : "${ITER:=0}"
    ARGS=(--pretrained-model-path "$ANCHOR")
    [ -n "$SNAP" ] && ARGS=(--pretrained-model-path runs/models_run16/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
    python train.py \
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
      --save-every 10 --buffer-save-every 20 --model-dir runs/models_run16 \
      --seed $((ITER + 4200)) \
      "${ARGS[@]}" >> runs/run16.log 2>&1 &
    echo $! > /tmp/run16.pid
    wait $(cat /tmp/run16.pid)
    echo "[keepalive] segment ended at $(date -u)" >> runs/run16.log
    LAST=$(ls runs/models_run16/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
    [ "${LAST:-0}" -ge 200 ] && break
    sleep 60
  done
else
  exec bash runs/run15_gomoku_gumbel2.sh
fi
