#!/bin/bash
# Chip chain (round 2, session 6, link 5): run-15 deadline harvest only
# (run-15 is launched separately; this waits on its keepalive PID — not
# a log line, see the chain-4 incident note — then stops it at DEADLINE
# or on completion, arenas the last snapshot vs the shipped best_gomoku
# at f32 puct@400 mirrored pairs, promotes on CI-low > 0.5, commits).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
DEADLINE=${1:?usage: chipchain5.sh <deadline_epoch_s>}

while [ "$(date +%s)" -lt "$DEADLINE" ] && kill -0 "$(cat /tmp/run15_keepalive.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== [$(date -u)] chain5: stopping run-15 ==="
kill "$(cat /tmp/run15_keepalive.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run15_outer.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run15.pid 2>/dev/null)" 2>/dev/null
sleep 15
kill -9 "$(cat /tmp/run15.pid 2>/dev/null)" 2>/dev/null
sleep 5

LAST=$(ls runs/models_run15/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
if [ -z "$LAST" ]; then
  echo "=== chain5: no run-15 snapshot to harvest ==="
  exit 0
fi
echo "=== [$(date -u)] run-15 harvest: LAST=$LAST ==="
echo "=== f32 puct@400 mirrored pairs: LAST vs shipped best_gomoku (64 games) ==="
timeout 1500 python tools/compare_snapshots.py "$LAST" checkpoints/best_gomoku.ckpt \
  --game gomoku --games 64 --sims 400 --seed 31 2>&1 | tee /tmp/run15_ab.out
AB=$(grep -E '^\{' /tmp/run15_ab.out | tail -1)
echo "$AB" > metrics/run15_harvest_ab.json

PROMOTE=$(python - "$AB" << 'EOF'
import json, sys
try:
    d = json.loads(sys.argv[1])
    print("yes" if d["ci95"][0] > 0.5 else "no")
except Exception:
    print("no")
EOF
)
echo "=== chain5: promote=$PROMOTE ==="
if [ "$PROMOTE" = "yes" ]; then
  cp "$LAST" checkpoints/best_gomoku.ckpt
  git add -f checkpoints/best_gomoku.ckpt
fi
git add -f metrics/run15_harvest_ab.json runs/chipchain5.sh
git commit -q -m "run-15 harvest: gomoku gumbel gen-2 snapshot vs shipped best (promote=$PROMOTE)

Deadline harvest of the second-generation gumbel run (trained from the
run-12 product with a fresh buffer). A/B is f32 puct@400 mirrored pairs
vs checkpoints/best_gomoku.ckpt; promotion requires the Wilson CI lower
bound above 0.5.

No-Verification-Needed: artifact/metrics-only commit (checkpoint + JSON)"
echo "=== [$(date -u)] chain5 done ==="
