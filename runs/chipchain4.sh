#!/bin/bash
# Chip chain (round 2, session 6, link 4): run-15 launcher + harvest.
# Waits for chain3 (the run-14 deadline harvest) to finish, then starts
# run-15 (gomoku gumbel gen-2, runs/run15_gomoku_gumbel2.sh) and
# deadline-harvests it with the same protocol: stop at DEADLINE (or when
# the keepalive exits at iter 200), arena the last snapshot vs the
# shipped checkpoints/best_gomoku.ckpt at f32 puct@400 mirrored pairs,
# promote on CI-low > 0.5, commit artifacts.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
DEADLINE=${1:?usage: chipchain4.sh <deadline_epoch_s>}

# wait for chain3 (the run-14 stopper + harvester) to EXIT — waiting on
# a log line re-matched a previous harvest's line and triple-launched
# run-15 while run-14 still owned the chip (session-6 incident); the
# runner pid cannot be stale the same way
CHAIN3_PID=$(cat /tmp/chain7.pid 2>/dev/null)
while [ -n "$CHAIN3_PID" ] && kill -0 "$CHAIN3_PID" 2>/dev/null; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && exit 0
  sleep 30
done

# idle-chip window: run the batch-512 fault bisect (ROADMAP #3, the one
# untriaged fault) before committing the chip to run-15.  The harness
# crashes the worker on purpose (probes are subprocesses; the worker
# restarts in ~1 min) — time-boxed so run-15 still gets the bulk of the
# window.
echo "=== [$(date -u)] chain4: batch-512 bisect (time-boxed 40 min) ==="
timeout 2400 python repro/bisect_batch512_fault.py > runs/bisect512.log 2>&1
echo "=== [$(date -u)] chain4: bisect done (rc=$?) ==="
sleep 90   # let the worker settle after the last crash probe

nohup bash runs/run15_gomoku_gumbel2.sh > /dev/null 2>&1 &
echo $! > /tmp/run15_outer.pid
echo "=== [$(date -u)] chain4: run-15 launched ==="

while [ "$(date +%s)" -lt "$DEADLINE" ] && kill -0 "$(cat /tmp/run15_keepalive.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== [$(date -u)] chain4: stopping run-15 ==="
kill "$(cat /tmp/run15_keepalive.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run15_outer.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run15.pid 2>/dev/null)" 2>/dev/null
sleep 15
kill -9 "$(cat /tmp/run15.pid 2>/dev/null)" 2>/dev/null
sleep 5

LAST=$(ls runs/models_run15/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
if [ -z "$LAST" ]; then
  echo "=== chain4: no run-15 snapshot to harvest ==="
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
echo "=== chain4: promote=$PROMOTE ==="
if [ "$PROMOTE" = "yes" ]; then
  cp "$LAST" checkpoints/best_gomoku.ckpt
  git add -f checkpoints/best_gomoku.ckpt
fi
git add -f metrics/run15_harvest_ab.json runs/chipchain4.sh
git commit -q -m "run-15 harvest: gomoku gumbel gen-2 snapshot vs shipped best (promote=$PROMOTE)

Deadline harvest of the second-generation gumbel run (trained from the
run-12 product with a fresh buffer). A/B is f32 puct@400 mirrored pairs
vs checkpoints/best_gomoku.ckpt; promotion requires the Wilson CI lower
bound above 0.5.

No-Verification-Needed: artifact/metrics-only commit (checkpoint + JSON)"
echo "=== [$(date -u)] chain4 done ==="
