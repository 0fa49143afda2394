#!/bin/bash
# Chip chain (round 2, session 6): deadline harvest for run-14
# (Pente gumbel training relaunched after the VM reboot).
# At DEADLINE (epoch s) — or earlier if the keepalive exits on its own —
# stop training, arena the last snapshot against the shipped
# checkpoints/best_pente.ckpt with f32 + puct@400 (the run-12 promotion
# criterion: ground-truth search + precision, mirrored pairs, Wilson CI),
# promote on a decisive win (CI lower bound > 0.5), and commit the
# artifacts. Scripted end-to-end because driver sessions have been dying
# to transient API errors today; the chain must not depend on one.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
DEADLINE=${1:?usage: chipchain3.sh <deadline_epoch_s>}

while [ "$(date +%s)" -lt "$DEADLINE" ] && kill -0 "$(cat /tmp/run14_keepalive.pid 2>/dev/null)" 2>/dev/null; do
  sleep 20
done
echo "=== [$(date -u)] chain3: stopping run-14 ==="
kill "$(cat /tmp/run14_keepalive.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run14_outer.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/run14.pid 2>/dev/null)" 2>/dev/null
sleep 15
kill -9 "$(cat /tmp/run14.pid 2>/dev/null)" 2>/dev/null
sleep 5

LAST=$(ls runs/models_run14/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
if [ -z "$LAST" ]; then
  echo "=== chain3: no run-14 snapshot to harvest ==="
  exit 0
fi
echo "=== [$(date -u)] run-14 harvest: LAST=$LAST ==="
echo "=== f32 puct@400 mirrored pairs: LAST vs shipped best_pente (64 games) ==="
timeout 1500 python tools/compare_snapshots.py "$LAST" checkpoints/best_pente.ckpt \
  --game pente --games 64 --sims 400 --seed 21 2>&1 | tee /tmp/run14_ab.out
AB=$(grep -E '^\{' /tmp/run14_ab.out | tail -1)
echo "$AB" > metrics/run14_harvest_ab.json

PROMOTE=$(python - "$AB" << 'EOF'
import json, sys
try:
    d = json.loads(sys.argv[1])
    print("yes" if d["ci95"][0] > 0.5 else "no")
except Exception:
    print("no")
EOF
)
echo "=== chain3: promote=$PROMOTE ==="
if [ "$PROMOTE" = "yes" ]; then
  cp "$LAST" checkpoints/best_pente.ckpt
  git add -f checkpoints/best_pente.ckpt
fi
git add metrics/run14_harvest_ab.json runs/run14.log runs/chipchain3.sh
git commit -q -m "run-14 harvest: pente gumbel snapshot vs shipped best (promote=$PROMOTE)

Deadline harvest of the reboot-relaunched pente gumbel run. A/B is
f32 puct@400 mirrored pairs vs checkpoints/best_pente.ckpt; promotion
requires the Wilson CI lower bound above 0.5.

No-Verification-Needed: artifact/metrics-only commit (checkpoint + JSON + logs)"
echo "=== [$(date -u)] chain3 done ==="
