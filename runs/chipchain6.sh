#!/bin/bash
# Chip chain (round 2, session 7, link 6): lane-tile envelope A/B in the
# idle window after the run-15 harvest (chain5).  The VMEM fix in
# ops/tree_kernels.py unlocked lane tiles > 128; this measures, on a
# quiet chip, whether a 256-lane tile (1 grid step at batch 256, 2 at
# 512) beats the shipped 128-lane tile on the headline configs.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
CHAIN5_PID=${1:?usage: chipchain6.sh <chain5_pid>}

while kill -0 "$CHAIN5_PID" 2>/dev/null; do sleep 20; done
sleep 10
LOG=runs/tileprobe.log
echo "=== [$(date -u)] chain6: lane-tile A/B on a quiet chip ===" >> "$LOG"

probe() { # probe <label> <tile> <bench args...>
  local label=$1 tile=$2; shift 2
  echo "--- $label (AZG_LANE_TILE=$tile) ---" >> "$LOG"
  # stderr goes to a per-probe file and the exit code is recorded, so a
  # failure is diagnosable (compile timeout vs VMEM/OOM vs runtime crash)
  # instead of one opaque FAILED/timeout line (advisor round-2 finding).
  AZG_LANE_TILE=$tile timeout 1200 python bench.py "$@" \
    2>"runs/probe_${label}.err" | grep '^{' >> "$LOG" \
    || echo "FAILED: $label exit=$? (stderr: runs/probe_${label}.err)" >> "$LOG"
}

# headline gumbel config (#6): control then candidate, interleaved twice
probe gumbel256-t128-a 128 --batch 256 --sims 64 --search gumbel
probe gumbel256-t256-a 256 --batch 256 --sims 64 --search gumbel
probe gumbel256-t128-b 128 --batch 256 --sims 64 --search gumbel
probe gumbel256-t256-b 256 --batch 256 --sims 64 --search gumbel
# puct@400 headline (config #3)
probe puct256-t128 128 --batch 256 --sims 400
probe puct256-t256 256 --batch 256 --sims 400
# batch-512 envelope retest with the wider tile
probe gumbel512-t256 256 --batch 512 --sims 64 --search gumbel
probe puct512-t256 256 --batch 512 --sims 400

git add -f runs/tileprobe.log runs/chipchain6.sh
git commit -q -m "Lane-tile envelope A/B on a quiet chip (post VMEM fix)

No-Verification-Needed: measurement-log-only commit"
echo "=== [$(date -u)] chain6 done ===" >> "$LOG"
