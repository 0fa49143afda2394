#!/bin/bash
# Chip chain (round 4, session 2, link 8): recovery watcher + kernel
# validation queue.
#
# Session 1's conditional-DMA probe deadlocked the TPU worker so hard
# that trivial reductions still hang (devcheck EXIT 124, 2026-08-20);
# the worker reset is outside our control.  This chain polls with a
# short-timeout probe until a tiny computation completes, then runs the
# queued device work in order:
#   1. tools/device_parity.py  — Mosaic-compiled packed search vs XLA
#      (validates the triple-buffered backup pipeline on real hardware)
#   2. quick bench probes of config #3 (puct@400) and #6 (gumbel@64)
# and leaves the chip FREE with a status flag for the session driver:
#   /tmp/chip_status = "parity_fail" | "validated"
# Start: bash runs/chipchain8.sh &   Stop: kill $(cat /tmp/chipchain8.pid)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain8.pid
rm -f /tmp/chip_status

echo "=== [$(date -u)] chain8: waiting for worker recovery ===" >> runs/chipchain8.log
while true; do
  timeout 150 python -c "
import jax, jax.numpy as jnp
print('probe', jnp.ones((8, 8)).sum())" >> runs/chipchain8.log 2>&1 && break
  echo "[$(date -u)] worker still wedged" >> runs/chipchain8.log
  sleep 240
done
echo "=== [$(date -u)] chain8: worker ALIVE, running parity ===" >> runs/chipchain8.log

timeout 2400 python tools/device_parity.py > runs/device_parity_r4.log 2>&1
PARITY=$?
echo "parity exit=$PARITY" >> runs/chipchain8.log
if [ "$PARITY" -ne 0 ]; then
  echo parity_fail > /tmp/chip_status
  exit 1
fi

echo "=== [$(date -u)] chain8: parity OK, quick bench #3/#6 ===" >> runs/chipchain8.log
timeout 1800 python - << 'EOF' > runs/bench_r4_probe.log 2>&1
import json
from bench import run_bench
r3 = run_bench(batch_games=128, measure_moves=24, infer="int8")
print(json.dumps({"config3": r3["value"], "detail": r3["detail"]["runs_moves_per_sec"]}), flush=True)
r6 = run_bench(batch_games=256, n_simulations=64, search="gumbel",
               measure_moves=48, infer="int8")
print(json.dumps({"config6": r6["value"], "detail": r6["detail"]["runs_moves_per_sec"]}), flush=True)
EOF
echo "bench exit=$?" >> runs/chipchain8.log
echo validated > /tmp/chip_status
echo "=== [$(date -u)] chain8: done, chip free ===" >> runs/chipchain8.log
