#!/bin/bash
# Chip chain 9 (round 4): retrying device-parity + quick bench.
#
# Ops findings this session (DECISIONS round-4 session-2 note):
#   - EVERY python process claims the axon tunnel at interpreter start
#     (sitecustomize registers the PJRT plugin because
#     PALLAS_AXON_POOL_IPS is ambient), even under JAX_PLATFORMS=cpu —
#     CPU-side work must run with PALLAS_AXON_POOL_IPS= (empty) or it
#     starves the chip job with "Backend 'axon' is not in the list of
#     known backends".
#   - The relay also holds a dead client's claim for a short TTL, so a
#     chip job started right after another exits can fail the same way:
#     retry with backoff instead of treating it as fatal.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain9.pid
rm -f /tmp/chip_status

for attempt in 1 2 3 4 5 6 7 8 9 10; do
  echo "=== [$(date -u)] chain9: parity attempt $attempt ===" >> runs/chipchain9.log
  timeout 2400 python tools/device_parity.py > runs/device_parity_r4.log 2>&1
  RC=$?
  if grep -q "not in the list of known backends" runs/device_parity_r4.log; then
    echo "[$(date -u)] tunnel busy/TTL; backing off" >> runs/chipchain9.log
    sleep 150
    continue
  fi
  break
done
echo "parity exit=$RC" >> runs/chipchain9.log
if [ "$RC" -ne 0 ]; then
  echo parity_fail > /tmp/chip_status
  exit 1
fi

echo "=== [$(date -u)] chain9: parity OK -> quick bench #3/#6 ===" >> runs/chipchain9.log
for attempt in 1 2 3; do
  timeout 1800 python - << 'EOF' > runs/bench_r4_probe.log 2>&1
import json
from bench import run_bench
r3 = run_bench(batch_games=128, measure_moves=24, infer="int8")
print(json.dumps({"config3_b128": r3["value"],
                  "runs": r3["detail"]["runs_moves_per_sec"]}), flush=True)
r6 = run_bench(batch_games=256, n_simulations=64, search="gumbel",
               measure_moves=48, infer="int8")
print(json.dumps({"config6": r6["value"],
                  "runs": r6["detail"]["runs_moves_per_sec"]}), flush=True)
EOF
  RC=$?
  grep -q "not in the list of known backends" runs/bench_r4_probe.log || break
  sleep 150
done
echo "bench exit=$RC" >> runs/chipchain9.log
echo validated > /tmp/chip_status
echo "=== [$(date -u)] chain9: done, chip free ===" >> runs/chipchain9.log
