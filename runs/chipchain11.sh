#!/bin/bash
# Chip chain 11 (round 4): mid-run16 interleave — perf decomposition +
# strength A/B + fault probe, then hand the chip back to run-16.
#   1. pause run-16 (keepalive + segment, pid files)
#   2. bench config #3 with the bf16 int8-skip (isolates the round-3 ->
#      round-4 delta: pipeline vs skip-track revert)
#   3. tools/int8_ab.py --skip bf16 (the strength A/B gating the default)
#   4. repro/parent_pallas_probe.py (judge #4: depth-cap hypothesis)
#   5. restart run-16
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain11.pid

echo "=== [$(date -u)] chain11: pausing run-16 ===" >> runs/chipchain11.log
kill $(cat /tmp/run16_keepalive.pid 2>/dev/null) 2>/dev/null
kill $(cat /tmp/run16.pid 2>/dev/null) 2>/dev/null
sleep 20

run_with_retry() {
  local LOG=$1; shift
  for attempt in 1 2 3 4 5; do
    timeout 3000 "$@" > "$LOG" 2>&1
    RC=$?
    grep -q "not in the list of known backends" "$LOG" || break
    echo "[$(date -u)] tunnel busy; retry $attempt" >> runs/chipchain11.log
    sleep 150
  done
  return $RC
}

echo "=== [$(date -u)] chain11: bench #3 with bf16 skip ===" >> runs/chipchain11.log
run_with_retry runs/bench_bf16skip.log python - << 'EOF'
import json
from bench import run_bench
r = run_bench(batch_games=128, measure_moves=24, infer="int8",
              int8_skip="bf16")
print(json.dumps({"config3_b128_bf16skip": r["value"],
                  "runs": r["detail"]["runs_moves_per_sec"]}), flush=True)
EOF
tail -1 runs/bench_bf16skip.log >> runs/chipchain11.log

echo "=== [$(date -u)] chain11: int8 bf16-skip strength A/B ===" >> runs/chipchain11.log
run_with_retry runs/int8_ab_bf16.log \
  python tools/int8_ab.py checkpoints/best_gomoku.ckpt \
    --games 32 --sims 256 --skip bf16
tail -1 runs/int8_ab_bf16.log >> runs/chipchain11.log

echo "=== [$(date -u)] chain11: parent+pallas depth-cap probe ===" >> runs/chipchain11.log
run_with_retry runs/parent_probe.log python repro/parent_pallas_probe.py
tail -1 runs/parent_probe.log >> runs/chipchain11.log

echo "=== [$(date -u)] chain11: batch-512 axis backend=xla ===" >> runs/chipchain11.log
run_with_retry runs/bisect512_r4.log \
  python repro/bisect_batch512_fault.py selfplay 512 400 48 f32 xla
tail -1 runs/bisect512_r4.log >> runs/chipchain11.log
sleep 60

echo "=== [$(date -u)] chain11: restarting run-16 ===" >> runs/chipchain11.log
nohup bash runs/run16_gomoku_gen2.sh > /dev/null 2>&1 &
echo "chain11 done" >> runs/chipchain11.log
