#!/bin/bash
# Chip chain 10 (round 4): gumbel determinism probe -> bench probes ->
# run-16 training.  Serialized behind the tunnel-claim rules of chain9.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain10.pid

run_with_retry() {  # <logfile> <cmd...> — backoff on tunnel-claim errors
  local LOG=$1; shift
  for attempt in 1 2 3 4 5; do
    timeout 3000 "$@" > "$LOG" 2>&1
    RC=$?
    grep -q "not in the list of known backends" "$LOG" || break
    echo "[$(date -u)] tunnel busy; retry $attempt" >> runs/chipchain10.log
    sleep 150
  done
  return $RC
}

echo "=== [$(date -u)] chain10: gumbel determinism probe ===" >> runs/chipchain10.log
run_with_retry runs/gumbel_determinism.log \
  python tools/gumbel_determinism_probe.py
echo "probe exit=$? ($(tail -1 runs/gumbel_determinism.log | cut -c1-160))" >> runs/chipchain10.log

echo "=== [$(date -u)] chain10: bench probes #3/#6 ===" >> runs/chipchain10.log
run_with_retry runs/bench_r4_probe.log python - << 'EOF'
import json
from bench import run_bench
r3 = run_bench(batch_games=128, measure_moves=24, infer="int8")
print(json.dumps({"config3_b128": r3["value"],
                  "runs": r3["detail"]["runs_moves_per_sec"]}), flush=True)
r3b = run_bench(batch_games=256, measure_moves=24, infer="int8")
print(json.dumps({"config3_b256": r3b["value"],
                  "runs": r3b["detail"]["runs_moves_per_sec"]}), flush=True)
r6 = run_bench(batch_games=256, n_simulations=64, search="gumbel",
               measure_moves=48, infer="int8")
print(json.dumps({"config6": r6["value"],
                  "runs": r6["detail"]["runs_moves_per_sec"]}), flush=True)
EOF
echo "bench exit=$? " >> runs/chipchain10.log
tail -3 runs/bench_r4_probe.log >> runs/chipchain10.log

echo "=== [$(date -u)] chain10: starting run-16 (gomoku gen-2) ===" >> runs/chipchain10.log
mkdir -p runs/models_run16
nohup bash runs/run16_commit_loop.sh > /dev/null 2>&1 &
bash runs/run16_gomoku_gen2.sh
