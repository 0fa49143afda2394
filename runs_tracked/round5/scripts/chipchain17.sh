#!/bin/bash
# Chip chain 17 (round 5, final): publish BASELINE.json with round-5
# numbers — bench --all (configs #1-#6) with the mfu_pct self-report.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
echo $$ > /tmp/chipchain17.pid
LOG=runs/chipchain17.log

echo "=== [$(date -u)] chain17: bench --all ===" >> $LOG
for attempt in 1 2 3; do
  timeout 3000 python bench.py --all > runs/bench_all_r5.log 2>&1
  RC=$?
  grep -q "not in the list of known backends" runs/bench_all_r5.log || break
  sleep 150
done
grep '"metric"' runs/bench_all_r5.log >> $LOG
echo "=== [$(date -u)] chain17 done, chip free ===" >> $LOG

echo "=== [$(date -u)] chain17: matmul rate probe v3 ===" >> $LOG
timeout 2400 python tools/mosaic_matmul_rate.py > runs/mosaic_matmul_rate3.log 2>&1
tail -1 runs/mosaic_matmul_rate3.log >> $LOG
echo "=== [$(date -u)] chain17 fully done ===" >> $LOG

echo "=== [$(date -u)] chain17: run17 pente harvest ladder ===" >> $LOG
timeout 2400 python tools/harvest_run.py runs/models_run17 --games 32 \
  --sims 256 --game pente --every 10 \
  --baseline checkpoints/best_pente.ckpt > runs/run17_harvest.log 2>&1
tail -2 runs/run17_harvest.log >> $LOG

echo "=== [$(date -u)] chain17: run17 final vs best_pente (n=128, f32 puct@400) ===" >> $LOG
FINAL17=$(ls runs/models_run17/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
timeout 2400 python tools/compare_snapshots.py "$FINAL17" \
  checkpoints/best_pente.ckpt --game pente --games 128 --sims 400 \
  --seed 90 > runs/run17_promo.log 2>&1
tail -1 runs/run17_promo.log >> $LOG
echo "=== [$(date -u)] chain17 pente steps done ===" >> $LOG
