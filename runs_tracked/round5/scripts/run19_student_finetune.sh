#!/bin/bash
# run-19 (round 5, VERDICT #5 follow-through): self-play fine-tune of the
# distilled 4x96 student.
#
# One-shot supervised distillation from the run-16 buffer left the
# student at 0.328 [0.23, 0.45] vs best_gomoku at gumbel@64 (chain 14)
# while running 5298 moves/s (1.6x the 6x128 config #6).  Standard
# distill-then-RL: 30 iterations of the run-16 gumbel recipe on the
# student's OWN self-play.  No in-loop anchor (the anchor loader needs
# matching architectures); post-hoc cross_net_arena A/Bs of the
# snapshots decide the config-#7 strength claim.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache

DIR=runs/models_run19
echo $$ > /tmp/run19_keepalive.pid
while true; do
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  ITER=$(echo "$SNAP" | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  : "${ITER:=0}"
  ARGS=(--pretrained-model-path checkpoints/distill_4x96.ckpt)
  [ -n "$SNAP" ] && ARGS=(--pretrained-model-path $DIR/best_latest.ckpt --candidate-model-path "$SNAP" --next-iteration-continuation $((ITER + 1)))
  python train.py \
    --board-size 15 --game gomoku \
    --num-iterations 30 --games-per-iteration 128 --n-simulations 64 \
    --mcts-search gumbel --gumbel-max-considered 16 --mcts-reuse-budget 48 \
    --n-res-blocks 4 --channels 96 --mcts-backend pallas --mcts-max-depth 56 \
    --inference int8 \
    --buffer-size 160000 --batch-size 128 --epochs-per-iter 1 \
    --eval-games 64 --eval-mcts-simulations 384 --eval-every 2 \
    --win-rate-threshold 0.55 --gate-mode track \
    --value-target-mix 0.25 --opening-random-moves 6 \
    --save-every 10 --buffer-save-every 20 --model-dir $DIR \
    --seed $((ITER + 5500)) \
    "${ARGS[@]}" >> runs/run19.log 2>&1 &
  echo $! > /tmp/run19.pid
  SEG=$(cat /tmp/run19.pid)
  while kill -0 "$SEG" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y runs/run19.log) ))
    if [ "$AGE" -gt 600 ]; then
      echo "[keepalive] log stalled ${AGE}s — killing wedged segment $(date -u)" >> runs/run19.log
      kill "$SEG" 2>/dev/null; sleep 10; kill -9 "$SEG" 2>/dev/null
      break
    fi
  done
  wait "$SEG" 2>/dev/null
  echo "[keepalive] segment ended at $(date -u)" >> runs/run19.log
  LAST=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1 | grep -oE "iter[0-9]+" | grep -oE "[0-9]+")
  [ "${LAST:-0}" -ge 30 ] && break
  sleep 180
done
echo "[keepalive] run-19 complete at $(date -u)" >> runs/run19.log

# post-hoc strength A/Bs of the final student
LOG=runs/chipchain16.log
echo "=== [$(date -u)] run19 post-hoc: student-ft vs best @ gumbel64 ===" >> $LOG
FINAL=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
timeout 2400 python tools/cross_net_arena.py "$FINAL" \
  checkpoints/best_gomoku.ckpt --games 64 --sims 64 --search gumbel \
  --seed 9 > runs/ab_run19_gumbel.log 2>&1
tail -1 runs/ab_run19_gumbel.log >> $LOG
echo "=== [$(date -u)] run19 post-hoc: student-ft vs best @ puct400 ===" >> $LOG
timeout 2400 python tools/cross_net_arena.py "$FINAL" \
  checkpoints/best_gomoku.ckpt --games 64 --sims 400 --seed 10 \
  > runs/ab_run19_puct.log 2>&1
tail -1 runs/ab_run19_puct.log >> $LOG
echo "run19 done" >> $LOG
