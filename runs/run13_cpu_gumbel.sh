#!/bin/bash
# Run 13 (CPU, validation): does gumbel-sequential-halving self-play at
# low sims LEARN end-to-end?  8x8 five-in-row, tiny net, XLA backend,
# gateless with periodic snapshots; strength is probed post-hoc vs the
# 25-playout pure-MCTS baseline (tools/strength_probe.py --size 8).
# De-risks the run-12 chip recipe's training plumbing (completed-Q
# policy targets, no Dirichlet/temperature, random-opening masking)
# while the axon tunnel is down.  Single CPU core: nice'd.
cd /root/repo
echo $$ > /tmp/run13.pid
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:$PYTHONPATH \
  nice -n 10 python -m alphazero_gomoku_tpu.cli.train \
  --board-size 8 --game gomoku \
  --num-iterations 150 --games-per-iteration 32 --n-simulations 32 \
  --mcts-search gumbel --gumbel-max-considered 8 --gumbel-round-parallel \
  --mcts-backend xla --mcts-max-depth 40 \
  --n-res-blocks 2 --channels 32 \
  --buffer-size 40000 --batch-size 64 --epochs-per-iter 2 \
  --eval-games 0 --opening-random-moves 2 --value-target-mix 0.25 \
  --save-every 10 --buffer-save-every 20 \
  --model-dir runs/models_run13 --seed 1300 \
  >> runs/run13.log 2>&1
echo "[run13] exit=$? at $(date -u)" >> runs/run13.log
