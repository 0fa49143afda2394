#!/usr/bin/env python
"""Bisect the large-lockstep TPU worker fault (Pallas backend).

Known envelope (repro/README.md):
  OK:    64 games x 400 sims, full 225-ply games  (hours of training)
  OK:    128 x 400, 24-ply probe                  (bench config #3)
  CRASH: 128 x 400, full games; 128 x 800, full games

Kernel shapes at 128x400 are IDENTICAL between the OK probe and the
crashing full run (same node capacity, same layout), so the fault axis is
the move-scan length and/or what long games put in the trees (terminal
roots, full-ish boards). This script walks a config list until the worker
dies, printing one JSON line per survivor. Run each config in a SUBPROCESS
so a crash doesn't take the bisection down with it.

WARNING: this WILL crash the TPU worker (it usually restarts within ~1
min). Run only on an idle chip.

Usage: python repro/bisect_lockstep_fault.py           # run the grid
       python repro/bisect_lockstep_fault.py 128 400 96 # one config
"""

from __future__ import annotations

import json
import subprocess
import sys

GRID = [
    # (batch, sims, max_moves)  — ordered cheapest-information-first
    (128, 400, 48),
    (128, 400, 96),
    (128, 400, 160),
    (128, 400, 225),
    (96, 400, 225),
    (64, 800, 225),
]

ONE = r"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
import dataclasses, functools
sys.path.insert(0, "/root/repo")
from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
from alphazero_gomoku_tpu.selfplay.runner import play_games

b, sims, moves = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
env = make_env("gomoku", 15)
model = AZModel(board_size=15, n_res_blocks=6, channels=128, seed=0)
cfg = SelfPlayConfig(
    batch_games=b, temp_threshold=10, max_moves=moves,
    mcts=MCTSConfig(n_simulations=sims, cpuct=1.0, add_noise=True,
                    dirichlet_alpha=0.05, dirichlet_epsilon=0.15,
                    dirichlet_moves=10, max_depth=56, backend="pallas"),
)
fn = jax.jit(functools.partial(play_games, env, cfg, make_eval_fn(model.cfg)))
t0 = time.time()
traj = fn(bundle_of(model), jax.random.PRNGKey(5))
n = int(np.asarray(jnp.sum(traj.moves_played)))   # true sync
print(json.dumps({"batch": b, "sims": sims, "max_moves": moves,
                  "lane_moves": n, "seconds": round(time.time() - t0, 1),
                  "ok": True}), flush=True)
"""


def run_one(b, sims, moves, timeout=1200):
    p = subprocess.run(
        [sys.executable, "-c", ONE, str(b), str(sims), str(moves)],
        capture_output=True, text=True, timeout=timeout,
    )
    ok_lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode == 0 and ok_lines:
        print(ok_lines[-1], flush=True)
        return True
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(json.dumps({"batch": b, "sims": sims, "max_moves": moves,
                      "ok": False, "rc": p.returncode,
                      "tail": tail}), flush=True)
    return False


if __name__ == "__main__":
    if len(sys.argv) == 4:
        run_one(*map(int, sys.argv[1:4]))
    else:
        for b, sims, moves in GRID:
            run_one(b, sims, moves)
