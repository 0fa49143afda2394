#!/usr/bin/env python
"""Targeted bisect for the parent+pallas long-run worker fault.

KNOWN ISSUE (MCTSConfig.fpu_mode): ``fpu_mode="parent"`` +
``backend="pallas"`` crashes the TPU worker minutes into LONG runs;
``"zero"`` is clean, CPU interpret is clean.  Hypothesis (round 4):
parent-FPU concentrates search onto one line, so walks hit the DEPTH
CAP orders of magnitude more often than under zero-FPU (where a
confidently-wrong value head flattens visits); the fault lives in the
packed backend's depth-capped-lane handling, and "minutes into long
runs" is just how long parent-FPU needs before a capped lane appears.

Test: force capped lanes IMMEDIATELY with a tiny depth cap.  If the
hypothesis holds, parent+cap8 (and zero+cap8!) fault in seconds; if
only parent faults at every cap, the cap theory dies and the fpu branch
itself is back on the table.

Run on a free chip:  python repro/parent_pallas_probe.py
Each config prints CLEAN/FAULT; a worker hard-fault kills the process,
so run configs in separate subprocesses (the default) to keep going.
"""

from __future__ import annotations

import json
import subprocess
import sys

CONFIGS = [
    # (fpu_mode, depth_cap, moves) — cap 8 forces capped lanes from the
    # first move; cap 56 is the production setting (the reported fault)
    ("zero", 8, 24),
    ("parent", 8, 24),
    ("zero", 56, 24),
    ("parent", 56, 24),
]

WORKER = r"""
import sys, functools
import jax, jax.numpy as jnp, numpy as np
fpu, cap, moves = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
from alphazero_gomoku_tpu.selfplay.runner import play_games

env = make_env("gomoku", 15)
model = AZModel(board_size=15, n_res_blocks=2, channels=32, seed=5)
cfg = SelfPlayConfig(
    batch_games=128, temp_threshold=10, max_moves=moves,
    mcts=MCTSConfig(n_simulations=200, add_noise=True,
                    dirichlet_alpha=0.05, dirichlet_epsilon=0.15,
                    dirichlet_moves=10, max_depth=cap,
                    backend="pallas", fpu_mode=fpu),
)
traj = jax.jit(functools.partial(play_games, env, cfg,
                                 make_eval_fn(model.cfg)))(
    bundle_of(model), jax.random.PRNGKey(11))
print("MOVES", int(np.asarray(traj.moves_played).sum()), flush=True)
"""


def main():
    results = {}
    for fpu, cap, moves in CONFIGS:
        name = f"{fpu}@cap{cap}"
        print(f"--- {name} ({moves} moves, batch 128, 200 sims) ---",
              flush=True)
        r = subprocess.run(
            [sys.executable, "-c", WORKER, fpu, str(cap), str(moves)],
            capture_output=True, text=True, timeout=3600)
        ok = r.returncode == 0 and "MOVES" in r.stdout
        results[name] = "CLEAN" if ok else f"FAULT(rc={r.returncode})"
        print(name, results[name], flush=True)
        if not ok:
            print(r.stdout[-500:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
