#!/usr/bin/env python
"""Full-length parent+pallas fault probe (round-5, VERDICT #3).

Round-4 settled the short-run axes (`parent_pallas_probe.py`): parent@cap8,
zero@cap8, zero@cap56 all CLEAN at 24 moves, and parent@cap56 was cut off
by the chain timeout, not a crash.  The remaining axis for the original
"crashes minutes into LONG runs" report (search/tree.py KNOWN-ISSUE) is
run length itself — under the round-4 claim discipline, so a wedge can no
longer be a stale-claim artifact.

This probe runs parent+pallas at the PRODUCTION shape (batch 128, 200
sims, cap 56, full games) for N consecutive self-play batches in ONE
process — several minutes of continuous device time, matching the
original failure envelope.  A worker hard-fault kills the process; the
driving shell script interprets a dead process + no DONE line as FAULT.

Run on a free chip:  python repro/parent_pallas_longrun.py [n_batches]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import numpy as np


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    from alphazero_gomoku_tpu.selfplay.runner import play_games

    env = make_env("gomoku", 15)
    # production-scale net: the original reports came from real runs
    model = AZModel(board_size=15, n_res_blocks=6, channels=128, seed=5)
    cfg = SelfPlayConfig(
        batch_games=128, temp_threshold=10, max_moves=225,
        mcts=MCTSConfig(n_simulations=200, add_noise=True,
                        dirichlet_alpha=0.05, dirichlet_epsilon=0.15,
                        dirichlet_moves=10, max_depth=56,
                        backend="pallas", fpu_mode="parent"),
    )
    fn = jax.jit(functools.partial(play_games, env, cfg,
                                   make_eval_fn(model.cfg)))
    bundle = bundle_of(model)
    t0 = time.time()
    total = 0
    for i in range(n_batches):
        traj = fn(bundle, jax.random.PRNGKey(1000 + i))
        n = int(np.asarray(traj.moves_played).sum())
        total += n
        print(f"batch {i}: {n} moves ({time.time() - t0:.1f}s elapsed, "
              f"{total} total)", flush=True)
    print(f"DONE parent@cap56 longrun: {total} moves over {n_batches} "
          f"batches in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
