#!/usr/bin/env python
"""Split self-play move cost into NN vs tree+glue, per batch size.

Runs the REAL lockstep self-play program twice per batch size: once with
the real network and once with a near-zero-cost eval_fn that still depends
on the observations (one reduction — cannot be CSE'd or constant-folded,
avoiding the round-1 ablation trap recorded in DECISIONS.md).  The delta is
the network's true share; the null-net time is the tree kernels + XLA glue
(select/expand/backup, env.step, encode, compose/writes).

Usage: python tools/search_cost_split.py [--batches 64 128] [--moves 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(env, cfg, eval_fn, bundle, moves):
    from alphazero_gomoku_tpu.selfplay.runner import play_games

    meas_cfg = dataclasses.replace(cfg, max_moves=moves)
    fn = jax.jit(functools.partial(play_games, env, meas_cfg, eval_fn))
    warm = fn(bundle, jax.random.PRNGKey(2))
    int(np.asarray(jnp.sum(warm.moves_played)))  # true sync (tunnel)
    t0 = time.time()
    traj = fn(bundle, jax.random.PRNGKey(3))
    n = int(np.asarray(jnp.sum(jnp.minimum(traj.moves_played, moves))))
    dt = time.time() - t0
    return n / dt, dt, n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--moves", type=int, default=16)
    ap.add_argument("--sims", type=int, default=400)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    env = make_env("gomoku", 15)
    model = AZModel(board_size=15, n_res_blocks=args.blocks,
                    channels=args.channels, seed=0)
    real_eval = make_eval_fn(model.cfg)
    a = env.num_actions

    def null_eval(bundle, obs):
        # one reduction over obs -> logits/value; data-dependent, ~free
        s = jnp.sum(obs, axis=(1, 2, 3), keepdims=False)          # [B]
        probs = jax.nn.softmax(
            jnp.broadcast_to(s[:, None] * 1e-6, (obs.shape[0], a)))
        return probs, jnp.tanh(s * 1e-6)[:, None]

    for b in args.batches:
        cfg = SelfPlayConfig(
            batch_games=b, temp_threshold=10,
            mcts=MCTSConfig(n_simulations=args.sims, cpuct=1.0,
                            add_noise=True, dirichlet_alpha=0.05,
                            dirichlet_epsilon=0.15, dirichlet_moves=10,
                            max_depth=56, backend=args.backend),
        )
        mv_real, dt_r, n_r = measure(env, cfg, real_eval, bundle_of(model),
                                     args.moves)
        mv_null, dt_n, n_n = measure(env, cfg, null_eval, None, args.moves)
        ms_real = b / mv_real / args.sims * 1e3
        ms_null = b / mv_null / args.sims * 1e3
        print(json.dumps({
            "batch": b, "sims": args.sims,
            "moves_per_s_real": round(mv_real, 1),
            "moves_per_s_nullnet": round(mv_null, 1),
            "ms_per_sim_real": round(ms_real, 4),
            "ms_per_sim_tree_glue": round(ms_null, 4),
            "ms_per_sim_nn": round(ms_real - ms_null, 4),
            "nn_share": round(1 - ms_null / ms_real, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
