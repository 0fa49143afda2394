#!/usr/bin/env python
"""Strength A/B: Gumbel sequential halving vs PUCT at unequal budgets.

Device arena between the two search modes of the SAME checkpoint:
the Gumbel side (``search/gumbel.py``) runs ``--gumbel-sims`` simulations
per move and plays its halving winner; the PUCT side runs ``--puct-sims``
(reference-parity search, deterministic argmax, no noise).  Mirrored
openings with seat swap and a Wilson CI, as ``tools/reuse_ab.py``.

The point of the measurement (BASELINE.md trajectory): Gumbel's
policy-improvement guarantee holds at any budget, so if
``gumbel@N ~ puct@kN`` in win rate, self-play throughput scales by ~k at
equal strength.  Paper: Danihelka et al., ICLR 2022.

Usage:
    python tools/gumbel_ab.py [checkpoints/best_gomoku.ckpt]
        [--games 32] [--gumbel-sims 64] [--puct-sims 400] [--m 16]

Prints one JSON line: the GUMBEL side's win rate with CI and pair tally.
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="checkpoints/best_gomoku.ckpt")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--gumbel-sims", type=int, default=64)
    ap.add_argument("--puct-sims", type=int, default=400)
    ap.add_argument("--m", type=int, default=16,
                    help="gumbel_max_considered")
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--max-depth", type=int, default=56)
    ap.add_argument("--fpu", default="zero", choices=["zero", "parent"],
                    help="PUCT side's first-play urgency")
    ap.add_argument("--round-parallel", action="store_true",
                    help="gumbel side: batch each halving round's sims "
                         "into one forward (serial-exact off the endgame "
                         "duplicate case; big latency win at arena "
                         "batches)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.search.gumbel import run_gumbel_mcts
    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
    from alphazero_gomoku_tpu.selfplay.arena import (OPENING_RADIUS,
                                                     wilson_ci)
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    model = AZModel.from_checkpoint(args.ckpt)
    env = make_env(args.game, args.size,
                   capture_planes=model.cfg.in_channels == 5)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)
    cfg_g = MCTSConfig(n_simulations=args.gumbel_sims, search="gumbel",
                       gumbel_max_considered=args.m, add_noise=False,
                       gumbel_round_parallel=args.round_parallel,
                       max_depth=args.max_depth)
    cfg_p = MCTSConfig(n_simulations=args.puct_sims, cpuct=1.0,
                       add_noise=False, max_depth=args.max_depth,
                       backend="xla", fpu_mode=args.fpu)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def arena_half(n_games: int, gumbel_is_p1: bool, params, rng):
        """P1 opening move is random centre-9x9 (reference arena
        protocol); winners [n] (0 draw / 1 / 2)."""
        size = env.size
        center = size // 2
        rng, k_r, k_c = jax.random.split(rng, 3)
        r0 = jax.random.randint(k_r, (n_games,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        c0 = jax.random.randint(k_c, (n_games,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        states = env.init_batch(n_games)
        open_act = (r0 * size + c0).astype(jnp.int32)
        states = jax.vmap(env.step)(states, open_act)
        zeros = jnp.zeros((n_games,), jnp.int32)

        def gumbel_move(states, key):
            _, _, act = run_gumbel_mcts(env, cfg_g, eval_fn, params,
                                        states, key)
            return act

        def puct_move(states, key):
            pi, _ = run_mcts_with_q(env, cfg_p, eval_fn, params, states,
                                    zeros, key)
            return jnp.argmax(pi, axis=-1).astype(jnp.int32)

        max_pairs = (env.num_actions + 1) // 2

        def cond(carry):
            states, _, t = carry
            return (t < max_pairs) & ~jnp.all(states.done)

        def body(carry):
            states, rng, t = carry
            rng, k2, k1 = jax.random.split(rng, 3)
            a2 = gumbel_move(states, k2) if not gumbel_is_p1 \
                else puct_move(states, k2)
            states = jax.vmap(env.step_safe)(states, a2)
            a1 = gumbel_move(states, k1) if gumbel_is_p1 \
                else puct_move(states, k1)
            states = jax.vmap(env.step_safe)(states, a1)
            return (states, rng, t + 1)

        states, _, _ = jax.lax.while_loop(
            cond, body, (states, rng, jnp.int32(0)))
        return states.winner

    n_half = args.games // 2
    rng = jax.random.PRNGKey(args.seed)
    w_a = np.asarray(arena_half(n_half, True, bundle, rng))   # gumbel = P1
    w_b = np.asarray(arena_half(n_half, False, bundle, rng))  # gumbel = P2
    g_wins = int((w_a == 1).sum() + (w_b == 2).sum())
    draws = int((w_a == 0).sum() + (w_b == 0).sum())
    played = int(w_a.shape[0] + w_b.shape[0])
    ga, gb = w_a == 1, w_b == 2
    pairs = {"win_both": int((ga & gb).sum()),
             "loss_both": int((~ga & ~gb).sum()),
             "split": int((ga ^ gb).sum()), "n": int(w_a.shape[0])}
    print(json.dumps({
        "ckpt": args.ckpt, "games": played,
        "gumbel_sims": args.gumbel_sims, "puct_sims": args.puct_sims,
        "m": args.m, "fpu": args.fpu,
        "gumbel_win_rate": round(g_wins / played, 4),
        "ci95": [round(x, 4) for x in wilson_ci(g_wins, played)],
        "draws": draws, "pairs": pairs,
    }))


if __name__ == "__main__":
    import sys
    sys.exit(main())
