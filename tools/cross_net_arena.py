#!/usr/bin/env python
"""Mirrored-opening arena between two nets of DIFFERENT architectures.

``selfplay.arena`` pits two parameter sets of the SAME net (one eval_fn);
the distillation A/B (VERDICT r4 #5) needs a student (e.g. 4x96) against
the 6x128 teacher.  Same protocol as the production arena — centre-9x9
random openings, both halves share the rng so openings mirror with seats
swapped, argmax play, noise off — but each side carries its own
(eval_fn, bundle).

Usage:
    python tools/cross_net_arena.py checkpoints/distill_4x96.ckpt \
        checkpoints/best_gomoku.ckpt --games 64 --sims 64 --search gumbel

Prints one JSON line: A's win rate over B with CI and pair tally.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def cross_arena(env, cfg, eval_a, bundle_a, eval_b, bundle_b,
                n_games, seed, cfg_b=None):
    """``cfg_b`` (default: ``cfg``) lets the two sides search at
    different budgets — the equal-WALL-CLOCK A/B for a smaller net
    (e.g. 4x96 @ gumbel@100 vs 6x128 @ gumbel@64 costs the same
    time per move; see BASELINE.md round-5 addendum)."""
    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
    from alphazero_gomoku_tpu.selfplay.arena import OPENING_RADIUS, wilson_ci

    cfg_b = cfg_b or cfg
    size = env.size

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def half(rng, a_is_p1, n):
        center = size // 2
        rng, k_r, k_c = jax.random.split(rng, 3)
        r0 = jax.random.randint(k_r, (n,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        c0 = jax.random.randint(k_c, (n,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        states = env.init_batch(n)
        states = jax.vmap(env.step)(states,
                                    (r0 * size + c0).astype(jnp.int32))
        zeros = jnp.zeros((n,), jnp.int32)

        def mover(side_cfg, eval_fn, bundle):
            def mv(states, key):
                pi, _ = run_mcts_with_q(env, side_cfg, eval_fn, bundle,
                                        states, zeros, key)
                return jax.vmap(env.step_safe)(
                    states, jnp.argmax(pi, -1).astype(jnp.int32))
            return mv

        mv_a = mover(cfg, eval_a, bundle_a)
        mv_b = mover(cfg_b, eval_b, bundle_b)
        mv_p1 = mv_a if a_is_p1 else mv_b
        mv_p2 = mv_b if a_is_p1 else mv_a
        max_pairs = (env.num_actions + 1) // 2

        def cond(carry):
            states, _, t = carry
            return (t < max_pairs) & ~jnp.all(states.done)

        def body(carry):
            states, rng, t = carry
            rng, k2, k1 = jax.random.split(rng, 3)
            states = mv_p2(states, k2)
            states = mv_p1(states, k1)
            return (states, rng, t + 1)

        states, _, _ = jax.lax.while_loop(
            cond, body, (states, rng, jnp.int32(0)))
        return states.winner

    n_half = n_games // 2
    rng = jax.random.PRNGKey(seed)
    w_a = np.asarray(half(rng, True, n_half))
    w_b = np.asarray(half(rng, False, n_half))
    wins = int((w_a == 1).sum() + (w_b == 2).sum())
    draws = int((w_a == 0).sum() + (w_b == 0).sum())
    played = int(w_a.shape[0] + w_b.shape[0])
    won_a, won_b = w_a == 1, w_b == 2
    return {
        "a_wins": wins, "played": played, "draws": draws,
        "a_win_rate": round(wins / played, 4),
        "ci95": [round(x, 4) for x in wilson_ci(wins, played)],
        "pairs": {
            "win_both": int((won_a & won_b).sum()),
            "loss_both": int((~won_a & ~won_b).sum()),
            "split": int((won_a ^ won_b).sum()),
            "n": int(w_a.shape[0]),
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_a")
    ap.add_argument("ckpt_b")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--sims", type=int, default=400)
    ap.add_argument("--sims-b", type=int, default=None,
                    help="B's simulation budget (default: --sims); use "
                         "for equal-wall-clock A/Bs between unequal nets")
    ap.add_argument("--game", default="gomoku")
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--search", default="puct", choices=["puct", "gumbel"])
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--max-depth", type=int, default=56)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    ma = AZModel.from_checkpoint(args.ckpt_a, board_size=args.size)
    mb = AZModel.from_checkpoint(args.ckpt_b, board_size=args.size)
    env = make_env(args.game, args.size,
                   capture_planes=ma.cfg.in_channels == 5)
    cfg = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                     max_depth=args.max_depth, backend=args.backend,
                     search=args.search, gumbel_max_considered=args.m)
    cfg_b = (None if args.sims_b is None else
             MCTSConfig(n_simulations=args.sims_b, cpuct=1.0,
                        add_noise=False, max_depth=args.max_depth,
                        backend=args.backend, search=args.search,
                        gumbel_max_considered=args.m))
    r = cross_arena(env, cfg, make_eval_fn(ma.cfg), bundle_of(ma),
                    make_eval_fn(mb.cfg), bundle_of(mb),
                    args.games, args.seed, cfg_b=cfg_b)
    r.update({"a": args.ckpt_a, "b": args.ckpt_b, "sims": args.sims,
              "sims_b": args.sims_b or args.sims,
              "search": args.search,
              "arch_a": f"{ma.cfg.n_res_blocks}x{ma.cfg.channels}",
              "arch_b": f"{mb.cfg.n_res_blocks}x{mb.cfg.channels}"})
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
