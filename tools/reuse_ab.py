#!/usr/bin/env python
"""Strength A/B: cross-move subtree reuse vs fresh per-move search.

Device arena between two search modes of the SAME checkpoint at equal
simulations per move: one side threads its tree across moves
(``MCTSConfig.reuse_budget`` + ``advance_root``), the other searches
fresh every move (reference-parity semantics).  Mirrored-opening pairs
with seat swap, Wilson CI — the same statistical design as
``selfplay.arena.evaluate_params_detailed``.

The game loop is one jitted ``while_loop`` advancing a PAIR of plies per
iteration (P2 then P1, as ``arena_half``); the reuse side's tree is
advanced through EVERY action (its own and the opponent's), exactly like
the player integration (players/alpha_base.py).

Usage:
    python tools/reuse_ab.py [checkpoints/best_gomoku.ckpt]
        [--games 32] [--sims 256] [--budget 256]

Prints one JSON line: the REUSE side's win rate with CI and pair tally.
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
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--budget", type=int, default=0,
                    help="reuse_budget (0 = same as sims)")
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--max-depth", type=int, default=56)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.search.tree import (advance_root, init_tree,
                                                  _run_mcts_xla)
    from alphazero_gomoku_tpu.selfplay.arena import (OPENING_RADIUS,
                                                     wilson_ci)
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    model = AZModel.from_checkpoint(args.ckpt)
    env = make_env(args.game, args.size)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)
    budget = args.budget or args.sims
    cfg_r = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                       max_depth=args.max_depth, backend="xla",
                       reuse_budget=budget)
    cfg_f = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                       max_depth=args.max_depth, backend="xla")

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def arena_half(n_games: int, reuse_is_p1: bool, params, rng):
        """P1 opening move is random centre-9x9 (reference arena protocol);
        winners [n] (0 draw / 1 / 2)."""
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

        # the reuse side's tree starts fresh at the post-opening position
        trees0 = jax.vmap(lambda s: init_tree(env, cfg_r, s))(states)

        def fresh_move(states, key):
            pi, _, _ = _run_mcts_xla(env, cfg_f, eval_fn, params, states,
                                     zeros, key, init_trees=None)
            return jnp.argmax(pi, axis=-1).astype(jnp.int32)

        def reuse_move(states, trees, key):
            # root states of the carried trees are kept in sync by the
            # advance calls below; search resumes from them
            pi, _, trees = _run_mcts_xla(
                env, cfg_r, eval_fn, params,
                jax.tree_util.tree_map(lambda x: x[:, 0], trees.states),
                zeros, key, init_trees=trees)
            return jnp.argmax(pi, axis=-1).astype(jnp.int32), trees

        max_pairs = (env.num_actions + 1) // 2

        def cond(carry):
            states, _, _, t = carry
            return (t < max_pairs) & ~jnp.all(states.done)

        def body(carry):
            states, trees, rng, t = carry
            rng, k2, k1 = jax.random.split(rng, 3)
            # ---- P2 ply ----
            if reuse_is_p1:
                a2 = fresh_move(states, k2)
            else:
                a2, trees = reuse_move(states, trees, k2)
            states = jax.vmap(env.step_safe)(states, a2)
            trees = advance_root(env, cfg_r, trees, a2)
            # ---- P1 ply ----
            if reuse_is_p1:
                a1, trees = reuse_move(states, trees, k1)
            else:
                a1 = fresh_move(states, k1)
            states = jax.vmap(env.step_safe)(states, a1)
            trees = advance_root(env, cfg_r, trees, a1)
            return (states, trees, rng, t + 1)

        states, _, _, _ = jax.lax.while_loop(
            cond, body, (states, trees0, rng, jnp.int32(0)))
        return states.winner

    n_half = args.games // 2
    rng = jax.random.PRNGKey(args.seed)
    w_a = np.asarray(arena_half(n_half, True, bundle, rng))   # reuse = P1
    w_b = np.asarray(arena_half(n_half, False, bundle, rng))  # reuse = P2
    reuse_wins = int((w_a == 1).sum() + (w_b == 2).sum())
    draws = int((w_a == 0).sum() + (w_b == 0).sum())
    played = int(w_a.shape[0] + w_b.shape[0])
    ra, rb = w_a == 1, w_b == 2
    pairs = {"win_both": int((ra & rb).sum()),
             "loss_both": int((~ra & ~rb).sum()),
             "split": int((ra ^ rb).sum()), "n": int(w_a.shape[0])}
    print(json.dumps({
        "ckpt": args.ckpt, "games": played, "sims": args.sims,
        "reuse_budget": budget,
        "reuse_win_rate": round(reuse_wins / played, 4),
        "ci95": [round(x, 4) for x in wilson_ci(reuse_wins, played)],
        "draws": draws, "pairs": pairs,
    }))


if __name__ == "__main__":
    import sys
    sys.exit(main())
