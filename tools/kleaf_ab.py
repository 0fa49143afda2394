#!/usr/bin/env python
"""Arena A/B: k-leaves-per-sim search vs the sequential (k=1) search.

Plays mirrored-opening arena games where BOTH sides use the same network
parameters but different ``MCTSConfig``s (side A: ``--k`` leaves per
network call with virtual loss; side B: the reference-exact k=1 search),
with seats swapped between the halves — the validation the k-leaf
throughput lever requires before it can default on (equal total leaf
evaluations per move, so equal network FLOPs; reference anchor for the
batching semantics: ``/root/reference/mcts/new_mcts_alpha.py:116-132``).

Reports A's win rate with a Wilson 95% CI and the mirrored pair tally.
Strength-neutral means the CI comfortably contains 0.5.

Usage:
    python tools/kleaf_ab.py [--model ckpt] [--games 32] [--sims 128]
        [--k 4] [--size 15] [--blocks 6] [--channels 128] [--backend xla]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 5))
def arena_half_two_cfgs(env, cfg_p1, cfg_p2, eval_fn, params, n_games, rng):
    """Lockstep arena where P1 searches with cfg_p1 and P2 with cfg_p2
    (same parameters both sides). Mirrors selfplay.arena.arena_half."""
    from alphazero_gomoku_tpu.search.tree import run_mcts
    from alphazero_gomoku_tpu.selfplay.arena import OPENING_RADIUS

    size = env.size
    center = size // 2
    rng, k_r, k_c = jax.random.split(rng, 3)
    r0 = jax.random.randint(k_r, (n_games,), center - OPENING_RADIUS,
                            center + OPENING_RADIUS + 1)
    c0 = jax.random.randint(k_c, (n_games,), center - OPENING_RADIUS,
                            center + OPENING_RADIUS + 1)
    states = env.init_batch(n_games)
    states = jax.vmap(env.step)(states, (r0 * size + c0).astype(jnp.int32))
    zeros = jnp.zeros((n_games,), jnp.int32)

    def half_move(states, cfg, key):
        pi = run_mcts(env, cfg, eval_fn, params, states, zeros, key)
        actions = jnp.argmax(pi, axis=-1).astype(jnp.int32)
        return jax.vmap(env.step_safe)(states, actions)

    max_pairs = (env.num_actions + 1) // 2

    def cond(carry):
        states, _, t = carry
        return (t < max_pairs) & ~jnp.all(states.done)

    def body(carry):
        states, rng, t = carry
        rng, k2, k1 = jax.random.split(rng, 3)
        states = half_move(states, cfg_p2, k2)
        states = half_move(states, cfg_p1, k1)
        return (states, rng, t + 1)

    states, _, _ = jax.lax.while_loop(cond, body,
                                      (states, rng, jnp.int32(0)))
    return states.winner


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="checkpoint (default: random weights)")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=128)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import wilson_ci
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    env = make_env(args.game, args.size)
    if args.model:
        model = AZModel.from_checkpoint(args.model, board_size=args.size)
    else:
        model = AZModel(board_size=args.size, n_res_blocks=args.blocks,
                        channels=args.channels, seed=args.seed)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)

    cfg_a = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                       max_depth=56, backend=args.backend,
                       leaves_per_sim=args.k)
    cfg_b = dataclasses.replace(cfg_a, leaves_per_sim=1)

    half = args.games // 2
    key = jax.random.PRNGKey(args.seed)
    # same key both halves => mirrored openings (selfplay.arena design)
    w_a = np.asarray(arena_half_two_cfgs(env, cfg_a, cfg_b, eval_fn,
                                         bundle, half, key))
    w_b = np.asarray(arena_half_two_cfgs(env, cfg_b, cfg_a, eval_fn,
                                         bundle, half, key))
    a_wins = int((w_a == 1).sum()) + int((w_b == 2).sum())
    draws = int((w_a == 0).sum()) + int((w_b == 0).sum())
    played = int(w_a.shape[0] + w_b.shape[0])
    a_won_first = w_a == 1
    a_won_second = w_b == 2
    pairs = {
        "win_both": int((a_won_first & a_won_second).sum()),
        "loss_both": int((~a_won_first & ~a_won_second).sum()),
        "n": half,
    }
    pairs["split"] = half - pairs["win_both"] - pairs["loss_both"]
    lo, hi = wilson_ci(a_wins, played)
    print(json.dumps({
        "k": args.k, "sims": args.sims, "games": played,
        "k_wins": a_wins, "draws": draws,
        "win_rate": round(a_wins / max(played, 1), 4),
        "ci95": [round(lo, 4), round(hi, 4)],
        "pairs": pairs,
        "neutral": lo <= 0.5 <= hi,
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
