#!/usr/bin/env python
"""Tactical probe: does a checkpoint see wins-in-one and forced blocks?

Builds canonical 15x15 positions (open three, open four, split four) and
reports where the raw policy priors and a short search put their mass.
Tracks concrete learning progress independently of arena win rates — the
value-collapse post-mortem (TRAINING_GUIDE case study 1) showed the policy
can be tactically sharp while the value head is broken, and vice versa.

Usage:
    JAX_PLATFORMS=cpu python tools/tactics_probe.py --model <ckpt> [--sims 64]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def positions(size=15):
    """(name, stones, to_move, key_squares): key = correct move set."""
    c = size // 2
    pos = []

    # Opponent (P1) has an open three on the row; P2 to move must block at
    # either open end.
    b = np.zeros((size, size), np.int8)
    b[c, c - 1] = b[c, c] = b[c, c + 1] = 1
    b[c - 1, c] = b[c + 2, c + 2] = 2
    pos.append(("block_open_three", b, 2,
                {(c, c - 2), (c, c + 2)}))

    # P1 has four in a row with one open end; P1 to move wins immediately.
    b = np.zeros((size, size), np.int8)
    b[c, c - 2] = b[c, c - 1] = b[c, c] = b[c, c + 1] = 1
    b[c, c - 3] = 2  # left end blocked
    b[c - 1, c - 1] = b[c - 2, c] = b[c + 1, c + 1] = 2
    pos.append(("win_in_one", b, 1, {(c, c + 2)}))

    # Opponent (P1) has a simple four; P2 must block the single gap.
    b = np.zeros((size, size), np.int8)
    b[c, c - 2] = b[c, c - 1] = b[c, c + 1] = b[c, c + 2] = 1
    b[c - 1, c - 1] = b[c + 1, c + 1] = b[c - 2, c - 2] = 2
    pos.append(("block_split_four", b, 2, {(c, c)}))
    return pos


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--suite", default="full", choices=["core", "full"],
                    help="core = the 3 canonical positions; full = the "
                         "oracle-validated >=20-position suite "
                         "(tools/tactics_suites.py)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig, run_mcts
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    net = AZModel.from_checkpoint(args.model, board_size=args.size)
    # the probe positions (row fives, no pending captures) are legal and
    # tactically identical in pente; capture planes follow the checkpoint
    env = make_env(args.game, args.size,
                   capture_planes=net.cfg.in_channels == 5)
    eval_fn = make_eval_fn(net.cfg)
    bundle = bundle_of(net)
    cfg = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False)

    if args.suite == "full" and args.size == 15:
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tactics_suites import suite_for

        probe_positions = [(p.name, p.board, p.to_move, set(p.keys),
                            p.captures, p.category) for p in
                           suite_for(args.game)]
    else:
        probe_positions = [(name, b, tm, keys, (0, 0), "core")
                           for name, b, tm, keys in positions(args.size)]

    ok_prior = ok_search = 0
    results = []
    for name, board, to_move, keys, caps, category in probe_positions:
        if args.game == "pente":
            state = env.from_board(jnp.asarray(board), to_move, captures=caps)
        else:
            state = env.from_board(jnp.asarray(board), to_move)
        batched = jax.tree_util.tree_map(lambda x: x[None], state)
        obs = jax.vmap(env.encode)(batched)
        probs, value = eval_fn(bundle, obs)
        probs = np.asarray(probs)[0] * np.asarray(
            jax.vmap(env.legal_mask)(batched), np.float32)[0]
        pi = np.asarray(run_mcts(env, cfg, eval_fn, bundle, batched,
                                 jnp.zeros((1,), jnp.int32),
                                 jax.random.PRNGKey(0)))[0]

        def top(vec):
            a = int(np.argmax(vec))
            return (a // args.size, a % args.size)

        key_prior = sum(probs[r * args.size + c] for r, c in keys)
        key_pi = sum(pi[r * args.size + c] for r, c in keys)
        hit_prior = top(probs) in keys
        hit_search = top(pi) in keys
        ok_prior += hit_prior
        ok_search += hit_search
        results.append({
            "position": name, "category": category, "to_move": to_move,
            "value": round(float(np.asarray(value)[0, 0]), 3),
            "prior_on_keys": round(float(key_prior), 3),
            "prior_top": top(probs), "prior_hit": bool(hit_prior),
            "search_on_keys": round(float(key_pi), 3),
            "search_top": top(pi), "search_hit": bool(hit_search),
        })
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"model": args.model, "sims": args.sims,
                      "suite": args.suite,
                      "prior_hits": ok_prior, "search_hits": ok_search,
                      "total": len(results)}), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
