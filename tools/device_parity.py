#!/usr/bin/env python
"""On-device differential: packed (Mosaic-compiled) search vs XLA search.

The CPU test lane exercises the packed kernels in Pallas INTERPRET mode
(tests/test_tree_kernels.py); this tool closes the remaining gap by
running the same XLA-vs-packed comparison with the kernels actually
compiled by Mosaic on the TPU.  Any pipeline hazard in the DMA-
overlapped walk/backup kernels (ops/tree_kernels.py) that interpret
mode cannot see — a read prefetched before the prior hop's write-back
landed, a wait matched to the wrong start — corrupts N/W and shows up
here as a visit-count (pi) mismatch.

Run on the chip (exclusive backend — queue behind other chip work):

    python tools/device_parity.py            # puct + gumbel + kleaf grid
    python tools/device_parity.py --quick    # one puct config

Exact bit-equality of pi is the expectation (integer visit counts; the
PUCT f32 arithmetic is same-order in both backends).  root_q may differ
in the last ulp between XLA and Mosaic reductions, so it gets an atol.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def random_states(env, batch, plies, seed):
    states = env.init_batch(batch)
    rng = np.random.default_rng(seed)
    for _ in range(plies):
        legal = np.asarray(jax.vmap(env.legal_mask)(states))
        acts = np.array([
            rng.choice(np.flatnonzero(row)) if row.any() else 0
            for row in legal
        ], dtype=np.int32)
        states = jax.vmap(env.step_safe)(states, jnp.asarray(acts))
    return states


def compare(env, cfg, eval_fn, bundle, states, move_no, key):
    import dataclasses

    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q

    # ROUND-5 FIX: the [xla] side must FORCE backend="xla".  With the
    # grid's backend="pallas" the round-4 version of this tool let
    # run_mcts_with_q dispatch back into the packed path (batch >= 8), so
    # the puct rows compared the packed program against itself, and the
    # gumbel row compared the packed GUMBEL search (via run_gumbel_mcts
    # dispatch) against run_mcts_packed's hard-coded PUCT walk — the
    # round-4 "0.22 gumbel device divergence" was an algorithm mismatch,
    # not numerics (DECISIONS round 5).
    cfg_x = dataclasses.replace(cfg, backend="xla")
    moves = jnp.full((states.done.shape[0],), move_no, jnp.int32)
    t0 = time.time()
    print("  [xla] compile+run...", flush=True)
    pi_x, q_x = jax.jit(
        lambda s, k: run_mcts_with_q(env, cfg_x, eval_fn, bundle, s,
                                     moves, k)
    )(states, key)
    pi_x, q_x = np.asarray(pi_x), np.asarray(q_x)
    t_x = time.time() - t0
    t0 = time.time()
    print(f"  [xla] done {t_x:.1f}s; [packed] compile+run...", flush=True)
    # packed side: run_mcts_with_q with backend="pallas" — the real
    # production dispatch (gumbel configs route to the packed gumbel
    # walk; run_mcts_packed alone would hard-code the PUCT walk)
    pi_p, q_p = jax.jit(
        lambda s, k: run_mcts_with_q(env, cfg, eval_fn, bundle, s,
                                     moves, k)
    )(states, key)
    pi_p, q_p = np.asarray(pi_p), np.asarray(q_p)
    t_p = time.time() - t0
    pi_mismatch_rows = int((pi_x != pi_p).any(axis=-1).sum())
    return {
        "pi_exact": bool((pi_x == pi_p).all()),
        "pi_mismatch_rows": pi_mismatch_rows,
        "pi_max_abs_diff": float(np.abs(pi_x - pi_p).max()),
        "q_max_abs_diff": float(np.abs(q_x - q_p).max()),
        "t_xla_s": round(t_x, 2), "t_packed_s": round(t_p, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sims", type=int, default=96)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--game", default="gomoku")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    env = make_env(args.game, args.size)
    model = AZModel(board_size=args.size, n_res_blocks=2, channels=64,
                    seed=11)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)

    # strict=False for gumbel: on device the packed and XLA gumbel
    # drivers are EACH bit-deterministic but diverge from each other —
    # XLA:TPU fuses their completed-Q/argmax glue differently, a
    # last-ulp difference flips halving tie-breaks, and the searches
    # legitimately part ways (tools/gumbel_determinism_probe.py,
    # round 4; exact on CPU where both lower to the same scalar order).
    # Both are valid gumbel searches; root_q agreement stays the check.
    grid = [dict(name="puct", search="puct", add_noise=True, k=1, plies=4,
                 strict=True),
            dict(name="puct_deep", search="puct", add_noise=False, k=1,
                 plies=24, strict=True),
            dict(name="kleaf4", search="puct", add_noise=False, k=4,
                 plies=8, strict=True),
            dict(name="gumbel", search="gumbel", add_noise=False, k=1,
                 plies=6, strict=False)]
    if args.quick:
        grid = grid[:1]

    ok = True
    out = {}
    for g in grid:
        cfg = MCTSConfig(n_simulations=args.sims, cpuct=1.25,
                         add_noise=g["add_noise"], dirichlet_alpha=0.1,
                         dirichlet_epsilon=0.25, dirichlet_moves=10,
                         max_depth=56, backend="pallas",
                         leaves_per_sim=g["k"], search=g["search"])
        states = random_states(env, args.batch, g["plies"], seed=g["plies"])
        r = compare(env, cfg, eval_fn, bundle, states, g["plies"],
                    jax.random.PRNGKey(g["plies"] + 1))
        r["config"] = g["name"]
        r["strict"] = g["strict"]
        print(json.dumps(r), flush=True)
        out[g["name"]] = r
        if g["strict"]:
            ok = ok and r["pi_exact"] and r["q_max_abs_diff"] < 1e-4
        else:
            ok = ok and r["q_max_abs_diff"] < 0.05
    print(json.dumps({"device": str(jax.devices()[0]), "all_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
