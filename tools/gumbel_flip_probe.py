#!/usr/bin/env python
"""Bound the packed-vs-XLA gumbel divergence on device (VERDICT r4 #4).

Round 4 established the mechanism: on TPU the packed (Mosaic) and XLA
gumbel drivers are each bit-deterministic but XLA:TPU fuses the
completed-Q glue differently, so a last-ulp difference can flip a
sequential-halving tie-break and the searches legitimately part ways
(``tools/gumbel_determinism_probe.py``; bit-exact on CPU).  PARITY.md
tolerated this with a root_q atol.  This tool replaces the tolerance
with numbers:

1. **Flip rate**: over >=1k real positions (random-play boards at mixed
   plies), how often do the two backends pick a DIFFERENT argmax move,
   and what is the pi delta distribution when they do?
2. **Strength A/B**: a mirrored-opening arena of packed-gumbel vs
   XLA-gumbel with the SAME net (per-seat mirrored pairs exactly like
   ``selfplay/arena.py``) — divergence is harmless iff this is ~0.5.

Run on a free chip:

    python tools/gumbel_flip_probe.py --ckpt checkpoints/best_gomoku.ckpt
        [--sims 64] [--m 16] [--batch 192] [--arena-games 64]

Reference anchor: /root/reference/mcts/new_mcts_alpha.py:136-140 (the
argmax tie-break contract the PUCT paths meet bit-exactly).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

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


def flip_rate(env, cfg_p, cfg_x, eval_fn, bundle, batch, plies_grid, seed0):
    # both sides go through run_mcts_with_q — the production dispatcher —
    # with only cfg.backend flipped, so gumbel configs route to the
    # packed/XLA GUMBEL drivers respectively (run_mcts_packed would
    # hard-code the PUCT walk; see the round-5 device_parity fix)
    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q

    f_x = jax.jit(lambda s, m, k: run_mcts_with_q(
        env, cfg_x, eval_fn, bundle, s, m, k))
    f_p = jax.jit(lambda s, m, k: run_mcts_with_q(
        env, cfg_p, eval_fn, bundle, s, m, k))

    total = flips = 0
    pi_deltas = []
    q_deltas = []
    flip_pi_deltas = []
    for i, plies in enumerate(plies_grid):
        states = random_states(env, batch, plies, seed=seed0 + i)
        live = ~np.asarray(states.done)
        moves = jnp.full((batch,), plies, jnp.int32)
        key = jax.random.PRNGKey(seed0 + 100 + i)
        pi_x, q_x = map(np.asarray, f_x(states, moves, key))
        pi_p, q_p = map(np.asarray, f_p(states, moves, key))
        ax, ap = pi_x.argmax(-1), pi_p.argmax(-1)
        row_flip = (ax != ap) & live
        row_delta = np.abs(pi_x - pi_p).max(-1)
        total += int(live.sum())
        flips += int(row_flip.sum())
        pi_deltas.extend(row_delta[live].tolist())
        q_deltas.extend(np.abs(q_x - q_p)[live].tolist())
        flip_pi_deltas.extend(row_delta[row_flip].tolist())
        print(json.dumps({
            "plies": plies, "live": int(live.sum()),
            "flips": int(row_flip.sum()),
            "pi_max_delta": float(row_delta[live].max(initial=0.0)),
        }), flush=True)
    pi_deltas = np.array(pi_deltas)
    return {
        "positions": total,
        "argmax_flips": flips,
        "flip_rate": round(flips / max(total, 1), 4),
        "pi_delta_p50": float(np.percentile(pi_deltas, 50)),
        "pi_delta_p95": float(np.percentile(pi_deltas, 95)),
        "pi_delta_max": float(pi_deltas.max(initial=0.0)),
        "pi_delta_frac_zero": float((pi_deltas == 0).mean()),
        "q_delta_max": float(np.max(q_deltas, initial=0.0)),
        "flip_pi_delta_mean": (float(np.mean(flip_pi_deltas))
                               if flip_pi_deltas else 0.0),
    }


def cross_backend_arena(env, cfg_p, cfg_x, eval_fn, bundle, n_games, seed):
    """Mirrored arena: packed-gumbel vs XLA-gumbel, same parameters.

    Structured exactly like ``selfplay.arena``: both halves reuse the
    same rng (identical centre-9x9 openings), the packed side takes P1
    in half A and P2 in half B.
    """
    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
    from alphazero_gomoku_tpu.selfplay.arena import OPENING_RADIUS, wilson_ci

    size = env.size

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def half(rng, packed_is_p1, n):
        center = size // 2
        rng, k_r, k_c = jax.random.split(rng, 3)
        r0 = jax.random.randint(k_r, (n,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        c0 = jax.random.randint(k_c, (n,), center - OPENING_RADIUS,
                                center + OPENING_RADIUS + 1)
        states = env.init_batch(n)
        states = jax.vmap(env.step)(states, (r0 * size + c0).astype(jnp.int32))
        zeros = jnp.zeros((n,), jnp.int32)

        def mv_packed(states, key):
            pi, _ = run_mcts_with_q(env, cfg_p, eval_fn, bundle, states,
                                    zeros, key)
            return jax.vmap(env.step_safe)(
                states, jnp.argmax(pi, -1).astype(jnp.int32))

        def mv_xla(states, key):
            pi, _ = run_mcts_with_q(env, cfg_x, eval_fn, bundle, states,
                                    zeros, key)
            return jax.vmap(env.step_safe)(
                states, jnp.argmax(pi, -1).astype(jnp.int32))

        mv_p2 = mv_xla if packed_is_p1 else mv_packed
        mv_p1 = mv_packed if packed_is_p1 else mv_xla
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
    w_a = np.asarray(half(rng, True, n_half))   # packed as P1
    w_b = np.asarray(half(rng, False, n_half))  # packed as P2
    wins = int((w_a == 1).sum() + (w_b == 2).sum())
    draws = int((w_a == 0).sum() + (w_b == 0).sum())
    played = int(w_a.shape[0] + w_b.shape[0])
    won_a, won_b = w_a == 1, w_b == 2
    return {
        "packed_wins": wins, "played": played, "draws": draws,
        "packed_win_rate": round(wins / played, 4),
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
    ap.add_argument("--ckpt", default="checkpoints/best_gomoku.ckpt")
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--plies", type=int, nargs="+",
                    default=[2, 6, 10, 16, 22, 30])
    ap.add_argument("--arena-games", type=int, default=64)
    ap.add_argument("--skip-arena", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    model = AZModel.from_checkpoint(args.ckpt, board_size=15)
    env = make_env("gomoku", 15, capture_planes=model.cfg.in_channels == 5)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)

    common = dict(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                  max_depth=56, search="gumbel",
                  gumbel_max_considered=args.m)
    cfg_p = MCTSConfig(backend="pallas", **common)
    cfg_x = MCTSConfig(backend="xla", **common)

    fr = flip_rate(env, cfg_p, cfg_x, eval_fn, bundle, args.batch,
                   args.plies, args.seed)
    print(json.dumps({"flip_rate_summary": fr}), flush=True)

    if not args.skip_arena:
        ar = cross_backend_arena(env, cfg_p, cfg_x, eval_fn, bundle,
                                 args.arena_games, args.seed + 7)
        print(json.dumps({"cross_backend_arena": ar}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
