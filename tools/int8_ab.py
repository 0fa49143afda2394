#!/usr/bin/env python
"""Strength A/B: int8 quantized inference vs the exact f32 forward.

Plays a mirrored-opening device arena (``selfplay.arena``) between the
SAME checkpoint evaluated through the int8 path and through the exact f32
path, at equal simulations — the decision-grade test for whether
quantized inference is strength-neutral (policy top-1 agreement alone
does not settle it; MCTS can amplify or wash out policy perturbations).

The two sides carry different bundle pytrees; the eval_fn dispatches on
the bundle structure at trace time (each ``arena_half`` call traces its
own side), so the stock arena kernels are reused unchanged.

Usage:
    python tools/int8_ab.py [checkpoints/best_gomoku.ckpt]
        [--games 32] [--sims 256] [--backend pallas]

Prints one JSON line: the int8 side's win rate over f32 with a Wilson CI
and the mirrored-pair tally.  Strength-neutral = CI straddles 0.5 with
no decisive-pair skew.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="checkpoints/best_gomoku.ckpt")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--max-depth", type=int, default=56)
    ap.add_argument("--calib", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip", default="bf16",
                    choices=["f32", "bf16", "int8"],
                    help="skip-track storage of the int8 side "
                         "(quantize_int8 residual=...)")
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.models.resnet import apply
    from alphazero_gomoku_tpu.ops.int8_net import (int8_apply, quantize_int8,
                                                   random_play_calib_obs)
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay.arena import evaluate_params_detailed

    model = AZModel.from_checkpoint(args.ckpt)
    cfg = model.cfg
    env = make_env(args.game, args.size)

    q_bundle = quantize_int8(
        cfg, model.params, model.batch_stats,
        random_play_calib_obs(cfg, game=args.game, n=args.calib),
        residual=args.skip)
    f_bundle = {"params": model.params, "batch_stats": model.batch_stats}

    def eval_fn(bundle, obs):
        if "s_obs" in bundle:   # int8 bundle (trace-time dispatch)
            logits, value = int8_apply(cfg, bundle, obs)
        else:
            (logits, value), _ = apply(cfg, bundle["params"],
                                       bundle["batch_stats"], obs,
                                       train=False)
        return jax.nn.softmax(logits, axis=-1), value

    mcts = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                      max_depth=args.max_depth, backend=args.backend)
    r = evaluate_params_detailed(
        env, mcts, eval_fn, q_bundle, f_bundle, args.games,
        jax.random.PRNGKey(args.seed))
    print(json.dumps({
        "ckpt": args.ckpt, "games": r["played"], "sims": args.sims,
        "int8_win_rate": round(r["win_rate"], 4),
        "ci95": [round(x, 4) for x in r["ci95"]],
        "draws": r["draws"], "pairs": r["pairs"],
    }))


if __name__ == "__main__":
    import sys
    sys.exit(main())
