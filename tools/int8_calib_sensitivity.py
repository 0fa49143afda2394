#!/usr/bin/env python
"""Diagnose int8 calibration sensitivity: same weights, different calib sets.

Motivated by run-12's arena contradiction: the eval arena (candidate vs the
shipped best, quantized at iter 1 on early-buffer states) read ~0.5 while the
anchor arena (candidate vs the SAME weights, quantized at iter 10 on a
different buffer snapshot) read 0.8-0.97 — the only input that differs
between the two opponent bundles is the calibration sample, so either the
quantization is calibration-fragile or the candidate genuinely dominates and
one arena lies.  This probe isolates the quantization leg on CPU: quantize
one checkpoint with several calibration sets and measure, against the f32
forward on held-out positions, (a) policy top-1 agreement, (b) policy KL,
(c) value MAE.  If any calibration set craters agreement, the bundle built
from it would genuinely play worse — no arena bug required.

Usage:
    python tools/int8_calib_sensitivity.py [ckpt] [--buffer PATH] [--n 256]
Prints one JSON line per calibration set.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def agreement(cfg, params, batch_stats, bundle, obs):
    from alphazero_gomoku_tpu.ops.int8_net import int8_apply
    from alphazero_gomoku_tpu.models.resnet import apply

    (logits_f, value_f), _ = apply(cfg, params, batch_stats, obs,
                                   train=False)
    logits_q, value_q = int8_apply(cfg, bundle, obs)
    top1_f = jnp.argmax(logits_f, axis=-1)
    top1_q = jnp.argmax(logits_q, axis=-1)
    lp_f = jax.nn.log_softmax(logits_f, axis=-1)
    lp_q = jax.nn.log_softmax(logits_q, axis=-1)
    kl = jnp.sum(jnp.exp(lp_f) * (lp_f - lp_q), axis=-1)
    return {
        "top1_agree": float(jnp.mean((top1_f == top1_q).astype(jnp.float32))),
        "policy_kl_mean": float(jnp.mean(kl)),
        "policy_kl_max": float(jnp.max(kl)),
        "value_mae": float(jnp.mean(jnp.abs(value_f - value_q))),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="checkpoints/best_gomoku.ckpt")
    ap.add_argument("--buffer", default=None,
                    help="replay buffer .npz to draw calib/held-out states")
    ap.add_argument("--n", type=int, default=256, help="calib set size")
    ap.add_argument("--held", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.ops.int8_net import (
        quantize_int8, random_play_calib_obs)

    model = AZModel.from_checkpoint(args.ckpt, board_size=15)
    rng = np.random.default_rng(args.seed)

    calib_sets = {"random_play": np.asarray(
        random_play_calib_obs(model.cfg, game="gomoku", n=args.n))}
    held = None
    if args.buffer:
        with np.load(args.buffer) as z:
            states = z["states"] if "states" in z else z[z.files[0]]
            size = len(states)
            idx = rng.choice(size, size=min(size, args.held + 2 * args.n),
                             replace=False)
            pool = states[idx]
        held = pool[: args.held]
        calib_sets["buffer_a"] = pool[args.held: args.held + args.n]
        calib_sets["buffer_b"] = pool[args.held + args.n:]
    if held is None:
        held = np.asarray(random_play_calib_obs(
            model.cfg, game="gomoku", n=args.held, seed=args.seed + 1))

    held = jnp.asarray(held, jnp.float32)
    for name, calib in calib_sets.items():
        bundle = quantize_int8(model.cfg, model.params, model.batch_stats,
                               calib)
        stats = agreement(model.cfg, model.params, model.batch_stats,
                          bundle, held)
        print(json.dumps({"calib": name, "ckpt": args.ckpt,
                          "n_calib": int(np.asarray(calib).shape[0]),
                          "n_held": int(held.shape[0]), **stats}))


if __name__ == "__main__":
    main()
