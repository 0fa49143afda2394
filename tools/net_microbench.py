#!/usr/bin/env python
"""Isolated network-forward timing: exact f32 vs folded-BN f32/bf16.

Chains K evaluations inside ONE jitted ``lax.scan`` (each step's input is
perturbed by the previous step's output, so XLA cannot overlap or elide
steps) and synchronizes by fetching the final scalar — ``block_until_ready``
is not a true barrier over the axon tunnel (DECISIONS.md measurement
discipline).  Reports ms per evaluation for each (mode, batch) pair.

Usage: python tools/net_microbench.py [--batches 64 128] [--iters 200]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def chained_timer(step_fn, obs0, iters):
    """Build one jitted program running ``iters`` dependent evals."""

    @jax.jit
    def run(obs0):
        def body(obs, _):
            probs, value = step_fn(obs)
            # scalar feedback: forces sequential execution, costs nothing
            eps = (jnp.sum(probs) + jnp.sum(value)) * 1e-20
            return obs + eps, None

        out, _ = jax.lax.scan(body, obs0, None, length=iters)
        return jnp.sum(out)

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--only", default=None,
                    help="substring filter on mode names")
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.models.resnet import apply
    from alphazero_gomoku_tpu.ops.fused_net import (
        fold_bn_xla, folded_xla_apply,
    )

    model = AZModel(board_size=15, n_res_blocks=args.blocks,
                    channels=args.channels, seed=0)
    cfg = model.cfg
    folded_bf16 = fold_bn_xla(cfg, model.params, model.batch_stats)
    folded_f32 = fold_bn_xla(cfg, model.params, model.batch_stats,
                             dtype=jnp.float32)

    def exact(obs):
        (logits, value), _ = apply(cfg, model.params, model.batch_stats,
                                   obs, train=False)
        return jax.nn.softmax(logits, -1), value

    from alphazero_gomoku_tpu.ops.int8_net import (
        int8_apply, quantize_int8, random_calib_obs)
    calib = random_calib_obs(cfg, n=64)
    q8 = {res: quantize_int8(cfg, model.params, model.batch_stats, calib,
                             residual=res)
          for res in ("f32", "bf16", "int8")}

    def int8(bundle):
        def fn(obs):
            logits, value = int8_apply(cfg, bundle, obs)
            return jax.nn.softmax(logits, -1), value
        return fn

    from alphazero_gomoku_tpu.ops.int8_tower import (
        int8_tower_apply, pack_tower_bundle)
    packed = pack_tower_bundle(cfg, q8["f32"])

    def int8t(tile):
        def fn(obs):
            logits, value = int8_tower_apply(cfg, packed, tile, obs)
            return jax.nn.softmax(logits, -1), value
        return fn

    modes = {
        "exact_f32": exact,
        "folded_f32": lambda obs: folded_xla_apply(cfg, folded_f32, obs),
        "folded_bf16": lambda obs: folded_xla_apply(cfg, folded_bf16, obs),
        "int8_skipf32": int8(q8["f32"]),
        "int8_skipbf16": int8(q8["bf16"]),
        "int8_skipint8": int8(q8["int8"]),
        "int8_tower_t8": int8t(8),
        "int8_tower_t16": int8t(16),
        "int8_tower_t32": int8t(32),
    }

    results = {}
    for b in args.batches:
        rng = np.random.default_rng(0)
        obs = jnp.asarray(
            rng.integers(0, 2, (b, 15, 15, 3)).astype(np.float32))
        for name, fn in modes.items():
            if args.only and args.only not in name:
                continue
            try:
                run = chained_timer(fn, obs, args.iters)
                float(run(obs))  # compile + warm, true sync via value fetch
                t0 = time.time()
                float(run(obs))
                dt = time.time() - t0
            except Exception as e:  # e.g. VMEM overflow at a large tile
                print(json.dumps({"mode": name, "batch": b,
                                  "error": str(e)[:200]}), flush=True)
                continue
            ms = dt / args.iters * 1e3
            results[f"{name}_b{b}"] = round(ms, 4)
            print(json.dumps({"mode": name, "batch": b,
                              "ms_per_eval": round(ms, 4)}), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
