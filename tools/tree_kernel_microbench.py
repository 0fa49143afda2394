#!/usr/bin/env python
"""Isolated select/backup kernel timing with controlled walk depth.

Builds per-lane trees that are linear chains of depth D (each node's only
legal action leads to its child; the walk is forced to take exactly D hops
before reaching an unexpanded edge), times ``select_walk`` and
``backup_paths`` separately inside chained scans (value-fetch sync), and
fits per-invocation vs per-hop cost from two depths.

Usage: python tools/tree_kernel_microbench.py --batches 64 128 --depths 4 24
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_chain_tree(b, depth, layout):
    """Packed [B, n_nodes * 8, seg] where node i -> node i+1 via action 0.

    Node-as-group layout (ops/tree_kernels): node k owns sublane rows
    [k*8, k*8+8) with N/W/P/C/meta on sublanes 0-4.  Nodes 0..depth-1 are
    expanded with a single legal prior on action 0 and child i+1; node
    depth has child -1 on action 0 (the unexpanded edge the walk stops on).
    """
    from alphazero_gomoku_tpu.ops.tree_kernels import (
        GROUP, SL_C, SL_N, SL_P)

    nodes = np.zeros((layout.n_nodes, GROUP, layout.seg), np.float32)
    nodes[:, SL_P, :] = -1.0                  # all priors illegal
    nodes[:, SL_C, :] = -1.0                  # all children unexpanded
    nodes[: depth + 1, SL_P, 0] = 1.0         # action 0 legal on the chain
    nodes[:depth, SL_C, 0] = np.arange(1, depth + 1)   # child links
    nodes[: depth + 1, SL_N, 0] = 1.0         # N[a=0] = 1 (visited once)
    rows = nodes.reshape(layout.n_nodes * GROUP, layout.seg)
    packed = np.broadcast_to(rows, (b,) + rows.shape).copy()
    return jnp.asarray(packed)


def time_chained(fn, iters, *args):
    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c, *args)
            return out, None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--depths", type=int, nargs="+", default=[4, 24])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--n-nodes", type=int, default=401)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.ops.tree_kernels import (
        backup_paths, packed_layout, select_walk,
    )

    for b in args.batches:
        for d in args.depths:
            layout = packed_layout(225, args.n_nodes)
            packed0 = build_chain_tree(b, d, layout)
            depth_limit = 56

            # --- select: feed N-perturbation back so scan can't collapse
            def sel_step(packed, _=None):
                leaf, action, pn, pa, plen = select_walk(
                    packed, layout, 1.0, depth_limit)
                eps = (jnp.sum(leaf) + jnp.sum(plen)).astype(jnp.float32)
                return packed + eps * 1e-20

            run_sel = time_chained(sel_step, args.iters)
            float(jnp.sum(run_sel(packed0)))          # compile+warm, sync
            t0 = time.time()
            float(jnp.sum(run_sel(packed0)))
            sel_ms = (time.time() - t0) / args.iters * 1e3

            # --- backup: fixed straight-line path of length d
            pn = jnp.broadcast_to(
                jnp.where(jnp.arange(depth_limit) < d,
                          jnp.arange(depth_limit), -1)[:, None],
                (depth_limit, b)).astype(jnp.int32)
            pa = jnp.zeros((depth_limit, b), jnp.int32)
            plen = jnp.full((b,), d, jnp.int32)
            vals = jnp.full((b,), 0.25, jnp.float32)
            expanding = jnp.ones((b,), jnp.int32)

            pri = jnp.zeros((b, layout.num_actions), jnp.float32)
            dn = jnp.zeros((b,), jnp.float32)

            def bk_step(packed, _=None):
                out = backup_paths(packed, pn, pa, plen, vals, expanding,
                                   jnp.int32(d + 1), layout,
                                   signed_priors=pri, done=dn)
                return out

            run_bk = time_chained(bk_step, args.iters)
            float(jnp.sum(run_bk(packed0)))
            t0 = time.time()
            float(jnp.sum(run_bk(packed0)))
            bk_ms = (time.time() - t0) / args.iters * 1e3

            print(json.dumps({
                "batch": b, "depth": d,
                "select_ms": round(sel_ms, 4),
                "backup_ms": round(bk_ms, 4),
            }), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
