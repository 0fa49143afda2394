#!/usr/bin/env python
"""Minimized repro: per-lane scatter-adds into a large [B, N, D] array
inside nested scan/while loops hard-fault the TPU v5e worker.

Observed (deterministic, TPU v5 lite / jax 0.9.0):
  - B=64,  N=401, D=450 (~46 MB)  -> runs fine
  - B=96,  N=385, D=450 (~66 MB)  -> TPU worker process crashes
  - B=64,  N=801, D=450 (~92 MB)  -> TPU worker process crashes
  - B=256, N=401, D=450 (~185 MB) -> TPU worker process crashes

The failing pattern is the backup phase of a batched MCTS: a
``lax.scan`` (simulations) whose body runs a vmapped ``lax.while_loop``
performing two scalar ``.at[p, a].add()`` scatter-adds per iteration
into the big array, with per-lane dynamic (p, a) indices.  The crash is
in the worker process itself ("TPU worker process crashed or
restarted"), not a Python exception — pointing at the generated
scatter lowering rather than an OOM (the arrays are far below HBM
capacity, and the same shapes allocate fine outside the loop nest).

Production impact and fix in this repo: the XLA MCTS backend
(search/tree.py) hits this above ~90 MB of tree state, capping
games x sims per chip; the Pallas backend (ops/tree_kernels.py,
MCTSConfig.backend="pallas") replaces the scatters with explicit row
DMAs and runs the failing shapes correctly (bit-identical results,
verified on hardware).

WARNING: running this WILL crash the TPU runtime for other users of the
chip. Run it only on an idle device.

Usage:  python repro/xla_scatter_fault.py [B] [N] [SIMS]
        defaults: 96 385 384  (a crashing config)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
N = int(sys.argv[2]) if len(sys.argv) > 2 else 385
SIMS = int(sys.argv[3]) if len(sys.argv) > 3 else 384
A = 225
D = 2 * A
DEPTH = 24


def one_sim(nw, sim):
    """Walk a pseudo-path per lane and scatter-add along it."""

    def lane(nw_lane, seed):
        def cond(c):
            _, _, d = c
            return d < DEPTH

        def body(c):
            nw_lane, node, d = c
            a = (node * 7 + seed * 13 + d) % A
            nw_lane = nw_lane.at[node, a].add(1.0)
            nw_lane = nw_lane.at[node, A + a].add(0.5)
            nxt = (node * 31 + a) % N
            return nw_lane, nxt, d + 1

        out, _, _ = jax.lax.while_loop(cond, body,
                                       (nw_lane, seed % N, jnp.int32(0)))
        return out

    seeds = (jnp.arange(B, dtype=jnp.int32) + sim * 101) % 997
    return jax.vmap(lane)(nw, seeds), None


@jax.jit
def run(nw):
    nw, _ = jax.lax.scan(one_sim, nw,
                         jnp.arange(SIMS, dtype=jnp.int32))
    return jnp.sum(nw)


if __name__ == "__main__":
    print(f"B={B} N={N} SIMS={SIMS} -> array "
          f"{B * N * D * 4 / 1e6:.0f} MB on {jax.devices()[0]}")
    nw = jnp.zeros((B, N, D), jnp.float32)
    total = float(run(nw))  # value fetch = true synchronization
    expect = B * SIMS * DEPTH * 1.5
    print(f"sum={total} (expected {expect}) — "
          f"{'OK' if abs(total - expect) < 1 else 'MISMATCH'}")
