#!/usr/bin/env python
"""Minimal repro: width-1 minor-dim slice WRITE on a 3-D VMEM ref hangs
the Mosaic TPU compiler (observed on v5e via the remote compile helper,
jax 0.9.0). The compile never returns — no error, no timeout.

    python repro/mosaic_width1_slice_hang.py            # hangs in compile
    python repro/mosaic_width1_slice_hang.py --ok       # segment-wide write
                                                        # compiles in ~1 s

Context: discovered wiring the slot-row compose into the MCTS backup
kernel (ops/tree_kernels.py, round 4). Writing the flag across its full
128-lane segment instead of one lane compiles instantly. 2-D width-1
column READS (`ref[:, c:c+1]`) are fine — the hang needs (a) a 3-D VMEM
ref, (b) a minor-dim slice of width 1, (c) a write.

WARNING: running without --ok occupies the compile helper indefinitely;
kill the process afterwards.
"""

import argparse
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, G, R, C = 8, 8, 1152, 1024


def kernel(ok: bool, x_ref, o_ref, scratch):
    scratch[:] = x_ref[:]
    vals = scratch[:]
    upd = jnp.ones((B, G, 1), jnp.float32)
    if ok:
        # segment-wide write: compiles fine
        scratch[:, :, C:] = vals[:, :, C:] * 0.5 + upd
    else:
        # width-1 minor-dim write: Mosaic never finishes compiling
        scratch[:, :, C:C + 1] = vals[:, :, C:C + 1] * 0.5 + upd
    o_ref[:] = scratch[:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ok", action="store_true",
                    help="use the segment-wide write that compiles")
    args = ap.parse_args()

    f = pl.pallas_call(
        functools.partial(kernel, args.ok),
        out_shape=jax.ShapeDtypeStruct((B, G, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, G, R), jnp.float32)],
    )
    x = jnp.zeros((B, G, R), jnp.float32)
    print("compiling (variant:", "ok" if args.ok else "hang", ")...",
          flush=True)
    y = jax.jit(f)(x)
    y.block_until_ready()
    print("compiled and ran; out[0,0,%d] = %s" % (C, float(y[0, 0, C])))


if __name__ == "__main__":
    main()
