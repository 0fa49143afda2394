#!/usr/bin/env python
"""Measure Mosaic's raw matmul rate per dtype at the tower kernel's shape.

The fused int8 tower kernel (ops/int8_tower.py) measured ~10% of the
chip's int8 peak (runs/int8t_microbench.log, round 5).  Discriminator:
time a bare Pallas kernel doing nothing but repeated MXU dots at the
kernel's exact shape (M=2040, K=128, N=128) for int8->int32 and
bf16->f32, plus the same dots as plain XLA ops as a control.  If the
int8 Pallas rate is far below both the bf16 Pallas rate and the XLA
int8 rate, Mosaic is not lowering jnp.dot(int8, int8 -> int32) onto the
MXU's native int8 path — the tower kernel's premise fails at the
compiler, not the design.

Run on a free chip: python tools/mosaic_matmul_rate.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2040, 128, 128
REPS = 64          # dots per kernel call (chained through acc[0,0])
CALLS = 20


def pallas_rate(in_dtype, acc_dtype, k=K, reps=REPS):
    """REPS INDEPENDENT dots (distinct row-slices of a larger input, so
    no CSE and no cross-dot dependence): measures issue rate, not
    pipeline latency.  The first version of this probe chained the dots
    through ``acc[0, 0]`` and measured ~2 TF/s for BOTH dtypes — pure
    MXU drain latency per rep, useless as a rate probe."""

    def kern(x_ref, w_ref, o_ref):
        w = w_ref[:]
        acc = jnp.zeros((M, N), acc_dtype)
        for r in range(reps):
            x_r = x_ref[r : r + M, :]
            acc = acc + jnp.dot(x_r, w, preferred_element_type=acc_dtype)
        o_ref[:] = acc

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    return run


def xla_rate(in_dtype, acc_dtype, k=K, reps=REPS):
    """Same independent-slice structure as plain XLA ops (control)."""

    @jax.jit
    def run(x, w):
        acc = jnp.zeros((M, N), acc_dtype)
        for r in range(reps):
            acc = acc + jnp.dot(x[r : r + M, :], w,
                                preferred_element_type=acc_dtype)
        return acc

    return run


def time_fn(run, x, w, k, reps):
    out = run(x, w)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + true sync
    t0 = time.time()
    for _ in range(CALLS):
        out = run(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.time() - t0
    flops = 2.0 * M * k * N * reps * CALLS
    return flops / dt / 1e12


def main():
    rng = np.random.default_rng(0)
    results = {}
    # (k, reps): the tower kernel's per-offset shape (K=128, 9 dots per
    # conv), and the im2col shape (K=1152, one dot per conv)
    for k, reps in ((K, REPS), (9 * K, 8)):
        xi = jnp.asarray(rng.integers(-3, 4, (M + reps, k)), jnp.int8)
        wi = jnp.asarray(rng.integers(-3, 4, (k, N)), jnp.int8)
        xb = jnp.asarray(rng.normal(size=(M + reps, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(k, N)), jnp.bfloat16)
        for name, fn, x, w in [
            (f"pallas_int8_k{k}",
             pallas_rate(jnp.int8, jnp.int32, k, reps), xi, wi),
            (f"pallas_bf16_k{k}",
             pallas_rate(jnp.bfloat16, jnp.float32, k, reps), xb, wb),
            (f"xla_int8_k{k}",
             xla_rate(jnp.int8, jnp.int32, k, reps), xi, wi),
            (f"xla_bf16_k{k}",
             xla_rate(jnp.bfloat16, jnp.float32, k, reps), xb, wb),
        ]:
            try:
                tf = time_fn(fn, x, w, k, reps)
            except Exception as e:
                print(json.dumps({"mode": name, "error": str(e)[:200]}),
                      flush=True)
                continue
            results[name] = round(tf, 1)
            print(json.dumps({"mode": name, "tflops": round(tf, 1)}),
                  flush=True)
    print(json.dumps({"summary": results, "m": M, "n": N,
                      "independent_dots": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
