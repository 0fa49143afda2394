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


def pallas_rate(in_dtype, acc_dtype, k, reps, steps):
    """``steps`` scan iterations inside ONE jitted call, each issuing
    ``reps`` mutually-independent dots (distinct row-slices; the step's
    weight carries a zero-valued dependence on the previous step's
    accumulator so the compiler cannot hoist or collapse steps).

    Probe history: v1 chained every dot through ``acc[0, 0]`` (measured
    MXU drain latency, ~2 TF/s for all dtypes); v2 issued independent
    dots but timed 20 separate dispatches over the ~170 ms/call axon
    tunnel (measured the tunnel).  v3 amortizes both: rate is taken
    from the DELTA between two step counts in the same program shape,
    cancelling per-call tunnel overhead.
    """

    def kern(x_ref, w_ref, s_ref, o_ref):
        w0 = w_ref[:]

        def body(s, acc):
            w = w0 + (acc[0, 0] * 0).astype(in_dtype)
            inner = jnp.zeros((M, N), acc_dtype)
            for r in range(reps):
                inner = inner + jnp.dot(x_ref[r : r + M, :], w,
                                        preferred_element_type=acc_dtype)
            return inner

        o_ref[:] = jax.lax.fori_loop(0, s_ref[0], body,
                                     jnp.zeros((M, N), acc_dtype))

    @functools.partial(jax.jit, static_argnums=())
    def run(x, w, s):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w, s)

    return run


def xla_rate(in_dtype, acc_dtype, k, reps, steps):
    """Same structure in plain XLA (control)."""

    @jax.jit
    def run(x, w, s):
        def body(i, acc):
            wv = w + (acc[0, 0] * 0).astype(in_dtype)
            inner = jnp.zeros((M, N), acc_dtype)
            for r in range(reps):
                inner = inner + jnp.dot(x[r : r + M, :], wv,
                                        preferred_element_type=acc_dtype)
            return inner
        return jax.lax.fori_loop(0, s[0], body,
                                 jnp.zeros((M, N), acc_dtype))

    return run


def time_fn(run, x, w, k, reps, hi=400, lo=50):
    s_hi = jnp.asarray([hi], jnp.int32)
    s_lo = jnp.asarray([lo], jnp.int32)
    float(jnp.sum(run(x, w, s_hi).astype(jnp.float32)))  # compile+sync

    def t(s):
        t0 = time.time()
        float(jnp.sum(run(x, w, s).astype(jnp.float32)))
        return time.time() - t0

    d_lo = min(t(s_lo), t(s_lo))
    d_hi = min(t(s_hi), t(s_hi))
    flops = 2.0 * M * k * N * reps * (hi - lo)
    return flops / max(d_hi - d_lo, 1e-9) / 1e12


def main():
    rng = np.random.default_rng(0)
    results = {}
    # (k, reps): the tower kernel's per-offset shape (K=128, 9 dots per
    # conv), and the im2col shape (K=1152, one dot per conv)
    for k, reps in ((K, 9), (9 * K, 4)):
        xi = jnp.asarray(rng.integers(-3, 4, (M + reps, k)), jnp.int8)
        wi = jnp.asarray(rng.integers(-3, 4, (k, N)), jnp.int8)
        xb = jnp.asarray(rng.normal(size=(M + reps, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(k, N)), jnp.bfloat16)
        for name, fn, x, w in [
            (f"pallas_int8_k{k}",
             pallas_rate(jnp.int8, jnp.int32, k, reps, 0), xi, wi),
            (f"pallas_bf16_k{k}",
             pallas_rate(jnp.bfloat16, jnp.float32, k, reps, 0), xb, wb),
            (f"xla_int8_k{k}",
             xla_rate(jnp.int8, jnp.int32, k, reps, 0), xi, wi),
            (f"xla_bf16_k{k}",
             xla_rate(jnp.bfloat16, jnp.float32, k, reps, 0), xb, wb),
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
                      "construct": "delta of in-jit fori_loop step counts"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
