#!/usr/bin/env python
"""Feasibility probe: does an int8 conv beat f32/bf16 at our shapes?

The self-play forward (6x128 net, 15x15 boards, batch 128-512) is 72% of
per-sim time and already runs near the bf16 MXU roofline (DECISIONS.md
round-2 inference notes). The only order-unity lever left is the int8
MXU path (2x bf16 peak on v5e). This probe times one res-block-shaped
conv in f32, bf16, and int8 (int8 x int8 -> int32 accumulate) plus a
whole-tower-worth chain, and prints one JSON line per mode.

If int8 is not >=1.3x over f32 end-to-end here, the quantized-inference
project is not worth its accuracy risk — record the result and stop.

Usage:  python tools/int8_probe.py [--batch 256] [--channels 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


@functools.partial(jax.jit, static_argnames=("n", "acc"))
def chain(x, w, n: int, acc):
    # n convs back-to-back, rescaled to the input dtype between hops the
    # way a quantized tower would be (requant modelled as mul + cast)
    def body(h, _):
        y = conv(h, w, acc)
        if h.dtype == jnp.int8:
            y = jnp.clip((y.astype(jnp.float32) * (1.0 / 127)), -127, 127)
            y = y.astype(jnp.int8)
        else:
            y = y.astype(h.dtype)
        return y, ()
    out, _ = jax.lax.scan(body, x, None, length=n)
    # scalar result: timing syncs by fetching it — over the axon tunnel
    # jax.block_until_ready is a NO-OP (returns before remote execution
    # finishes); only a device->host readback truly waits (cf. bench.py)
    return out.astype(jnp.float32).sum()


def bench_mode(name, x, w, acc, n, reps=2000):
    # One dispatch per measurement (reps folded into the jitted scan) and
    # a two-length difference, so the ~1s axon tunnel latency and the
    # dispatch cost cancel and only device execution time remains.
    short, long_ = n, n * (reps + 1)
    for length in (short, long_):  # compile both
        float(chain(x, w, length, acc))

    def timed(length):
        t0 = time.perf_counter()
        float(chain(x, w, length, acc))
        return time.perf_counter() - t0

    dt = (min(timed(long_) for _ in range(3))
          - min(timed(short) for _ in range(3))) / (long_ - short)
    b, hh, ww, c = x.shape
    flops = 2 * 9 * c * c * hh * ww * b
    print(json.dumps({
        "mode": name, "us_per_conv": round(dt * 1e6, 2),
        "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--convs", type=int, default=13)  # 6 blocks x2 + stem
    ap.add_argument("--reps", type=int, default=2000,
                    help="long chain = convs*(reps+1); keep it seconds of "
                    "device time so the tunnel noise cancels in the diff")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    shape_x = (args.batch, args.size, args.size, args.channels)
    shape_w = (3, 3, args.channels, args.channels)
    xf = jnp.asarray(rng.standard_normal(shape_x), jnp.float32)
    wf = jnp.asarray(rng.standard_normal(shape_w) * 0.05, jnp.float32)

    tf32 = bench_mode("f32", xf, wf, jnp.float32, args.convs, args.reps)
    tbf = bench_mode("bf16", xf.astype(jnp.bfloat16),
                     wf.astype(jnp.bfloat16), jnp.float32, args.convs,
                     args.reps)
    xi = jnp.asarray(rng.integers(-127, 128, shape_x), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, shape_w), jnp.int8)
    ti8 = bench_mode("int8", xi, wi, jnp.int32, args.convs, args.reps)
    print(json.dumps({
        "int8_vs_f32": round(tf32 / ti8, 2),
        "int8_vs_bf16": round(tbf / ti8, 2),
    }))


if __name__ == "__main__":
    import sys
    sys.exit(main())
