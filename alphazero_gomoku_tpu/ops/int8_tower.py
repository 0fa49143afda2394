"""Fused int8 residual-tower Pallas kernel (TPU MXU, whole tower in VMEM).

**Measured verdict (round 5): a DEAD END on this Mosaic/libtpu pair —
4.3x slower than the XLA int8 path on device** (2.47 vs 0.57 ms/eval at
batch 128, runs/int8t_microbench.log; the tile-16 variant additionally
hung the Mosaic backend compile).  The kernel's dataflow — 9
accumulating [G*Q, C] x [C, C] dots per conv, 13 data-dependent convs —
is a chain of dependent small-K matmuls that runs MXU-latency-bound,
while XLA's conv path gets K=1152 im2col matmuls plus inter-op
parallelism (DECISIONS round 5; tools/mosaic_matmul_rate.py).  Kept
in-tree as a tested, bit-exact boundary probe and NOT the default: it
documents where hand-fused small-spatial conv towers lose to XLA's conv
fusion on TPU.

The premise it tested: the XLA int8 path (:mod:`ops.int8_net`) runs
each conv as a separate XLA op — every inter-layer activation
round-trips HBM (int8 tensors plus the f32 skip stream) and every
requant epilogue is a separate fusion.  At the production shape the
end-to-end forward sits ~2x from the int8 speed-of-light line
(BASELINE.md roofline; VERDICT r4 #1 lever b).

This kernel keeps the ENTIRE residual tower resident on-chip:

  - all conv weights (int8, activation scales pre-folded by
    :func:`ops.int8_net.quantize_int8`) live in VMEM for the whole kernel
    — 1.8 MB for the 6x128 net;
  - activations stay in VMEM as int8 between convs; the f32 skip carry
    lives in a VMEM scratch; NOTHING touches HBM between the stem and the
    tower output;
  - each 3x3 SAME conv is nine static-slice int8 x int8 -> int32 MXU
    matmuls over a zero-padded flat-row buffer; dequant + bias + ReLU +
    requant run on the VPU between matmuls.

Flat-row layout: a board row y is stored with P = size+2 columns
(2 zero pad columns), so the padded buffer is [G, P*P, C] and a 3x3
offset (dy, dx) is ONE contiguous row-slice of length Q = size*P at
base dy*P+dx — output row q = y*P+x maps back into the padded buffer at
p = q + P + 1, which is again one contiguous band write.  The two
out-of-board columns per row compute garbage that is zero-masked before
re-embedding, landing exactly on the pad cells (13% extra MXU rows for
fully static, contiguous addressing).

Numerics are BIT-EXACT vs :func:`ops.int8_net.int8_apply` with the
default f32 skip track (integer conv accumulation is exact; the f32
epilogues perform the same elementary ops in the same order); the heads
run outside the kernel in f32 XLA exactly as in ``int8_apply``
(their 2-/1-lane shapes crash Mosaic — see ``ops/fused_net.py``).

Reference analogue: eval-mode ``predict`` (/root/reference/network.py:
168-183); the reference has no quantized or fused path — TPU-specific.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_gomoku_tpu.models.resnet import NetConfig
from alphazero_gomoku_tpu.ops.int8_net import QMAX, _requant_inv

DEFAULT_TILE = 8  # games per kernel instance


# ----------------------------------------------------------------------
# bundle packing: quantize_int8 output -> kernel-format pytree
# ----------------------------------------------------------------------
def pack_tower_bundle(cfg: NetConfig, q: Dict[str, Any]) -> Dict[str, Any]:
    """Re-layout an :func:`ops.int8_net.quantize_int8` bundle for the kernel.

    Requires the bundle's default configuration: f32 skip track
    (``residual="f32"``) and no f32 tail blocks — the kernel implements
    exactly the arena-A/B-validated scheme.  Head weights pass through
    unchanged (heads run outside the kernel).
    """
    if "res8" in q or "resbf" in q:
        raise ValueError("int8 tower kernel implements the f32 skip track "
                         "only (quantize with residual='f32')")
    if any(blk.get("f32") for blk in q["blocks"]):
        raise ValueError("int8 tower kernel does not support "
                         "f32_last_blocks > 0")
    c = cfg.channels

    def mats9(w):  # [3, 3, K, C] -> [9, K, C]
        return w.reshape(9, w.shape[2], w.shape[3])

    stem = mats9(q["stem_w"])                       # [9, cin, C] int8
    pad_k = c - stem.shape[1]
    stem = jnp.pad(stem, ((0, 0), (0, pad_k), (0, 0)))
    blocks = q["blocks"]
    n = len(blocks)
    ones = jnp.ones((c,), jnp.float32)
    out = {
        "stem_w9": stem,
        "stem_scale": q["stem_scale"].reshape(1, c),
        "stem_b": q["stem_b"].reshape(1, c),
        # [L, 2, 9, C, C] int8
        "block_w9": jnp.stack([
            jnp.stack([mats9(b["w1"]), mats9(b["w2"])]) for b in blocks]),
        "block_scale": jnp.stack([
            jnp.stack([b["scale1"], b["scale2"]]) for b in blocks]
        ).reshape(n, 2, 1, c),
        "block_b": jnp.stack([
            jnp.stack([b["b1"], b["b2"]]) for b in blocks]
        ).reshape(n, 2, 1, c),
        # requant divisors: mid (inside block), and the NEXT block's input
        # scale applied at this block's output (last block: unused ones)
        "inv_mid": jnp.stack([b["inv_mid"] for b in blocks]
                             ).reshape(n, 1, c),
        "inv_next": jnp.stack(
            [blocks[i + 1]["inv_in"] if i + 1 < n else ones
             for i in range(n)]).reshape(n, 1, c),
        "inv_first": blocks[0]["inv_in"].reshape(1, c),
        "inv_obs": q["inv_obs"],
    }
    for k in ("pol_w", "pol_b", "pol_fc_w", "pol_fc_b", "val_w", "val_b",
              "val_fc1_w", "val_fc1_b", "val_fc2_w", "val_fc2_b"):
        out[k] = q[k]
    return out


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------
def _tower_kernel(size: int, tile: int, n_blocks: int, channels: int,
                  obs_ref, stem_w, stem_scale, stem_b,
                  block_w, block_scale, block_b, inv_mid, inv_next,
                  inv_first, tower_ref, act_q, mid_q, skip):
    p = size + 2                # padded row length
    qrows = size * p            # flat work rows (incl. 2 garbage cols/row)
    # padded buffer rows: the (dy=2, dx=2) slice reads up to 2p+2+qrows =
    # p*p + 2; the 2 overhang rows are permanent zeros only ever read by
    # garbage-masked outputs
    band = (p + 1, p + 1 + qrows)   # re-embedding window in the padded buf
    g = tile
    rows = g * qrows
    c = channels
    f32 = jnp.float32

    # zero the padded buffers once; borders stay zero thereafter (band
    # writes below always cover [band) fully and mask the garbage cells)
    @pl.when(pl.program_id(0) == 0)
    def _():
        act_q[:] = jnp.zeros_like(act_q)
        mid_q[:] = jnp.zeros_like(mid_q)

    # garbage-column mask in the flat-q layout: x = q mod p >= size
    qi = jax.lax.broadcasted_iota(jnp.int32, (qrows, 1), 0)
    valid = (qi % p) < size     # [Q, 1] bool

    def conv9(src_ref, w_at):
        """3x3 conv: nine contiguous-slice int8 matmuls, int32 accum."""
        acc = jnp.zeros((rows, c), jnp.int32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            base = dy * p + dx
            x_k = src_ref[:, base:base + qrows, :].reshape(rows, c)
            acc = acc + jnp.dot(x_k, w_at(k),
                                preferred_element_type=jnp.int32)
        return acc

    def requant_band(dst_ref, h, inv):
        """f32 -> int8 at per-channel scale, garbage zeroed, band write."""
        hq = jnp.clip(jnp.round(h * inv), -QMAX, QMAX).astype(jnp.int8)
        hq3 = hq.reshape(g, qrows, c)
        hq3 = jnp.where(valid[None, :, :], hq3, jnp.int8(0))
        dst_ref[:, band[0]:band[1], :] = hq3

    # stem: obs (already int8, q-layout, K-padded lanes) -> C channels
    act_q[:, band[0]:band[1], :] = obs_ref[:]
    h = jnp.maximum(
        conv9(act_q, lambda k: stem_w[k]).astype(f32)
        * stem_scale[:] + stem_b[:], 0.0)
    skip[:] = h.reshape(g, qrows, c)
    requant_band(act_q, h, inv_first[:])

    for i in range(n_blocks):
        m = jnp.maximum(
            conv9(act_q, lambda k: block_w[i, 0, k]).astype(f32)
            * block_scale[i, 0] + block_b[i, 0], 0.0)
        requant_band(mid_q, m, inv_mid[i])
        y = (conv9(mid_q, lambda k: block_w[i, 1, k]).astype(f32)
             * block_scale[i, 1] + block_b[i, 1])
        h = jnp.maximum(y + skip[:].reshape(rows, c), 0.0)
        if i + 1 < n_blocks:
            skip[:] = h.reshape(g, qrows, c)
            requant_band(act_q, h, inv_next[i])
        else:
            tower_ref[:] = h.reshape(g, qrows, c)


@functools.partial(jax.jit, static_argnums=(0, 2, 4))
def int8_tower_apply(cfg: NetConfig, packed, tile: int, obs,
                     interpret: bool = None) -> Tuple[jax.Array, jax.Array]:
    """Fused-tower int8 forward: obs [B, H, W, Cin] -> (logits, value).

    Bit-exact vs ``int8_apply`` (f32 skip track): the tower runs in one
    Pallas kernel; obs requant + q-layout staging and the f32 heads run
    in XLA around it.  ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU (CPU tests / multichip dryrun) and Mosaic on
    accelerators; the Mosaic lowering tests pass ``interpret=False``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, cin = obs.shape
    size = cfg.board_size
    assert h == size and w == size
    c = cfg.channels
    p = size + 2
    qrows = size * p
    orig_b = b
    if b % tile:
        pad = tile - (b % tile)
        obs = jnp.concatenate(
            [obs, jnp.zeros((pad, h, w, cin), obs.dtype)], axis=0)
        b = obs.shape[0]

    # obs -> int8 q-layout [B, Q, C]: requant, pad x to P columns (the two
    # garbage columns are genuinely zero here), pad channels to C lanes
    obs_q = _requant_inv(obs.astype(jnp.float32), packed["inv_obs"])
    obs_q = jnp.pad(obs_q, ((0, 0), (0, 0), (0, 2), (0, c - cin)))
    obs_q = obs_q.reshape(b, qrows, c)

    n_blocks = cfg.n_res_blocks
    kernel = functools.partial(_tower_kernel, size, tile, n_blocks, c)
    w_names = ["stem_w9", "stem_scale", "stem_b", "block_w9",
               "block_scale", "block_b", "inv_mid", "inv_next",
               "inv_first"]
    w_specs = [
        pl.BlockSpec(packed[k].shape,
                     (lambda nd: lambda i: (0,) * nd)(packed[k].ndim),
                     memory_space=pltpu.VMEM)
        for k in w_names
    ]
    tower = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, qrows, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, qrows, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qrows, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, p * p + 2, c), jnp.int8),   # act_q
            pltpu.VMEM((tile, p * p + 2, c), jnp.int8),   # mid_q
            pltpu.VMEM((tile, qrows, c), jnp.float32),    # f32 skip carry
        ],
    )(obs_q, *[packed[k] for k in w_names])

    # drop the garbage columns; heads in f32 XLA (identical to int8_apply)
    hw = size * size
    t = tower.reshape(b, size, p, c)[:, :, :size, :]
    rows = t.reshape(b * hw, c)
    f32 = jnp.float32
    pol = jax.nn.relu(jnp.dot(rows, packed["pol_w"].reshape(c, 2))
                      + packed["pol_b"])
    logits = (jnp.dot(pol.reshape(b, 2 * hw), packed["pol_fc_w"])
              + packed["pol_fc_b"])
    v = jax.nn.relu(jnp.dot(rows, packed["val_w"].reshape(c, 1))
                    + packed["val_b"])
    v = jax.nn.relu(jnp.dot(v.reshape(b, hw), packed["val_fc1_w"])
                    + packed["val_fc1_b"])
    v = jnp.dot(v, packed["val_fc2_w"]) + packed["val_fc2_b"]
    return logits[:orig_b].astype(f32), jnp.tanh(v)[:orig_b].astype(f32)


def make_int8_tower_eval_fn(cfg: NetConfig, tile: int = DEFAULT_TILE):
    """MCTS eval_fn backed by the fused int8 tower kernel.

    The bundle is the PACKED pytree (:func:`pack_tower_bundle` applied to
    :func:`ops.int8_net.quantize_int8` output); pack once per checkpoint.
    """

    def eval_fn(packed, obs):
        logits, value = int8_tower_apply(cfg, packed, tile, obs)
        return jax.nn.softmax(logits, axis=-1), value

    return eval_fn
