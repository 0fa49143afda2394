"""Fused whole-network inference kernel (Pallas, TPU).

Evaluation-mode inference is ~all of AlphaZero's FLOPs (hundreds of leaf
evaluations per move vs one training step per 128 samples), so the entire
policy/value ResNet is fused into ONE Pallas kernel:

  - BatchNorm is folded into each conv (eval mode: per-channel scale into
    the conv weights, shift into a bias), done once per parameter update by
    :func:`fold_bn`.
  - The kernel keeps a tile of G games' activations resident in VMEM as a
    zero-padded ``[G, H+2, W+2, C]`` buffer; a 3x3 SAME conv is nine static
    slices of that buffer matmul'd against ``[C, C]`` weight planes on the
    MXU (M = G*H*W rows), accumulating in float32 with bfloat16 inputs.
  - Residual blocks ping-pong between two scratch buffers whose borders
    stay zero, so spatial padding costs nothing after the initial memset.
  - The policy/value heads (1x1 convs + FCs + tanh, <1% of FLOPs) run as
    plain XLA ops on the kernel's tower output: their 2-/1-channel tensors
    need tiny-lane reshapes (e.g. [G*225, 2] -> [G, 450]) that reproducibly
    crash the Mosaic compiler.

Weights for the full 6x128 net are ~3.6 MB in bf16 and live in VMEM for the
whole kernel, giving zero HBM traffic between layers (the XLA path writes
each layer's [B, 225, C] activations back to HBM at larger batches).

Architecture parity: reference ``network.py:29-117`` (same layer graph);
numerics match the eval-mode XLA path to bf16 tolerance (tested in
``tests/test_fused_net.py``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_gomoku_tpu.models.resnet import BN_EPS, NetConfig

DEFAULT_TILE = 8  # games per kernel instance


# ----------------------------------------------------------------------
# BN folding (host/jit side, once per parameter update)
# ----------------------------------------------------------------------
def _fold(conv_w, bn_p, bn_s):
    """conv+BN(eval) -> conv' + bias: W' = W * s_out, b = bias - mean * s."""
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    w = conv_w * s[None, None, None, :]
    b = bn_p["bias"] - bn_s["mean"] * s
    return w, b


def fold_bn(cfg: NetConfig, params, batch_stats,
            dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Fold eval-mode BN into conv weights; stack for the fused kernel.

    Returns a pytree of arrays shaped for ``fused_predict``:
      stem_w [9, Cin, C], stem_b [C]
      block_w [L, 2, 9, C, C], block_b [L, 2, C]
      pol_w [C, 2] pol_b [2]  pol_fc_w [2HW, A] pol_fc_b [A]
      val_w [C, 1] val_b [1]  val_fc1_w [HW, 64] ... val_fc2_w [64, 1] ...
    """
    def conv_to_mats(w):  # [3, 3, Cin, Cout] -> [9, Cin, Cout]
        return w.reshape(9, w.shape[2], w.shape[3])

    stem_w, stem_b = _fold(params["stem"]["w"], params["stem_bn"],
                           batch_stats["stem_bn"])
    bw, bb = [], []
    for blk, bs in zip(params["blocks"], batch_stats["blocks"]):
        w1, b1 = _fold(blk["conv1"]["w"], blk["bn1"], bs["bn1"])
        w2, b2 = _fold(blk["conv2"]["w"], blk["bn2"], bs["bn2"])
        bw.append(jnp.stack([conv_to_mats(w1), conv_to_mats(w2)]))
        bb.append(jnp.stack([b1, b2]))
    pol_w, pol_b = _fold(params["policy_conv"]["w"], params["policy_bn"],
                         batch_stats["policy_bn"])
    val_w, val_b = _fold(params["value_conv"]["w"], params["value_bn"],
                         batch_stats["value_bn"])

    # Pad the stem's K-dim (in-channels) to the tower width: the kernel
    # stages observations into the first cin lanes of a C-lane buffer and
    # matmuls the FULL lane width (tiny-lane reshapes crash Mosaic); the
    # extra K rows are zero so the result is exact.
    stem_mats = conv_to_mats(stem_w)
    pad_k = cfg.channels - stem_mats.shape[1]
    stem_mats = jnp.pad(stem_mats, ((0, 0), (0, pad_k), (0, 0)))

    f32 = jnp.float32
    return {
        "stem_w": stem_mats.astype(dtype),
        "stem_b": stem_b.astype(f32),
        "block_w": jnp.stack(bw).astype(dtype),
        "block_b": jnp.stack(bb).astype(f32),
        "pol_w": pol_w.reshape(pol_w.shape[2], 2).astype(dtype),
        "pol_b": pol_b.astype(f32),
        "pol_fc_w": params["policy_fc"]["w"].astype(dtype),
        "pol_fc_b": params["policy_fc"]["b"].astype(f32),
        "val_w": val_w.reshape(val_w.shape[2], 1).astype(dtype),
        "val_b": val_b.astype(f32),
        "val_fc1_w": params["value_fc1"]["w"].astype(dtype),
        "val_fc1_b": params["value_fc1"]["b"].astype(f32),
        "val_fc2_w": params["value_fc2"]["w"].astype(dtype),
        "val_fc2_b": params["value_fc2"]["b"].astype(f32),
    }


# ----------------------------------------------------------------------
# folded-BN bf16 XLA forward (the production inference path)
# ----------------------------------------------------------------------
def fold_bn_xla(cfg: NetConfig, params, batch_stats,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Fold eval-mode BN into conv weights, keeping HWIO layout for XLA.

    Unlike :func:`fold_bn` (which reshapes/pads weights for the Pallas
    kernel), this produces plain ``lax.conv``-ready weights for
    :func:`folded_xla_apply`.  Biases and head FC weights stay float32;
    conv/FC matmul inputs are stored in ``dtype`` (bfloat16 by default).
    """
    f32 = jnp.float32
    stem_w, stem_b = _fold(params["stem"]["w"], params["stem_bn"],
                           batch_stats["stem_bn"])
    blocks = []
    for blk, bs in zip(params["blocks"], batch_stats["blocks"]):
        w1, b1 = _fold(blk["conv1"]["w"], blk["bn1"], bs["bn1"])
        w2, b2 = _fold(blk["conv2"]["w"], blk["bn2"], bs["bn2"])
        blocks.append({"w1": w1.astype(dtype), "b1": b1.astype(f32),
                       "w2": w2.astype(dtype), "b2": b2.astype(f32)})
    pol_w, pol_b = _fold(params["policy_conv"]["w"], params["policy_bn"],
                         batch_stats["policy_bn"])
    val_w, val_b = _fold(params["value_conv"]["w"], params["value_bn"],
                         batch_stats["value_bn"])
    return {
        "stem_w": stem_w.astype(dtype), "stem_b": stem_b.astype(f32),
        "blocks": blocks,
        "pol_w": pol_w.astype(f32), "pol_b": pol_b.astype(f32),
        "pol_fc_w": params["policy_fc"]["w"].astype(f32),
        "pol_fc_b": params["policy_fc"]["b"].astype(f32),
        "val_w": val_w.astype(f32), "val_b": val_b.astype(f32),
        "val_fc1_w": params["value_fc1"]["w"].astype(f32),
        "val_fc1_b": params["value_fc1"]["b"].astype(f32),
        "val_fc2_w": params["value_fc2"]["w"].astype(f32),
        "val_fc2_b": params["value_fc2"]["b"].astype(f32),
    }


def folded_xla_apply(cfg: NetConfig, folded, obs) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode forward with BN folded away and bfloat16 activations.

    The training-path forward (``models/resnet.py:apply``) keeps every
    inter-layer activation in float32 (BatchNorm math) so even with a bf16
    ``compute_dtype`` the HBM traffic — which bounds the network at these
    shapes (DECISIONS.md round-2 notes) — never shrinks.  Here each layer is
    ``conv(bf16) + bias + relu`` with bf16 tensors between layers: half the
    bandwidth and no BN elementwise passes.  MXU accumulation stays f32; the
    heads (<1% of FLOPs) and final softmax/tanh run in f32.

    Inference-only by construction (BN is folded at its running statistics;
    use the exact ``apply`` for training).  Reference analogue: eval-mode
    ``predict`` (``/root/reference/network.py:168-183``).
    """
    bf = folded["stem_w"].dtype  # the storage dtype chosen at fold time
    f32 = jnp.float32

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=f32,
        )

    h = jax.nn.relu(conv(obs.astype(bf), folded["stem_w"])
                    + folded["stem_b"]).astype(bf)
    for blk in folded["blocks"]:
        r = h
        h = jax.nn.relu(conv(h, blk["w1"]) + blk["b1"]).astype(bf)
        h = (conv(h, blk["w2"]) + blk["b2"]).astype(bf)
        h = jax.nn.relu((h + r).astype(f32)).astype(bf)

    b = h.shape[0]
    hw = cfg.board_size * cfg.board_size
    rows = h.astype(f32).reshape(b * hw, cfg.channels)
    p = jax.nn.relu(jnp.dot(rows, folded["pol_w"].reshape(cfg.channels, 2))
                    + folded["pol_b"])
    logits = jnp.dot(p.reshape(b, 2 * hw), folded["pol_fc_w"]) + folded["pol_fc_b"]
    v = jax.nn.relu(jnp.dot(rows, folded["val_w"].reshape(cfg.channels, 1))
                    + folded["val_b"])
    v = jax.nn.relu(jnp.dot(v.reshape(b, hw), folded["val_fc1_w"])
                    + folded["val_fc1_b"])
    v = jnp.dot(v, folded["val_fc2_w"]) + folded["val_fc2_b"]
    return logits, jnp.tanh(v)


def make_bf16_eval_fn(cfg: NetConfig):
    """MCTS eval_fn backed by the folded-BN bf16 XLA forward.

    The bundle is the folded pytree from :func:`fold_bn_xla`; fold once per
    parameter update, not per call.
    """

    def eval_fn(folded, obs):
        logits, value = folded_xla_apply(cfg, folded, obs)
        return jax.nn.softmax(logits, axis=-1), value

    return eval_fn


# ----------------------------------------------------------------------
# reference (plain jnp) folded forward — oracle for the kernel
# ----------------------------------------------------------------------
def folded_apply_reference(cfg: NetConfig, folded, obs) -> Tuple[jax.Array, jax.Array]:
    """Eval forward using folded weights with plain XLA ops (f32 math on
    bf16-rounded weights); used to validate the Pallas kernel."""
    h, w = cfg.board_size, cfg.board_size

    def conv3(x, mats, bias):
        b = x.shape[0]
        pad = jnp.zeros((b, h + 2, w + 2, x.shape[-1]), jnp.float32)
        pad = pad.at[:, 1:h + 1, 1:w + 1, :].set(x)
        out = None
        for k in range(9):
            dr, dc = divmod(k, 3)
            piece = pad[:, dr:dr + h, dc:dc + w, :].reshape(b * h * w, -1)
            term = jnp.dot(piece, mats[k].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            out = term if out is None else out + term
        return (out + bias).reshape(b, h, w, -1)

    # stem weights are K-padded to the tower width (see fold_bn); widen the
    # observation with zero channels to match
    obs_wide = jnp.pad(
        obs.astype(jnp.float32),
        ((0, 0), (0, 0), (0, 0), (0, cfg.channels - obs.shape[-1])),
    )
    x = jax.nn.relu(conv3(obs_wide, folded["stem_w"], folded["stem_b"]))
    for i in range(cfg.n_res_blocks):
        r = x
        x = jax.nn.relu(conv3(x, folded["block_w"][i, 0],
                              folded["block_b"][i, 0]))
        x = conv3(x, folded["block_w"][i, 1], folded["block_b"][i, 1])
        x = jax.nn.relu(x + r)

    b = x.shape[0]
    flat = x.reshape(b * h * w, -1)
    p = jax.nn.relu(
        jnp.dot(flat, folded["pol_w"].astype(jnp.float32)) + folded["pol_b"]
    ).reshape(b, -1)
    logits = jnp.dot(p, folded["pol_fc_w"].astype(jnp.float32)) + folded["pol_fc_b"]
    v = jax.nn.relu(
        jnp.dot(flat, folded["val_w"].astype(jnp.float32)) + folded["val_b"]
    ).reshape(b, -1)
    v = jax.nn.relu(jnp.dot(v, folded["val_fc1_w"].astype(jnp.float32))
                    + folded["val_fc1_b"])
    v = jnp.dot(v, folded["val_fc2_w"].astype(jnp.float32)) + folded["val_fc2_b"]
    return logits, jnp.tanh(v)


# ----------------------------------------------------------------------
# the fused kernel
# ----------------------------------------------------------------------
def _fused_kernel(cfg: NetConfig, tile: int,
                  obs_ref, stem_w, stem_b, block_w, block_b,
                  tower_ref, act_a, act_b):
    h = w = cfg.board_size
    g = tile
    rows = g * h * w
    bf16 = jnp.bfloat16
    f32 = jnp.float32

    def conv3_from(src_ref, mats_at, bias):
        """3x3 SAME conv over the padded VMEM buffer: 9 slice-matmuls."""
        acc = jnp.zeros((rows, mats_at(0).shape[-1]), f32)
        for k in range(9):
            dr, dc = divmod(k, 3)
            piece = src_ref[:, dr:dr + h, dc:dc + w, :].astype(bf16)
            acc = acc + jnp.dot(
                piece.reshape(rows, piece.shape[-1]), mats_at(k),
                preferred_element_type=f32,
            )
        return acc + bias

    # zero both padded buffers once; borders stay zero thereafter
    act_a[:] = jnp.zeros_like(act_a)
    act_b[:] = jnp.zeros_like(act_b)

    # stem: obs -> C channels. The observation is staged into the first
    # ``cin`` channel lanes of the C-lane padded buffer (direct ref write);
    # the conv then matmuls the FULL lane width against K-padded stem
    # weights — channel sub-slices / tiny-lane reshapes crash Mosaic.
    cin = obs_ref.shape[-1]
    act_a[:, 1:h + 1, 1:w + 1, 0:cin] = obs_ref[:].astype(f32)
    x = jax.nn.relu(conv3_from(act_a, lambda k: stem_w[k], stem_b[:]))
    act_a[:, 1:h + 1, 1:w + 1, :] = x.reshape(g, h, w, -1)

    # residual tower (python-unrolled; L is small and static)
    for i in range(cfg.n_res_blocks):
        y = jax.nn.relu(conv3_from(act_a, lambda k: block_w[i, 0, k],
                                   block_b[i, 0]))
        act_b[:, 1:h + 1, 1:w + 1, :] = y.reshape(g, h, w, -1)
        z = conv3_from(act_b, lambda k: block_w[i, 1, k], block_b[i, 1])
        res = act_a[:, 1:h + 1, 1:w + 1, :].reshape(rows, -1)
        x = jax.nn.relu(z + res)
        act_a[:, 1:h + 1, 1:w + 1, :] = x.reshape(g, h, w, -1)

    # NOTE: the policy/value heads run OUTSIDE the kernel (plain XLA): they
    # are <1% of the FLOPs, and their 2-/1-channel tensors need tiny-lane
    # reshapes that crash the Mosaic compiler (reshape [G*225, 2] ->
    # [G, 450] reproducibly 500s; see ROADMAP.md).
    tower_ref[:] = act_a[:, 1:h + 1, 1:w + 1, :]


@functools.partial(jax.jit, static_argnums=(0, 2))
def fused_predict(cfg: NetConfig, folded, tile: int, obs):
    """Fused eval forward: obs [B, H, W, Cin] -> (logits [B, A], value [B, 1]).

    Batches that are not a multiple of ``tile`` are zero-padded up and the
    outputs sliced back (padding cost is one partial tile).
    """
    b, h, w, cin = obs.shape
    orig_b = b
    if b % tile:
        pad = tile - (b % tile)
        obs = jnp.concatenate(
            [obs, jnp.zeros((pad, h, w, cin), obs.dtype)], axis=0
        )
        b = obs.shape[0]
    c = cfg.channels
    grid = (b // tile,)

    def full(ix=None):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    weight_names = ["stem_w", "stem_b", "block_w", "block_b"]
    n_dims = {k: folded[k].ndim for k in weight_names}
    weight_specs = [
        pl.BlockSpec(folded[k].shape, (lambda nd: lambda i: (0,) * nd)(n_dims[k]),
                     memory_space=pltpu.VMEM)
        for k in weight_names
    ]

    kernel = functools.partial(_fused_kernel, cfg, tile)
    tower = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((tile, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, h + 2, w + 2, c), jnp.float32),
            pltpu.VMEM((tile, h + 2, w + 2, c), jnp.float32),
        ],
    )(obs.astype(jnp.float32), *[folded[k] for k in weight_names])

    # heads in XLA (tiny)
    rows = tower.reshape(b * h * w, c)
    f32 = jnp.float32
    pq = jax.nn.relu(jnp.dot(rows, folded["pol_w"].astype(f32)) + folded["pol_b"])
    logits = (jnp.dot(pq.reshape(b, h * w * 2), folded["pol_fc_w"].astype(f32))
              + folded["pol_fc_b"])
    vq = jax.nn.relu(jnp.dot(rows, folded["val_w"].astype(f32)) + folded["val_b"])
    v = jax.nn.relu(jnp.dot(vq.reshape(b, h * w), folded["val_fc1_w"].astype(f32))
                    + folded["val_fc1_b"])
    v = jnp.dot(v, folded["val_fc2_w"].astype(f32)) + folded["val_fc2_b"]
    value = jnp.tanh(v)
    return logits[:orig_b], value[:orig_b]


def make_fused_eval_fn(cfg: NetConfig, tile: int = DEFAULT_TILE):
    """MCTS eval_fn backed by the fused kernel.

    The bundle is the FOLDED parameter pytree (see :func:`fold_bn`); fold
    once per parameter update, not per call.
    """

    def eval_fn(folded, obs):
        logits, value = fused_predict(cfg, folded, tile, obs)
        return jax.nn.softmax(logits, axis=-1), value

    return eval_fn
