"""AlphaZero residual policy/value network as an explicit parameter pytree.

Architecture parity with the reference (``/root/reference/network.py:29-117``):
3x3 conv stem -> BN/ReLU -> N residual blocks (conv-BN-ReLU-conv-BN + skip,
ReLU) -> policy head (1x1 conv to 2ch, BN, ReLU, FC to action logits) and
value head (1x1 conv to 1ch, BN, ReLU, FC->64, ReLU, FC->1, tanh).

TPU-native choices:
  - NHWC activations / HWIO weights (XLA's native conv layout on TPU; the
    reference is NCHW torch).
  - optional bfloat16 compute with float32 parameters and statistics.
  - BatchNorm implemented explicitly so train/eval semantics match torch
    ``BatchNorm2d`` bit-for-bit: eps 1e-5; training normalizes with biased
    batch variance and updates running stats with momentum 0.1 using the
    *unbiased* variance; eval normalizes with running stats.
  - initialization matches the reference's ``_init_weights``
    (``network.py:75-83``): Kaiming-normal convs (gain sqrt(2), fan_in),
    Kaiming-uniform linears (bound sqrt(6/fan_in)), zero biases.

Both the trainer default config (3 blocks / 64 channels, ``network.py:146-147``)
and the documented full config (6 blocks / 128 channels, ``network.py:45-46``)
are supported via :class:`NetConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


@dataclasses.dataclass(frozen=True)
class NetConfig:
    board_size: int = 15
    action_size: int = 15 * 15
    in_channels: int = 3
    n_res_blocks: int = 3
    channels: int = 64
    value_hidden: int = 64
    compute_dtype: Any = jnp.float32

    @staticmethod
    def small(board_size: int = 15) -> "NetConfig":
        return NetConfig(board_size=board_size, action_size=board_size ** 2)

    @staticmethod
    def full(board_size: int = 15, **kw) -> "NetConfig":
        return NetConfig(
            board_size=board_size,
            action_size=board_size ** 2,
            n_res_blocks=6,
            channels=128,
            **kw,
        )


# ----------------------------------------------------------------------
# init
# ----------------------------------------------------------------------
def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _linear_init(key, cin, cout):
    bound = (6.0 / cin) ** 0.5
    w = jax.random.uniform(key, (cin, cout), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _bn_init(ch):
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32)}


def _bn_stats_init(ch):
    return {"mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def init_variables(key, cfg: NetConfig) -> Dict[str, Params]:
    """Returns {'params': ..., 'batch_stats': ...} pytrees."""
    n = cfg.n_res_blocks
    keys = jax.random.split(key, 2 * n + 6)
    c = cfg.channels
    hw = cfg.board_size * cfg.board_size

    params: Params = {
        "stem": {"w": _conv_init(keys[0], 3, 3, cfg.in_channels, c)},
        "stem_bn": _bn_init(c),
        "blocks": [
            {
                "conv1": {"w": _conv_init(keys[1 + 2 * i], 3, 3, c, c)},
                "bn1": _bn_init(c),
                "conv2": {"w": _conv_init(keys[2 + 2 * i], 3, 3, c, c)},
                "bn2": _bn_init(c),
            }
            for i in range(n)
        ],
        "policy_conv": {"w": _conv_init(keys[2 * n + 1], 1, 1, c, 2)},
        "policy_bn": _bn_init(2),
        "policy_fc": _linear_init(keys[2 * n + 2], 2 * hw, cfg.action_size),
        "value_conv": {"w": _conv_init(keys[2 * n + 3], 1, 1, c, 1)},
        "value_bn": _bn_init(1),
        "value_fc1": _linear_init(keys[2 * n + 4], hw, cfg.value_hidden),
        "value_fc2": _linear_init(keys[2 * n + 5], cfg.value_hidden, 1),
    }
    batch_stats: Params = {
        "stem_bn": _bn_stats_init(c),
        "blocks": [
            {"bn1": _bn_stats_init(c), "bn2": _bn_stats_init(c)}
            for i in range(n)
        ],
        "policy_bn": _bn_stats_init(2),
        "value_bn": _bn_stats_init(1),
    }
    return {"params": params, "batch_stats": batch_stats}


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
def _conv(x, w, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _batch_norm(x, p, stats, train: bool):
    """torch BatchNorm2d semantics over NHWC (normalize per channel)."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))  # biased, for normalization
        nelem = x32.shape[0] * x32.shape[1] * x32.shape[2]
        unbiased = var * (nelem / max(nelem - 1, 1))
        new_stats = {
            "mean": (1 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x32 - mean) * inv * p["scale"] + p["bias"]
    return y, new_stats


def apply(
    cfg: NetConfig,
    params: Params,
    batch_stats: Params,
    x: jax.Array,
    train: bool = False,
) -> Tuple[Tuple[jax.Array, jax.Array], Params]:
    """Forward pass.

    Args:
        x: float [B, H, W, C] NHWC observations.
        train: batch-stat mode (True) vs running-stat mode (False).

    Returns:
        ((policy_logits [B, A], value [B, 1]), new_batch_stats)
    """
    dt = cfg.compute_dtype
    ns: Params = {"blocks": [dict() for _ in params["blocks"]]}

    h = _conv(x, params["stem"]["w"], dt)
    h, ns["stem_bn"] = _batch_norm(h, params["stem_bn"],
                                   batch_stats["stem_bn"], train)
    h = jax.nn.relu(h)

    for i, blk in enumerate(params["blocks"]):
        bs = batch_stats["blocks"][i]
        r = h
        h = _conv(h, blk["conv1"]["w"], dt)
        h, ns["blocks"][i]["bn1"] = _batch_norm(h, blk["bn1"], bs["bn1"], train)
        h = jax.nn.relu(h)
        h = _conv(h, blk["conv2"]["w"], dt)
        h, ns["blocks"][i]["bn2"] = _batch_norm(h, blk["bn2"], bs["bn2"], train)
        h = jax.nn.relu(h + r)

    # policy head
    p = _conv(h, params["policy_conv"]["w"], dt)
    p, ns["policy_bn"] = _batch_norm(p, params["policy_bn"],
                                     batch_stats["policy_bn"], train)
    p = jax.nn.relu(p)
    p = p.reshape(p.shape[0], -1)  # NHWC flatten: (H*W*2,)
    logits = (
        jnp.dot(p.astype(dt), params["policy_fc"]["w"].astype(dt),
                preferred_element_type=jnp.float32)
        + params["policy_fc"]["b"]
    )

    # value head
    v = _conv(h, params["value_conv"]["w"], dt)
    v, ns["value_bn"] = _batch_norm(v, params["value_bn"],
                                    batch_stats["value_bn"], train)
    v = jax.nn.relu(v)
    v = v.reshape(v.shape[0], -1)
    v = jax.nn.relu(
        jnp.dot(v.astype(dt), params["value_fc1"]["w"].astype(dt),
                preferred_element_type=jnp.float32)
        + params["value_fc1"]["b"]
    )
    v = (
        jnp.dot(v.astype(dt), params["value_fc2"]["w"].astype(dt),
                preferred_element_type=jnp.float32)
        + params["value_fc2"]["b"]
    )
    value = jnp.tanh(v)

    return (logits, value), ns
