"""Fused int8 tower kernel: bit-parity vs the XLA int8 path + lowering.

The kernel's contract (ops/int8_tower.py) is BIT-EXACT equality with
``int8_apply`` on the default f32 skip track: integer conv accumulation
is exact and the f32 epilogues perform the same elementary ops in the
same order, so any deviation is a kernel bug, not tolerance noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.ops.int8_net import (
    int8_apply,
    quantize_int8,
    random_calib_obs,
)
from alphazero_gomoku_tpu.ops.int8_tower import (
    int8_tower_apply,
    make_int8_tower_eval_fn,
    pack_tower_bundle,
)


def _setup(size=9, blocks=2, channels=64, n_obs=24, cin=3, seed=0):
    model = AZModel(board_size=size, n_res_blocks=blocks, channels=channels,
                    seed=seed)
    calib = random_calib_obs(model.cfg, n=32, cin=cin, seed=1)
    q = quantize_int8(model.cfg, model.params, model.batch_stats, calib)
    obs = jnp.asarray(random_calib_obs(model.cfg, n=n_obs, cin=cin, seed=2))
    return model.cfg, q, obs


def test_tower_matches_int8_apply_bitexact():
    cfg, q, obs = _setup()
    logits_ref, value_ref = jax.jit(
        lambda q, o: int8_apply(cfg, q, o))(q, obs)
    packed = pack_tower_bundle(cfg, q)
    with pltpu.force_tpu_interpret_mode():
        logits_k, value_k = int8_tower_apply(cfg, packed, 8, obs)
    np.testing.assert_array_equal(np.asarray(logits_ref),
                                  np.asarray(logits_k))
    # the value head's tiny dots ([B,HW]x[HW,64]) fuse differently across
    # the two programs — one-ulp f32 reduction-order noise, not kernel error
    np.testing.assert_allclose(np.asarray(value_ref), np.asarray(value_k),
                               atol=1e-6)


def test_tower_partial_tile_and_eval_fn():
    """Batch not a multiple of the tile pads up and slices back; the
    eval_fn wrapper returns normalized probabilities."""
    cfg, q, obs = _setup(n_obs=11)
    packed = pack_tower_bundle(cfg, q)
    eval_fn = make_int8_tower_eval_fn(cfg, tile=8)
    with pltpu.force_tpu_interpret_mode():
        probs, value = eval_fn(packed, obs)
    probs = np.asarray(probs)
    assert probs.shape == (11, cfg.board_size ** 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    logits_ref, value_ref = jax.jit(
        lambda q, o: int8_apply(cfg, q, o))(q, obs)
    np.testing.assert_allclose(np.asarray(value_ref), np.asarray(value),
                               atol=1e-6)


def test_tower_rejects_unsupported_bundles():
    cfg, _, _ = _setup(n_obs=8)
    model = AZModel(board_size=cfg.board_size,
                    n_res_blocks=cfg.n_res_blocks, channels=cfg.channels,
                    seed=0)
    calib = random_calib_obs(model.cfg, n=16, seed=1)
    q8 = quantize_int8(model.cfg, model.params, model.batch_stats, calib,
                       residual="int8")
    with pytest.raises(ValueError, match="f32 skip"):
        pack_tower_bundle(cfg, q8)
    qtail = quantize_int8(model.cfg, model.params, model.batch_stats,
                          calib, f32_last_blocks=1)
    with pytest.raises(ValueError, match="f32_last_blocks"):
        pack_tower_bundle(cfg, qtail)


def test_tower_mosaic_lowering():
    """Full TPU lowering (incl. Mosaic MLIR emission) on CPU — guards the
    kernel against interpret-passes-but-Mosaic-fails regressions
    (tests/test_mosaic_lowering.py pattern)."""
    cfg, q, obs = _setup(n_obs=8)
    packed = pack_tower_bundle(cfg, q)
    jax.export.export(
        jax.jit(lambda p, o: int8_tower_apply(cfg, p, 8, o,
                                              interpret=False)),
        platforms=["tpu"],
    )(packed, obs)


def test_tower_mosaic_lowering_production_shape():
    """6x128 on 15x15 at tile 8 — the production config — must lower."""
    model = AZModel(board_size=15, n_res_blocks=6, channels=128, seed=3)
    calib = random_calib_obs(model.cfg, n=16, seed=1)
    q = quantize_int8(model.cfg, model.params, model.batch_stats, calib)
    packed = pack_tower_bundle(model.cfg, q)
    obs = jnp.asarray(random_calib_obs(model.cfg, n=16, seed=2))
    jax.export.export(
        jax.jit(lambda p, o: int8_tower_apply(model.cfg, p, 8, o,
                                              interpret=False)),
        platforms=["tpu"],
    )(packed, obs)
