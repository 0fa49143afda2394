"""Fused inference kernel: BN folding + Pallas kernel vs XLA eval path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from alphazero_gomoku_tpu.models.resnet import NetConfig, apply, init_variables
from alphazero_gomoku_tpu.ops.fused_net import (
    fold_bn,
    folded_apply_reference,
    fused_predict,
)


def make_net(board=15, blocks=2, channels=64, seed=0):
    cfg = NetConfig(board_size=board, action_size=board * board,
                    n_res_blocks=blocks, channels=channels)
    v = init_variables(jax.random.PRNGKey(seed), cfg)
    # randomize batch stats away from init so folding is actually exercised
    k = jax.random.PRNGKey(seed + 1)

    def jitter(tree, scale):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(k, len(leaves))
        out = [
            l + scale * jax.random.normal(kk, l.shape) if l.ndim else l
            for l, kk in zip(leaves, keys)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    stats = jitter(v["batch_stats"], 0.05)
    stats = jax.tree_util.tree_map(jnp.abs, stats)  # keep var positive
    return cfg, v["params"], stats


def rand_obs(cfg, b=16, seed=3):
    rng = np.random.default_rng(seed)
    board = rng.integers(0, 3, (b, cfg.board_size, cfg.board_size))
    obs = np.stack([
        (board == 1), (board == 2), np.ones_like(board)
    ], axis=-1).astype(np.float32)
    return jnp.asarray(obs)


@pytest.mark.slow
def test_fold_bn_matches_eval_forward():
    cfg, params, stats = make_net()
    obs = rand_obs(cfg)
    (logits_ref, value_ref), _ = apply(cfg, params, stats, obs, train=False)
    folded = fold_bn(cfg, params, stats, dtype=jnp.float32)
    logits, value = folded_apply_reference(cfg, folded, obs)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(value), np.asarray(value_ref),
                               atol=2e-5)


def test_fused_kernel_matches_folded_reference_interpret():
    cfg, params, stats = make_net(board=15, blocks=2, channels=64)
    obs = rand_obs(cfg, b=16)
    folded = fold_bn(cfg, params, stats, dtype=jnp.bfloat16)
    want_logits, want_value = folded_apply_reference(cfg, folded, obs)
    with pltpu.force_tpu_interpret_mode():
        logits, value = fused_predict(cfg, folded, 8, obs)
    # same folded bf16 weights; kernel accumulates in f32 like the oracle
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_logits),
                               atol=0.1, rtol=0.02)
    np.testing.assert_allclose(np.asarray(value), np.asarray(want_value),
                               atol=0.02)


@pytest.mark.slow
def test_fused_kernel_bf16_close_to_f32_net():
    cfg, params, stats = make_net(board=9, blocks=1, channels=32)
    cfg = NetConfig(board_size=9, action_size=81, n_res_blocks=1, channels=32)
    obs = rand_obs(cfg, b=8)
    (logits_ref, value_ref), _ = apply(cfg, params, stats, obs, train=False)
    folded = fold_bn(cfg, params, stats, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        logits, value = fused_predict(cfg, folded, 8, obs)
    # bf16 weights vs f32: loose but meaningful agreement
    np.testing.assert_allclose(np.asarray(value), np.asarray(value_ref),
                               atol=0.05)
    # policy orderings mostly preserved
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(logits_ref), -1)).mean()
    assert agree >= 0.75


def test_fold_bn_xla_f32_matches_eval_forward():
    # with f32 storage the folded XLA path must match the exact eval apply
    cfg, params, stats = make_net()
    obs = rand_obs(cfg)
    from alphazero_gomoku_tpu.ops.fused_net import fold_bn_xla, folded_xla_apply
    (logits_ref, value_ref), _ = apply(cfg, params, stats, obs, train=False)
    folded = fold_bn_xla(cfg, params, stats, dtype=jnp.float32)
    logits, value = folded_xla_apply(cfg, folded, obs)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(value), np.asarray(value_ref),
                               atol=2e-5)


def test_folded_xla_bf16_close_to_f32_net():
    cfg, params, stats = make_net()
    obs = rand_obs(cfg, b=16)
    from alphazero_gomoku_tpu.ops.fused_net import (
        fold_bn_xla, folded_xla_apply, make_bf16_eval_fn,
    )
    (logits_ref, value_ref), _ = apply(cfg, params, stats, obs, train=False)
    folded = fold_bn_xla(cfg, params, stats)  # bf16 default
    logits, value = folded_xla_apply(cfg, folded, obs)
    np.testing.assert_allclose(np.asarray(value), np.asarray(value_ref),
                               atol=0.05)
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(logits_ref), -1)).mean()
    assert agree >= 0.75
    # eval_fn wrapper returns normalized probs and the value column
    probs, v = make_bf16_eval_fn(cfg)(folded, obs)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    assert probs.dtype == jnp.float32 and v.dtype == jnp.float32


@pytest.mark.slow
def test_trainer_accepts_bf16_inference(tmp_path):
    # one tiny end-to-end iteration through the bf16 search forward
    from alphazero_gomoku_tpu.selfplay import train_alphazero
    hist = train_alphazero(
        game_name="gomoku", board_size=7, num_iterations=1,
        games_per_iteration=2, n_simulations=8, buffer_size=512,
        batch_size=16, epochs_per_iter=1, eval_games=2,
        eval_mcts_simulations=8, n_res_blocks=1, channels=16,
        model_dir=str(tmp_path), inference="bf16", mesh=None,
        verbose=False,
    )
    assert len(hist) == 1 and hist[0]["moves"] > 0


def test_fused_predict_batch_divisibility():
    cfg, params, stats = make_net(board=9, blocks=1, channels=32)
    folded = fold_bn(cfg, params, stats)
    with pytest.raises(ValueError):
        fused_predict(cfg, folded, 8, jnp.zeros((12, 9, 9, 3)))
