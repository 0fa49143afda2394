"""int8 inference path: quantization mechanics + accuracy vs the f32 net.

Accuracy is judged on the SHIPPED checkpoint (real weight distributions,
decisive policies) — random-init nets are near-uniform and would let a
broken quantizer pass.  Spec for acceptable drift: the int8 policy must
pick the same move as f32 on ~all positions and the value head must agree
to a few centipawns; the strength-level check is `tools/int8_ab.py`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.models.model import AZModel
from alphazero_gomoku_tpu.models.resnet import (NetConfig, apply,
                                                 init_variables)
from alphazero_gomoku_tpu.ops.int8_net import (
    int8_apply, make_int8_eval_fn, quantize_int8, random_calib_obs,
    random_play_calib_obs)

CKPT = "checkpoints/best_gomoku.ckpt"


def _random_obs(cfg, n, seed=0):
    return jnp.asarray(random_calib_obs(cfg, n=n, cin=3, seed=seed))


def _small_cfg(size=9, blocks=2, ch=32):
    return NetConfig(board_size=size, action_size=size * size,
                     n_res_blocks=blocks, channels=ch)


def _init(cfg, seed):
    v = init_variables(jax.random.PRNGKey(seed), cfg)
    return v["params"], v["batch_stats"]


def test_quantize_bundle_structure():
    cfg = _small_cfg()
    params, stats = _init(cfg, 0)
    q = quantize_int8(cfg, params, stats, _random_obs(cfg, 16))
    assert q["stem_w"].dtype == jnp.int8
    assert len(q["blocks"]) == 2
    for blk in q["blocks"]:
        assert blk["w1"].dtype == jnp.int8 and blk["w2"].dtype == jnp.int8
        # per-output-channel dequant scales
        assert blk["scale1"].shape == (32,)
        assert np.all(np.isfinite(np.asarray(blk["scale1"])))
        # per-channel requant divisors, all positive
        assert blk["s_in"].shape == (32,)
        assert float(jnp.min(blk["s_in"])) > 0.0
    # weights actually use the int8 range (not collapsed to zero)
    assert int(jnp.max(jnp.abs(q["blocks"][0]["w1"].astype(jnp.int32)))) > 100


def test_int8_matches_f32_on_random_net():
    """Sanity on a random small net: outputs correlate strongly with f32.

    Random-init logits are small and near-uniform, so this only catches
    gross breakage (wrong scales, missing bias, transposed weights); the
    checkpoint test below is the real accuracy gate.
    """
    cfg = _small_cfg()
    params, stats = _init(cfg, 1)
    obs = _random_obs(cfg, 32, seed=2)
    q = quantize_int8(cfg, params, stats, obs)
    ql, qv = int8_apply(cfg, q, obs)
    (fl, fv), _ = apply(cfg, params, stats, obs, train=False)
    ql, qv, fl, fv = map(np.asarray, (ql, qv, fl, fv))
    cc = np.corrcoef(ql.ravel(), fl.ravel())[0, 1]
    assert cc > 0.98, f"logit correlation {cc}"
    assert np.max(np.abs(qv - fv)) < 0.1


@pytest.mark.slow
@pytest.mark.parametrize("residual,min_top1,max_kl,max_vmae_over_f32", [
    # Observed on this checkpoint (per-channel scheme, real positions).
    # Absolute numbers are PLATFORM-DEPENDENT (device: top1 ~0.91, vmae
    # ~0.019; CPU, where this lane runs: f32 skip top1 0.865 / vmae
    # 0.0443, bf16 0.896 / 0.0442, int8 0.844 / 0.0453 — the conv
    # accumulate differs), so the value gate is RELATIVE to the f32
    # skip-track baseline computed in the same run: the skip-track
    # narrowing must not add more than the stated MAE on top of the
    # int8 conv path's own error.  Disagreements concentrate on
    # near-tie positions; strength neutrality is established by the
    # device arena A/B (tools/int8_ab.py), not by top-1 alone.
    ("bf16", 0.85, 0.06, 0.005),
    ("int8", 0.78, 0.10, 0.02),
])
def test_int8_accuracy_on_shipped_checkpoint(residual, min_top1, max_kl,
                                             max_vmae_over_f32):
    """Real-position accuracy gate (random-legal-move game states)."""
    model = AZModel.from_checkpoint(CKPT)
    cfg = model.cfg
    obs = jnp.asarray(random_play_calib_obs(cfg, n=96, seed=3))
    q = quantize_int8(cfg, model.params, model.batch_stats, obs,
                      residual=residual)
    qf = quantize_int8(cfg, model.params, model.batch_stats, obs,
                       residual="f32")
    # held-out positions, not the calibration set
    test_obs = jnp.asarray(random_play_calib_obs(cfg, n=96, seed=4))
    ql, qv = int8_apply(cfg, q, test_obs)
    _, fv32 = int8_apply(cfg, qf, test_obs)
    (fl, fv), _ = apply(cfg, model.params, model.batch_stats, test_obs,
                        train=False)
    qp = jax.nn.softmax(ql, axis=-1)
    fp = jax.nn.softmax(fl, axis=-1)
    top1 = float(jnp.mean((jnp.argmax(qp, -1) == jnp.argmax(fp, -1))))
    kl = float(jnp.mean(jnp.sum(
        fp * (jnp.log(fp + 1e-12) - jnp.log(qp + 1e-12)), axis=-1)))
    vmae = float(jnp.mean(jnp.abs(qv - fv)))
    vmae_f32 = float(jnp.mean(jnp.abs(fv32 - fv)))
    assert top1 >= min_top1, f"top-1 agreement {top1} ({residual} skip)"
    assert kl < max_kl, f"policy KL {kl} ({residual} skip)"
    assert vmae < vmae_f32 + max_vmae_over_f32, \
        f"value MAE {vmae} vs f32-skip baseline {vmae_f32} ({residual} skip)"
    # absolute backstop: the whole int8 path must stay within centipawns
    assert vmae < 0.08, f"value MAE {vmae} ({residual} skip)"


@pytest.mark.parametrize("residual", ["f32", "bf16", "int8"])
def test_residual_modes_run_and_agree(residual):
    """Every skip-track mode runs; bf16 tracks f32 tightly on a small net."""
    cfg = _small_cfg()
    params, stats = _init(cfg, 7)
    obs = _random_obs(cfg, 16, seed=8)
    q = quantize_int8(cfg, params, stats, obs, residual=residual)
    assert ("res8" in q) == (residual == "int8")
    assert ("resbf" in q) == (residual == "bf16")
    ql, qv = int8_apply(cfg, q, obs)
    qf = quantize_int8(cfg, params, stats, obs, residual="f32")
    fl, fv = int8_apply(cfg, qf, obs)
    cc = np.corrcoef(np.asarray(ql).ravel(), np.asarray(fl).ravel())[0, 1]
    # bf16 skip tracks f32 tightly at this scale (random-init logits are
    # tiny, so the correlation is noise-sensitive: observed 0.9989);
    # int8 skip may drift but stays strongly correlated
    assert cc > (0.995 if residual != "int8" else 0.97), f"{residual}: {cc}"


def test_residual_modes_with_f32_tail():
    """res8/bf16 carry hands back to f32 correctly at the f32-tail boundary.

    Compares logits against the residual="f32" bundle with the same
    f32_last_blocks — a wrong handoff (stale carry, missed dequant) would
    decorrelate the outputs, not just break shapes.
    """
    cfg = _small_cfg(blocks=3)
    params, stats = _init(cfg, 9)
    obs = _random_obs(cfg, 8, seed=10)
    qf = quantize_int8(cfg, params, stats, obs, residual="f32",
                       f32_last_blocks=1)
    fl, fv = int8_apply(cfg, qf, obs)
    for residual in ("bf16", "int8"):
        q = quantize_int8(cfg, params, stats, obs, residual=residual,
                          f32_last_blocks=1)
        ql, qv = int8_apply(cfg, q, obs)
        assert ql.shape == (8, 81) and np.all(np.isfinite(np.asarray(ql)))
        cc = np.corrcoef(np.asarray(ql).ravel(),
                         np.asarray(fl).ravel())[0, 1]
        assert cc > (0.999 if residual == "bf16" else 0.97), \
            f"{residual} + f32 tail decorrelated from f32 skip: {cc}"
        vmae = float(np.mean(np.abs(np.asarray(qv) - np.asarray(fv))))
        assert vmae < 0.1, f"{residual} + f32 tail value MAE {vmae}"


def test_int8_eval_fn_shapes():
    cfg = _small_cfg(blocks=1)
    params, stats = _init(cfg, 2)
    obs = _random_obs(cfg, 8)
    q = quantize_int8(cfg, params, stats, obs)
    probs, v = make_int8_eval_fn(cfg)(q, obs)
    assert probs.shape == (8, 81) and v.shape == (8, 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0,
                               rtol=1e-5)


def test_f32_last_blocks_bundle_and_forward():
    """Tail blocks stay f32 (no int8 weights) and the forward still runs."""
    cfg = _small_cfg()
    params, stats = _init(cfg, 3)
    obs = _random_obs(cfg, 8)
    q = quantize_int8(cfg, params, stats, obs, f32_last_blocks=1)
    assert q["blocks"][0]["w1"].dtype == jnp.int8
    assert q["blocks"][1].get("f32") and q["blocks"][1]["w1"].dtype == jnp.float32
    ql, qv = int8_apply(cfg, q, obs)
    assert ql.shape == (8, 81) and qv.shape == (8, 1)


def test_bias_correction_reduces_output_error():
    cfg = _small_cfg()
    params, stats = _init(cfg, 4)
    calib = _random_obs(cfg, 32, seed=5)
    test = _random_obs(cfg, 32, seed=6)
    (fl, _), _ = apply(cfg, params, stats, test, train=False)
    errs = {}
    for bc in (False, True):
        q = quantize_int8(cfg, params, stats, calib, bias_correct=bc)
        ql, _ = int8_apply(cfg, q, test)
        errs[bc] = float(jnp.mean(jnp.abs(ql - fl)))
    assert errs[True] <= errs[False] * 1.05, errs
