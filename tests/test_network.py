"""Network tests: torch-CPU differential oracle for forward/loss/optimizer.

Builds the reference architecture in torch inside the test (spec:
``/root/reference/network.py:9-117``), copies weights into the JAX pytree,
and checks forward outputs, loss values, and a full optimizer step agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from alphazero_gomoku_tpu.models import AZModel, NetConfig, apply, init_variables
from alphazero_gomoku_tpu.models.losses import alphazero_loss
from alphazero_gomoku_tpu.models.model import make_optimizer, train_step_fn

BOARD = 9
A = BOARD * BOARD


class TorchRes(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.c1 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.b1 = nn.BatchNorm2d(ch)
        self.c2 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.b2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return F.relu(y + x)


class TorchNet(nn.Module):
    def __init__(self, ch=32, blocks=2, board=BOARD, actions=A):
        super().__init__()
        self.conv = nn.Conv2d(3, ch, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(ch)
        self.blocks = nn.ModuleList(TorchRes(ch) for _ in range(blocks))
        self.pc = nn.Conv2d(ch, 2, 1, bias=False)
        self.pb = nn.BatchNorm2d(2)
        self.pf = nn.Linear(2 * board * board, actions)
        self.vc = nn.Conv2d(ch, 1, 1, bias=False)
        self.vb = nn.BatchNorm2d(1)
        self.v1 = nn.Linear(board * board, 64)
        self.v2 = nn.Linear(64, 1)

    def forward(self, x):
        h = F.relu(self.bn(self.conv(x)))
        for b in self.blocks:
            h = b(h)
        p = F.relu(self.pb(self.pc(h))).flatten(1)
        logits = self.pf(p)
        v = F.relu(self.vb(self.vc(h))).flatten(1)
        v = torch.tanh(self.v2(F.relu(self.v1(v))))
        return logits, v


def chw_to_hwc_perm(c, h, w):
    """Column permutation mapping CHW-flatten index -> HWC-flatten index."""
    perm = np.zeros(c * h * w, dtype=np.int64)
    for ci in range(c):
        for hi in range(h):
            for wi in range(w):
                perm[hi * w * c + wi * c + ci] = ci * h * w + hi * w + wi
    return perm


def torch_weights_to_pytree(tnet: TorchNet, cfg: NetConfig):
    # NOTE: .numpy() views torch buffers and JAX-on-CPU can alias numpy
    # memory zero-copy, so in-place torch updates (BN stats, optimizer
    # steps) would silently leak into the "captured" pytree. Always copy.
    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    def conv_w(m):
        return t2j(m.weight.permute(2, 3, 1, 0))

    def lin(m, perm=None):
        w = np.array(m.weight.detach().numpy().T, copy=True)  # [in, out]
        if perm is not None:
            w = w[perm]
        return {"w": jnp.asarray(w), "b": t2j(m.bias)}

    def bn_p(m):
        return {"scale": t2j(m.weight), "bias": t2j(m.bias)}

    def bn_s(m):
        return {"mean": t2j(m.running_mean), "var": t2j(m.running_var)}

    pperm = chw_to_hwc_perm(2, cfg.board_size, cfg.board_size)
    params = {
        "stem": {"w": conv_w(tnet.conv)},
        "stem_bn": bn_p(tnet.bn),
        "blocks": [
            {"conv1": {"w": conv_w(b.c1)}, "bn1": bn_p(b.b1),
             "conv2": {"w": conv_w(b.c2)}, "bn2": bn_p(b.b2)}
            for b in tnet.blocks
        ],
        "policy_conv": {"w": conv_w(tnet.pc)},
        "policy_bn": bn_p(tnet.pb),
        "policy_fc": lin(tnet.pf, pperm),
        "value_conv": {"w": conv_w(tnet.vc)},
        "value_bn": bn_p(tnet.vb),
        "value_fc1": lin(tnet.v1),  # 1 channel: CHW == HWC flatten
        "value_fc2": lin(tnet.v2),
    }
    batch_stats = {
        "stem_bn": bn_s(tnet.bn),
        "blocks": [{"bn1": bn_s(b.b1), "bn2": bn_s(b.b2)} for b in tnet.blocks],
        "policy_bn": bn_s(tnet.pb),
        "value_bn": bn_s(tnet.vb),
    }
    return params, batch_stats


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tnet = TorchNet()
    cfg = NetConfig(board_size=BOARD, action_size=A, n_res_blocks=2, channels=32)
    params, stats = torch_weights_to_pytree(tnet, cfg)
    return tnet, cfg, params, stats


def rand_batch(b=8, seed=1):
    rng = np.random.default_rng(seed)
    x = (rng.random((b, 3, BOARD, BOARD)) < 0.3).astype(np.float32)
    x[:, 2] = 1.0
    pi = rng.random((b, A)).astype(np.float32)
    pi /= pi.sum(axis=1, keepdims=True)
    z = rng.choice([-1.0, 0.0, 1.0], size=(b, 1)).astype(np.float32)
    return x, pi, z


def test_eval_forward_matches_torch(pair):
    tnet, cfg, params, stats = pair
    x, _, _ = rand_batch()
    tnet.eval()
    with torch.no_grad():
        tl, tv = tnet(torch.from_numpy(x))
    (jl, jv), _ = apply(cfg, params, stats,
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-5)


def test_train_forward_and_loss_match_torch(pair):
    tnet, cfg, params, stats = pair
    x, pi, z = rand_batch(seed=3)
    tnet.train()
    tl, tv = tnet(torch.from_numpy(x))
    tpl = nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(tl, dim=1), torch.from_numpy(pi))
    tvl = nn.MSELoss()(tv, torch.from_numpy(z))

    (jl, jv), new_stats = apply(cfg, params, stats,
                                jnp.asarray(x.transpose(0, 2, 3, 1)), train=True)
    _, metrics = alphazero_loss(jl, jv, jnp.asarray(pi), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(jl), tl.detach().numpy(), atol=3e-4)
    assert abs(float(metrics["policy_loss"]) - float(tpl)) < 1e-4
    assert abs(float(metrics["value_loss"]) - float(tvl)) < 1e-5
    # running stats updated with torch momentum/unbiased-var convention
    np.testing.assert_allclose(
        np.asarray(new_stats["stem_bn"]["mean"]),
        tnet.bn.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_stats["stem_bn"]["var"]),
        tnet.bn.running_var.detach().numpy(), atol=1e-5)


def test_optimizer_step_matches_torch(pair):
    tnet, cfg, params, stats = pair
    x, pi, z = rand_batch(seed=5)
    lr, wd = 1e-3, 1e-4

    tnet.train()
    opt = torch.optim.Adam(tnet.parameters(), lr=lr, weight_decay=wd)
    opt.zero_grad()
    tl, tv = tnet(torch.from_numpy(x))
    loss = nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(tl, dim=1), torch.from_numpy(pi)
    ) + nn.MSELoss()(tv, torch.from_numpy(z))
    loss.backward()
    torch.nn.utils.clip_grad_norm_(tnet.parameters(), 3.0)
    opt.step()

    tx = make_optimizer(lr, wd)
    opt_state = tx.init(params)
    new_params, _, _, metrics = train_step_fn(
        cfg, tx, params, stats, opt_state,
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(pi), jnp.asarray(z))
    assert abs(float(metrics["total_loss"]) - float(loss)) < 2e-4

    def close_enough(got, want):
        # Adam's first step is ~ -lr*sign(g); elements with |g| near eps are
        # float32-chaotic (can differ by up to ~lr between frameworks), so
        # require near-exact agreement on ~all elements and lr-bounded error
        # on the rest.
        ok = np.isclose(got, want, atol=5e-5)
        assert ok.mean() > 0.995, f"only {ok.mean():.4f} of elements matched"
        np.testing.assert_allclose(got, want, atol=1.1e-3)

    # stem conv weights after one step agree
    close_enough(
        np.asarray(new_params["stem"]["w"]).transpose(3, 2, 0, 1),
        tnet.conv.weight.detach().numpy())
    # policy fc bias agrees
    close_enough(
        np.asarray(new_params["policy_fc"]["b"]),
        tnet.pf.bias.detach().numpy())


@pytest.mark.slow
def test_model_wrapper_roundtrip(tmp_path):
    m = AZModel(board_size=BOARD, n_res_blocks=2, channels=16, seed=3)
    x = np.random.default_rng(0).random((4, 3, BOARD, BOARD)).astype(np.float32)
    probs, values = m.predict(x)
    assert probs.shape == (4, A) and values.shape == (4, 1)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    assert np.abs(values).max() <= 1.0

    pis = np.full((4, A), 1.0 / A, np.float32)
    zs = np.array([1.0, -1.0, 0.0, 1.0], np.float32)
    out1 = m.train_batch(x, pis, zs, epochs=2)
    assert set(out1) == {"policy_loss", "value_loss", "total_loss"}

    path = str(tmp_path / "m.ckpt")
    m.save(path)
    m2 = AZModel(board_size=BOARD, n_res_blocks=2, channels=16, seed=99)
    p_before = m2.predict(x)[0]
    m2.load(path)
    p_after = m2.predict(x)[0]
    assert not np.allclose(p_before, p_after)
    np.testing.assert_allclose(p_after, m.predict(x)[0], atol=1e-6)

    # optimizer state restored: identical next training step
    out_a = m.train_batch(x, pis, zs)
    out_b = m2.train_batch(x, pis, zs)
    assert abs(out_a["total_loss"] - out_b["total_loss"]) < 1e-6


def test_init_statistics():
    """Kaiming init scales match the reference's _init_weights spec."""
    cfg = NetConfig(board_size=15, action_size=225, n_res_blocks=3, channels=64)
    v = init_variables(jax.random.PRNGKey(0), cfg)
    w = np.asarray(v["params"]["blocks"][0]["conv1"]["w"])
    fan_in = 3 * 3 * 64
    assert abs(w.std() - (2.0 / fan_in) ** 0.5) < 0.005
    fc = np.asarray(v["params"]["policy_fc"]["w"])
    bound = (6.0 / fc.shape[0]) ** 0.5
    assert fc.min() >= -bound and fc.max() <= bound
    assert np.asarray(v["params"]["policy_fc"]["b"]).max() == 0.0


def test_predict_batch_and_metadata(tmp_path):
    from alphazero_gomoku_tpu.models.checkpoint import peek_metadata

    m = AZModel(board_size=BOARD, n_res_blocks=1, channels=8, seed=0)
    states = [np.zeros((3, BOARD, BOARD), np.float32) for _ in range(3)]
    probs, vals = m.predict_batch(states)
    assert probs.shape == (3, A) and vals.shape == (3, 1)
    batch = m.make_batch_from_states(states)
    assert batch.shape == (3, 3, BOARD, BOARD) and batch.dtype == np.float32

    path = str(tmp_path / "m.ckpt")
    m.save(path)
    meta = peek_metadata(path)
    assert meta["board_size"] == BOARD and meta["channels"] == 8

    # corrupt magic is rejected
    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(b"NOTACKPT" + b"\x00" * 32)
    with pytest.raises(ValueError):
        peek_metadata(str(bad))
