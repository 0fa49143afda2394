"""One-way import of reference torch snapshots (models/torch_import.py).

Builds a torch net with the reference's module/attribute layout
(``/root/reference/network.py:9-72``: conv/bn stem, ``res_blocks.{i}``
with conv1/bn1/conv2/bn2, 2-channel policy head + FC, 1-channel value
head + 2-layer MLP), saves a reference-style ``{"net": state_dict, ...}``
snapshot, imports it, and requires forward parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn               # noqa: E402
import torch.nn.functional as F     # noqa: E402

BOARD = 7
ACTIONS = BOARD * BOARD
CH = 8
BLOCKS = 2


class _Res(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class _RefNet(nn.Module):
    """Same state-dict key layout as the reference AlphaZeroNet."""

    def __init__(self, in_channels=3):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, CH, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(CH)
        self.res_blocks = nn.ModuleList(_Res(CH) for _ in range(BLOCKS))
        self.policy_conv = nn.Conv2d(CH, 2, 1, bias=False)
        self.policy_bn = nn.BatchNorm2d(2)
        self.policy_fc = nn.Linear(2 * ACTIONS, ACTIONS)
        self.value_conv = nn.Conv2d(CH, 1, 1, bias=False)
        self.value_bn = nn.BatchNorm2d(1)
        self.value_fc1 = nn.Linear(ACTIONS, 64)
        self.value_fc2 = nn.Linear(64, 1)

    def forward(self, x):
        h = F.relu(self.bn(self.conv(x)))
        for b in self.res_blocks:
            h = b(h)
        p = F.relu(self.policy_bn(self.policy_conv(h))).flatten(1)
        logits = self.policy_fc(p)
        v = F.relu(self.value_bn(self.value_conv(h))).flatten(1)
        v = torch.tanh(self.value_fc2(F.relu(self.value_fc1(v))))
        return logits, v


def _save_ref_snapshot(path, in_channels=3):
    torch.manual_seed(0)
    net = _RefNet(in_channels)
    # make BN stats non-trivial so stat import is actually exercised
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(4, in_channels, BOARD, BOARD))
    net.eval()
    torch.save({"net": net.state_dict(), "opt": None,
                "board_size": BOARD, "action_size": ACTIONS}, path)
    return net


def test_import_forward_parity(tmp_path):
    from alphazero_gomoku_tpu.models.torch_import import (
        import_torch_checkpoint,
    )

    path = str(tmp_path / "ref.pt")
    net = _save_ref_snapshot(path)

    model = import_torch_checkpoint(path)
    assert model.cfg.n_res_blocks == BLOCKS
    assert model.cfg.channels == CH
    assert model.board_size == BOARD

    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 3, BOARD, BOARD)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_v = net(torch.from_numpy(x))
    probs, values = model.predict(x)
    t_probs = F.softmax(t_logits, dim=-1).numpy()
    np.testing.assert_allclose(probs, t_probs, atol=2e-5)
    np.testing.assert_allclose(values[:, 0], t_v.numpy()[:, 0], atol=2e-5)


def test_from_checkpoint_detects_torch(tmp_path):
    from alphazero_gomoku_tpu.models import AZModel

    path = str(tmp_path / "snapshot_iter83.pt")
    _save_ref_snapshot(path)
    model = AZModel.from_checkpoint(path)
    assert model.cfg.channels == CH
    # imported model round-trips into the native format
    native = str(tmp_path / "imported.ckpt")
    model.save(native)
    again = AZModel.from_checkpoint(native)
    x = np.zeros((1, 3, BOARD, BOARD), np.float32)
    np.testing.assert_allclose(model.predict(x)[0], again.predict(x)[0])


def test_cli_conversion(tmp_path, capsys):
    from alphazero_gomoku_tpu.models import torch_import

    src = str(tmp_path / "ref.pt")
    dst = str(tmp_path / "out.ckpt")
    _save_ref_snapshot(src)
    torch_import.main([src, dst])
    out = capsys.readouterr().out
    assert "imported" in out
    from alphazero_gomoku_tpu.models import AZModel
    m = AZModel.from_checkpoint(dst)
    assert m.cfg.n_res_blocks == BLOCKS
