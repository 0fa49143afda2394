"""Device-resident replay mirror (selfplay/buffer.DeviceBufferMirror).

The train epoch can gather batches from HBM-resident ring arrays instead
of shipping ~1 GB of pre-sampled host batches per iteration (round-4
link-bound measurement). These tests pin (a) mirror/host content parity
through ring wraparound and (b) bit-identical training results between
the host-batch epoch and the device-gather epoch on the same RNG draws.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.selfplay.buffer import (
    DeviceBufferMirror,
    ReplayBuffer,
)
from alphazero_gomoku_tpu.selfplay.loop import (
    train_epoch_fn,
    train_epoch_gather_fn,
)

SIZE = 7
A = SIZE * SIZE


def _samples(rng, n):
    # valid observation-plane encodings (the ring's storage contract,
    # buffer.py module docstring): binary stone planes + a constant
    # k/5 capture-style plane — all exact under the uint8 encoding
    planes = rng.integers(0, 2, (n, SIZE, SIZE, 2)).astype(np.float32)
    k = (rng.integers(0, 5, (n, 1, 1, 1)).astype(np.float32) / 5.0)
    states = np.concatenate(
        [planes, np.broadcast_to(k, (n, SIZE, SIZE, 1))], axis=-1)
    pis = rng.random((n, A)).astype(np.float32)
    pis /= pis.sum(axis=1, keepdims=True)
    zs = rng.choice([-1.0, 0.0, 1.0], size=n).astype(np.float32)
    return np.ascontiguousarray(states), pis, zs


def test_mirror_tracks_ring_through_wraparound():
    rng = np.random.default_rng(0)
    buf = ReplayBuffer(capacity=100, board_size=SIZE, channel_scales=(1, 1, 5))
    mirror = DeviceBufferMirror(buf)
    for n in (40, 40, 40, 90):  # wraps twice
        s, p, z = _samples(rng, n)
        written = buf.add(s, p, z)
        assert len(written) == n
        mirror.sync(s, p, z, written)
    np.testing.assert_array_equal(np.asarray(mirror.states), buf.states)
    np.testing.assert_array_equal(np.asarray(mirror.pis), buf.pis)
    np.testing.assert_array_equal(np.asarray(mirror.zs), buf.zs)


@pytest.mark.slow
def test_gather_epoch_matches_host_epoch():
    rng = np.random.default_rng(1)
    buf = ReplayBuffer(capacity=256, board_size=SIZE, channel_scales=(1, 1, 5))
    s, p, z = _samples(rng, 200)
    written = buf.add(s, p, z)
    mirror = DeviceBufferMirror(buf)  # seeds from the loaded buffer
    del written

    n_batches, batch = 6, 16
    # identical RNG draws for both paths
    rng_a = np.random.default_rng(7)
    rng_b = np.random.default_rng(7)
    xs, ps, zb = buf.sample_many(n_batches, batch, rng_a)
    idx = np.stack([rng_b.choice(len(buf), size=batch, replace=False)
                    for _ in range(n_batches)]).astype(np.int32)

    m1 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=3)
    m2 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=3)

    p1, bs1, o1, met1 = train_epoch_fn(
        m1.cfg, m1.tx, m1.params, m1.batch_stats, m1.opt_state,
        jnp.asarray(xs), jnp.asarray(ps), jnp.asarray(zb), 1.0)
    p2, bs2, o2, met2 = train_epoch_gather_fn(
        m2.cfg, m2.tx, m2.params, m2.batch_stats, m2.opt_state,
        mirror.states, mirror.pis, mirror.zs, jnp.asarray(idx),
        mirror.inv_scales, 1.0)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p1, p2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), bs1, bs2)
    for k in met1:
        np.testing.assert_array_equal(np.asarray(met1[k]),
                                      np.asarray(met2[k]))


@pytest.mark.slow
def test_sharded_gather_epoch_matches_single_device():
    """Mesh gather epoch (replicated ring + sharded idx) == single-device
    gather epoch bit-for-bit on the virtual 8-device CPU mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    from alphazero_gomoku_tpu.parallel import (
        make_mesh,
        make_sharded_gather_epoch,
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.default_rng(11)
    buf = ReplayBuffer(capacity=256, board_size=SIZE, channel_scales=(1, 1, 5))
    s, p, z = _samples(rng, 220)
    buf.add(s, p, z)
    mirror = DeviceBufferMirror(
        buf, sharding=NamedSharding(mesh, PartitionSpec()))
    # sync after placement keeps the sharding
    s2, p2, z2 = _samples(rng, 30)
    written = buf.add(s2, p2, z2)
    mirror.sync(s2, p2, z2, written)
    np.testing.assert_array_equal(np.asarray(mirror.states), buf.states)

    n_batches, batch = 4, 16  # 16 % 8 == 0 -> 2 samples per chip per step
    idx = np.stack([np.random.default_rng(23 + i).choice(
        len(buf), size=batch, replace=False)
        for i in range(n_batches)]).astype(np.int32)

    m1 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=5)
    m2 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=5)

    p1, bs1, o1, met1 = train_epoch_gather_fn(
        m1.cfg, m1.tx, m1.params, m1.batch_stats, m1.opt_state,
        jnp.asarray(buf.states), jnp.asarray(buf.pis),
        jnp.asarray(buf.zs), jnp.asarray(idx),
        jnp.asarray(buf.inv_scales), 1.0)
    fn = make_sharded_gather_epoch(m2.cfg, m2.tx, mesh)
    p2_, bs2, o2, met2 = fn(
        m2.params, m2.batch_stats, m2.opt_state,
        mirror.states, mirror.pis, mirror.zs, jnp.asarray(idx),
        mirror.inv_scales)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6), p1, p2_)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6), bs1, bs2)
    for k in met1:
        np.testing.assert_allclose(np.asarray(met1[k]),
                                   np.asarray(met2[k]), rtol=1e-5)


@pytest.mark.slow
def test_train_loop_uses_mirror_end_to_end(tmp_path):
    """Smoke: the single-device training loop runs with the mirror path
    (mesh=None) and produces a loadable checkpoint."""
    from alphazero_gomoku_tpu.selfplay import train_alphazero

    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE, num_iterations=1,
        games_per_iteration=2, n_simulations=8, buffer_size=256,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8, model_dir=str(tmp_path),
        seed=0, verbose=False, mesh=None,
    )
    assert len(hist) == 1 and hist[0]["loss"] is not None
    m = AZModel.from_checkpoint(str(tmp_path / "best_latest.ckpt"))
    assert m.board_size == SIZE
