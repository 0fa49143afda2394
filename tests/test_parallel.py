"""Mesh-sharded self-play and training on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.parallel import (
    make_mesh,
    make_sharded_selfplay,
    make_sharded_train_epoch,
)
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

from test_mcts import fake_eval_jax

SIZE = 7


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_selfplay_runs_and_shards():
    mesh = make_mesh()
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=16, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=6, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=4),
    )
    fn = make_sharded_selfplay(env, cfg, fake_eval_jax, mesh)
    traj = fn(None, jax.random.PRNGKey(0))
    assert traj.winners.shape == (16,)
    # result really is laid out across 8 devices
    assert len(traj.winners.sharding.device_set) == 8
    active = np.asarray(traj.active)
    assert active[0].all()  # every game made at least one move
    # different shards got distinct rng streams -> games differ
    boards = np.asarray(traj.boards)
    assert not np.array_equal(boards[:, 0], boards[:, 8])


def test_sharded_train_epoch_matches_single_device():
    mesh = make_mesh()
    m = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=0)
    rng = np.random.default_rng(0)
    xs = rng.random((2, 16, SIZE, SIZE, 3)).astype(np.float32)
    pis = rng.random((2, 16, SIZE * SIZE)).astype(np.float32)
    pis /= pis.sum(-1, keepdims=True)
    zs = rng.choice([-1.0, 0.0, 1.0], (2, 16, 1)).astype(np.float32)

    sharded = make_sharded_train_epoch(m.cfg, m.tx, mesh)
    p8, s8, o8, metrics8 = sharded(
        m.params, m.batch_stats, m.opt_state,
        jnp.asarray(xs), jnp.asarray(pis), jnp.asarray(zs))

    from alphazero_gomoku_tpu.selfplay.loop import train_epoch_fn
    p1, s1, o1, metrics1 = train_epoch_fn(
        m.cfg, m.tx, m.params, m.batch_stats, m.opt_state,
        jnp.asarray(xs), jnp.asarray(pis), jnp.asarray(zs))

    # sharded == single-device numerics (same global batch statistics)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    assert abs(float(metrics8["total_loss"]) - float(metrics1["total_loss"])) < 1e-5


def test_sharded_arena_eval_fn_compatible():
    """Sharded self-play with a REAL network (params replicated)."""
    mesh = make_mesh()
    env = GomokuEnv(SIZE)
    m = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=0)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=4, cpuct=1.0, add_noise=False),
    )
    fn = make_sharded_selfplay(env, cfg, make_eval_fn(m.cfg), mesh)
    traj = fn(bundle_of(m), jax.random.PRNGKey(1))
    assert traj.winners.shape == (8,)
    pis = np.asarray(traj.pis)
    act = np.asarray(traj.active)
    np.testing.assert_allclose(pis[act].sum(-1), 1.0, atol=1e-4)


def test_sharded_selfplay_with_bf16_inference():
    # the folded bf16 bundle replicates through shard_map like raw params
    from alphazero_gomoku_tpu.ops.fused_net import fold_bn_xla, make_bf16_eval_fn

    mesh = make_mesh()
    env = GomokuEnv(SIZE)
    model = AZModel(board_size=SIZE, n_res_blocks=1, channels=16, seed=0)
    eval_fn = make_bf16_eval_fn(model.cfg)
    folded = fold_bn_xla(model.cfg, model.params, model.batch_stats)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=4, cpuct=1.0, add_noise=False),
    )
    fn = make_sharded_selfplay(env, cfg, eval_fn, mesh)
    traj = fn(folded, jax.random.PRNGKey(1))
    assert traj.winners.shape == (8,)
    assert int(np.asarray(traj.moves_played).sum()) > 0


def test_initialize_distributed_single_process_noop():
    """Single-process: no args must be a no-op returning False (never hang
    waiting for a coordinator); is_primary() is True."""
    from alphazero_gomoku_tpu.parallel import (
        initialize_distributed, is_primary,
    )
    assert initialize_distributed() is False
    assert is_primary() is True


@pytest.mark.slow
def test_sharded_selfplay_with_subtree_reuse():
    """Cross-move subtree reuse (PackedCarry threading) composes with the
    shard_map self-play fan-out: per-shard batches stay above the packed
    kernels' 8-lane floor and the carry never crosses the shard axis."""
    mesh = make_mesh(2)
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=16, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=6, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=4, backend="pallas",
                        reuse_budget=4, max_nodes=16),
    )
    fn = make_sharded_selfplay(env, cfg, fake_eval_jax, mesh)
    traj = fn(None, jax.random.PRNGKey(0))
    assert traj.winners.shape == (16,)
    assert len(traj.winners.sharding.device_set) == 2
    active = np.asarray(traj.active)
    assert active[0].all()
    boards = np.asarray(traj.boards)
    assert not np.array_equal(boards[:, 0], boards[:, 8])


def test_sharded_selfplay_continuous_runs_and_shards():
    """Continuous (auto-reset) self-play fans out over the mesh like
    lockstep: lanes shard on the batch axis, the ply axis stays
    replicated, and per-shard PRNG folding gives distinct streams."""
    from alphazero_gomoku_tpu.parallel import (
        make_sharded_selfplay_continuous,
    )

    mesh = make_mesh()
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=16, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=6, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=4),
    )
    fn = make_sharded_selfplay_continuous(env, cfg, fake_eval_jax, mesh,
                                          total_steps=12)
    rec = fn(None, jax.random.PRNGKey(0))
    assert rec.boards.shape == (12, 16, SIZE, SIZE)
    assert len(rec.ended.sharding.device_set) == 8
    # every ply of every lane is a real move in continuous mode
    assert np.asarray(rec.recorded).all()
    boards = np.asarray(rec.boards)
    assert not np.array_equal(boards[:, 0], boards[:, 8])
    # collection works on the gathered records
    from alphazero_gomoku_tpu.parallel import gather_trajectories
    from alphazero_gomoku_tpu.selfplay.runner import (
        collect_examples_continuous,
    )
    states, pis, zs, stats = collect_examples_continuous(
        gather_trajectories(rec, mesh), use_symmetries=False)
    assert len(states) == len(pis) == len(zs)
