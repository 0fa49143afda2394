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


def test_local_trajectory_shards_single_host_identity():
    """On one process, the per-host extraction returns the full batch
    (every device shard is addressable) with the pytree structure kept."""
    from alphazero_gomoku_tpu.parallel import (
        local_trajectory_shards, make_sharded_selfplay,
    )

    env = GomokuEnv(SIZE)
    mesh = make_mesh()
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=2, max_moves=6,
        mcts=MCTSConfig(n_simulations=8, add_noise=False),
    )
    traj = make_sharded_selfplay(env, cfg, fake_eval_jax, mesh)(
        None, jax.random.PRNGKey(0))
    local = local_trajectory_shards(traj)
    assert type(local) is type(traj)
    ref = jax.tree_util.tree_map(np.asarray, traj)
    for a, b in zip(jax.tree_util.tree_leaves(local),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(a, b)


def test_form_global_batches_sharding():
    from alphazero_gomoku_tpu.parallel import form_global_batches

    mesh = make_mesh()
    xs = np.arange(2 * 16 * 3, dtype=np.float32).reshape(2, 16, 3)
    ps = np.ones((2, 16, 5), np.float32)
    zs = np.zeros((2, 16, 1), np.float32)
    gx, gp, gz = form_global_batches(mesh, xs, ps, zs)
    assert gx.shape == (2, 16, 3)
    # sharded on the per-step batch axis across the 8 devices
    assert len(gx.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(gx), xs)


def test_train_loop_per_host_replay_end_to_end(tmp_path):
    """replay_sharding='per_host' on a single-host mesh: the loop trains
    through the form_global_batches -> sharded-epoch path and produces a
    finite loss (multi-process coverage: tests/test_multiprocess.py)."""
    from alphazero_gomoku_tpu.selfplay import train_alphazero

    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE, num_iterations=1,
        games_per_iteration=8, n_simulations=8, buffer_size=4000,
        batch_size=64, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8, n_res_blocks=1, channels=8,
        model_dir=str(tmp_path / "m"), seed=0, verbose=False,
        mesh="auto", replay_sharding="per_host",
    )
    assert hist[0]["moves"] > 0
    assert hist[0]["loss"] is not None
    assert all(np.isfinite(v) for v in hist[0]["loss"].values())


def test_per_host_replay_requires_mesh():
    from alphazero_gomoku_tpu.selfplay import train_alphazero

    with pytest.raises(ValueError, match="per_host"):
        train_alphazero(
            game_name="gomoku", board_size=SIZE, num_iterations=1,
            games_per_iteration=2, n_simulations=4, mesh=None,
            replay_sharding="per_host", verbose=False)
