"""Value-collapse mitigation knobs (round-2): root_q targets, value-loss
weight, random openings.

These knobs address the round-1 post-mortem (DECISIONS.md training notes):
the value head saturates to +-1 because blitz self-play makes every game
outcome certain.  Levers: soften the value target toward the search's own
root estimate, down-weight the MSE term, and diversify openings with random
centre plies (the mechanism the reference uses in its arena,
``/root/reference/train.py:191-198``, generalized to self-play).
"""

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.models.losses import alphazero_loss
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, play_games
from alphazero_gomoku_tpu.selfplay.runner import (
    center_mask,
    collect_examples,
)

from test_mcts import fake_eval_jax  # integer-exact fake network (7x7)

SIZE = 7
A = SIZE * SIZE


def _play(batch=4, sims=12, seed=3, **cfg_kw):
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=batch,
        temp_threshold=5,
        mcts=MCTSConfig(n_simulations=sims, cpuct=1.25, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=6),
        **cfg_kw,
    )
    return env, jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(seed))


def test_root_q_range_and_perspective():
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.25, add_noise=False)

    # a position where the player to move completes 5-in-a-row immediately:
    # most simulations end on terminal wins, so root_q must be positive
    states = env.init_batch(1)
    moves = [(3, 0), (0, 0), (3, 1), (0, 1), (3, 2), (0, 2), (3, 3), (0, 3)]
    for r, c in moves:
        states = jax.vmap(env.step)(states, jnp.array([r * SIZE + c]))
    pi, q = jax.jit(
        lambda s, k: run_mcts_with_q(
            env, cfg, fake_eval_jax, None, s,
            jnp.zeros((1,), jnp.int32), k)
    )(states, jax.random.PRNGKey(0))
    q = float(q[0])
    assert -1.0 <= q <= 1.0
    assert q > 0.3, f"winning-side root_q should be clearly positive, got {q}"
    # and the search must still find the winning move
    assert int(jnp.argmax(pi[0])) == 3 * SIZE + 4


def test_trajectories_record_root_q():
    _, traj = _play()
    qs = np.asarray(traj.root_qs)
    active = np.asarray(traj.active)
    assert np.isfinite(qs).all()
    assert (np.abs(qs[active]) <= 1.0 + 1e-6).all()
    # search produces nonzero root values on at least some plies
    assert np.abs(qs[active]).max() > 0.0


def test_value_target_mix_interpolates():
    _, traj = _play()
    _, _, z0, _ = collect_examples(traj, use_symmetries=False,
                                   value_target_mix=0.0)
    _, _, z1, _ = collect_examples(traj, use_symmetries=False,
                                   value_target_mix=1.0)
    _, _, zm, _ = collect_examples(traj, use_symmetries=False,
                                   value_target_mix=0.25)
    # pure-mix targets are exactly the recorded root_qs
    qs = np.asarray(traj.root_qs).reshape(-1)[
        np.asarray(traj.active).reshape(-1)]
    np.testing.assert_allclose(z1, qs, rtol=1e-6)
    np.testing.assert_allclose(zm, 0.75 * z0 + 0.25 * z1, rtol=1e-5,
                               atol=1e-7)


def test_opening_random_moves_masked_and_centered():
    k = 2
    env, traj = _play(opening_random_moves=k)
    active = np.asarray(traj.active)
    boards = np.asarray(traj.boards)
    # opening plies are never recorded as samples
    assert not active[:k].any()
    assert active[k].all()  # games are alive at ply k
    # stones placed during the opening are inside the centre region
    center = np.asarray(center_mask(env)).reshape(SIZE, SIZE) > 0
    for g in range(boards.shape[1]):
        stones = boards[k, g] != 0
        assert stones.sum() == k
        assert (stones <= center).all(), "opening stone outside centre"
    # moves_played still counts the real game length incl. opening plies
    assert (np.asarray(traj.moves_played) >=
            active.sum(axis=0) + k).all()


def test_value_loss_weight_scales_total():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, A)), jnp.float32)
    pi = jax.nn.softmax(jnp.asarray(rng.normal(size=(8, A)), jnp.float32))
    v = jnp.asarray(rng.uniform(-1, 1, size=(8, 1)), jnp.float32)
    z = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], size=(8, 1)), jnp.float32)
    _, m1 = alphazero_loss(logits, v, pi, z, 1.0)
    t05, m05 = alphazero_loss(logits, v, pi, z, 0.5)
    np.testing.assert_allclose(float(m05["policy_loss"]),
                               float(m1["policy_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m05["value_loss"]),
                               float(m1["value_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(t05),
        float(m1["policy_loss"]) + 0.5 * float(m1["value_loss"]), rtol=1e-6)
