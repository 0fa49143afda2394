"""Self-play runner, buffer, and collection tests (CPU, tiny configs)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import (
    ReplayBuffer,
    SelfPlayConfig,
    collect_examples,
    load_replay_buffer,
    play_games,
    save_replay_buffer,
)
from alphazero_gomoku_tpu.selfplay.runner import sample_actions

from test_mcts import fake_eval_jax  # integer-exact fake network (7x7)

SIZE = 7
A = SIZE * SIZE


def run_selfplay(batch=6, sims=12, seed=0):
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=batch,
        temp_threshold=5,
        mcts=MCTSConfig(n_simulations=sims, cpuct=1.25, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=6),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(seed))
    return traj


def test_selfplay_trajectories_are_consistent():
    traj = run_selfplay()
    boards = np.asarray(traj.boards)
    players = np.asarray(traj.players)
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    winners = np.asarray(traj.winners)
    t, b = active.shape

    for g in range(b):
        # active is a prefix: True...True False...False
        acts = active[:, g]
        n = acts.sum()
        assert acts[:n].all() and not acts[n:].any()
        assert n == int(np.asarray(traj.moves_played)[g])
        # replay board evolution: each active step adds exactly one stone
        for step in range(n - 1):
            diff = (boards[step + 1, g] != boards[step, g])
            assert diff.sum() == 1
            (r, c) = np.argwhere(diff)[0]
            assert boards[step + 1, g][r, c] == players[step, g]
        # players alternate 1,2,1,2,...
        assert (players[:n, g] == (np.arange(n) % 2) + 1).all()
        # pis are distributions over legal moves while active
        for step in range(n):
            np.testing.assert_allclose(pis[step, g].sum(), 1.0, atol=1e-5)
            occupied = boards[step, g].reshape(-1) != 0
            assert (pis[step, g][occupied] == 0).all()
        # a decided game needs at least 9 plies on 7x7
        if winners[g] != 0:
            assert n >= 9


def test_collect_examples_z_and_symmetries():
    traj = run_selfplay(batch=4, sims=8, seed=2)
    states, pis, zs, stats = collect_examples(traj, use_symmetries=True)
    n_records = int(np.asarray(traj.active).sum())
    assert states.shape == (8 * n_records, SIZE, SIZE, 3)
    assert pis.shape == (8 * n_records, A)
    assert zs.shape == (8 * n_records,)
    assert sum(stats.values()) == 4
    # identity variant comes first: check z signs against winners directly
    players = np.asarray(traj.players)
    active = np.asarray(traj.active)
    winners = np.asarray(traj.winners)
    w_flat = np.broadcast_to(winners[None], players.shape)[active]
    p_flat = players[active]
    expect = np.where(w_flat == 0, 0.0, np.where(w_flat == p_flat, 1.0, -1.0))
    np.testing.assert_array_equal(zs[:n_records], expect.astype(np.float32))
    # symmetry copies carry identical z
    for v in range(8):
        np.testing.assert_array_equal(
            zs[v * n_records:(v + 1) * n_records], zs[:n_records]
        )
    # plane 2 stays all-ones through the dihedral transforms
    assert (states[..., 2] == 1.0).all()


def test_sample_actions_semantics():
    rng = jax.random.PRNGKey(0)
    pi = jnp.asarray(np.array([[0.0, 0.7, 0.2, 0.1],
                               [0.1, 0.1, 0.1, 0.7]], np.float32))
    legal = jnp.asarray(np.array([[0, 1, 1, 1], [1, 1, 1, 1]], bool))
    # temp 0 -> argmax
    a = sample_actions(pi, jnp.float32(0.0), legal, rng)
    np.testing.assert_array_equal(np.asarray(a), [1, 3])
    # temp > 0 -> samples follow pi support (never the 0-prob illegal move)
    counts = np.zeros(4)
    for s in range(50):
        a = sample_actions(pi, jnp.float32(1.0), legal,
                           jax.random.PRNGKey(s))
        counts[int(a[0])] += 1
    assert counts[0] == 0 and counts[1] > counts[3]


def test_buffer_uint8_roundtrip_is_exact(tmp_path):
    """The ring's uint8-with-per-channel-scale storage must be BIT-exact
    for every value a game encoder emits: binary planes (scale 1) and
    the Pente k/5 capture planes (scale 5, since k * f32(0.2) ==
    f32(k/5) for all k <= 5 — the multiply decode is exact, where a
    divide decode would not be reproducible on-device)."""
    from alphazero_gomoku_tpu.selfplay.buffer import (
        decode_states_f32, encode_states_u8, inv_scales_f32)

    # f32(k/5) exactly equals k * f32(0.2) — the decode identity
    for k in range(6):
        assert np.float32(k) * np.float32(0.2) == np.float32(k) / np.float32(5)

    vals = np.array([0.0, 1.0] + [k / 5.0 for k in range(1, 5)],
                    np.float32)
    n = len(vals)
    scales = (5.0, 5.0, 5.0)   # scale 5 covers {0, 1, k/5} exactly
    states = np.broadcast_to(
        vals.reshape(n, 1, 1, 1), (n, SIZE, SIZE, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        decode_states_f32(encode_states_u8(states, scales),
                          inv_scales_f32(scales, 3)), states)
    # binary planes under the default scale-1 contract
    binary = (states >= 0.5).astype(np.float32)
    np.testing.assert_array_equal(
        decode_states_f32(encode_states_u8(binary, None),
                          inv_scales_f32(None, 3)), binary)

    # through the buffer + persistence too (save now stores uint8)
    buf = ReplayBuffer(capacity=n, board_size=SIZE, channel_scales=scales)
    buf.add(states, np.full((n, A), 1.0 / A, np.float32),
            np.zeros(n, np.float32))
    s, _, _ = buf.sample(n, np.random.default_rng(0))
    assert s.dtype == np.float32
    assert set(np.unique(s)) <= set(np.unique(vals))
    path = str(tmp_path / "u8.npz")
    assert save_replay_buffer(buf, path)
    # the file carries the scales: loader needs no hint
    loaded = load_replay_buffer(path, capacity=n, board_size=SIZE)
    np.testing.assert_array_equal(loaded.states, buf.states)
    np.testing.assert_array_equal(loaded.channel_scales, scales)
    # old-format f32 buffers still load; the CALLER's scales apply
    np.savez_compressed(
        str(tmp_path / "old.npz"), states=states,
        pis=np.full((n, A), 1.0 / A, np.float32),
        zs=np.zeros(n, np.float32), capacity=np.int64(n))
    old = load_replay_buffer(str(tmp_path / "old.npz"), capacity=n,
                             board_size=SIZE, channel_scales=scales)
    np.testing.assert_array_equal(old.states, buf.states)


def test_replay_buffer_ring_and_persistence(tmp_path):
    buf = ReplayBuffer(capacity=10, board_size=SIZE)
    mk = lambda n, tag: (
        np.full((n, SIZE, SIZE, 3), tag, np.float32),
        np.full((n, A), 1.0 / A, np.float32),
        np.full((n,), float(tag), np.float32),
    )
    buf.add(*mk(6, 1))
    assert len(buf) == 6
    buf.add(*mk(6, 2))  # wraps: 2 of tag-1 overwritten
    assert len(buf) == 10
    assert (buf.zs == 1.0).sum() == 4 and (buf.zs == 2.0).sum() == 6

    s, p, z = buf.sample(5, np.random.default_rng(0))
    assert s.shape == (5, SIZE, SIZE, 3) and z.shape == (5, 1)

    path = str(tmp_path / "buf.npz")
    assert save_replay_buffer(buf, path)
    loaded = load_replay_buffer(path, capacity=10, board_size=SIZE)
    assert len(loaded) == 10
    np.testing.assert_array_equal(np.sort(loaded.zs), np.sort(buf.zs))

    # capacity mismatch: newest samples kept, warning printed
    smaller = load_replay_buffer(path, capacity=4, board_size=SIZE)
    assert len(smaller) == 4 and (smaller.zs == 2.0).all()

    # overfill in one call: only newest capacity survive
    buf2 = ReplayBuffer(capacity=5, board_size=SIZE)
    s, p, z = mk(12, 3)
    z[:] = np.arange(12)
    buf2.add(s, p, z)
    np.testing.assert_array_equal(np.sort(buf2.zs), np.arange(7, 12))

    assert load_replay_buffer(str(tmp_path / "missing.npz"), 10) is None


def test_selfplay_pente_end_to_end():
    """The full lockstep runner works for Pente (captures inside search)."""
    from alphazero_gomoku_tpu.games.pente import PenteEnv

    env = PenteEnv(7)
    a = env.num_actions

    def ev(params, obs):
        b = obs.shape[0]
        return (jnp.full((b, a), 1.0 / a, jnp.float32),
                jnp.zeros((b, 1), jnp.float32))

    cfg = SelfPlayConfig(
        batch_games=4, temp_threshold=4, max_moves=20,
        mcts=MCTSConfig(n_simulations=8, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=4),
    )
    traj = jax.jit(lambda p, k: play_games(env, cfg, ev, p, k))(
        None, jax.random.PRNGKey(0))
    active = np.asarray(traj.active)
    assert active[0].all()
    states, pis, zs, stats = collect_examples(traj, use_symmetries=False)
    assert len(zs) == int(active.sum())
    assert np.isfinite(pis).all()
    # boards only contain 0/1/2 even with captures applied
    assert set(np.unique(np.asarray(traj.boards))) <= {0, 1, 2}


def test_playout_cap_randomization_masks_cheap_plies():
    """PCR (KataGo 1902.10565): cheap plies record an all-zero pi (weight-0
    policy target) while staying active value samples; full plies record a
    normalized pi.  The policy KL is exactly 0 on zero rows."""
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=4, temp_threshold=5,
        pcr_cheap_sims=4, pcr_full_prob=0.5,
        mcts=MCTSConfig(n_simulations=12, cpuct=1.25, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=6),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(3))
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    sums = pis.sum(axis=-1)          # [T, B]
    # the ply-level choice is batch-uniform: a ply is all-zero or all-pi
    recorded = active & (sums > 0.5)
    zeroed = active & (sums <= 0.5)
    n_plies = int(np.asarray(traj.moves_played).max())
    full_plies = {t for t in range(n_plies) if recorded[t].any()}
    cheap_plies = {t for t in range(n_plies) if zeroed[t].any()}
    assert full_plies and cheap_plies          # both kinds occurred
    assert not (full_plies & cheap_plies)      # and never mixed in a ply
    # full plies carry normalized policies
    np.testing.assert_allclose(sums[recorded], 1.0, atol=1e-5)
    # cheap records flow into collection as value-only samples
    states, pis_c, zs, _ = collect_examples(traj, use_symmetries=False)
    assert (np.abs(pis_c.sum(axis=-1) - 1.0) > 0.5).any()  # zero rows kept
    # and the policy KL of a zero row is exactly zero
    from alphazero_gomoku_tpu.models.losses import policy_kl
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, A)),
                         jnp.float32)
    zero_rows = jnp.zeros((2, A), jnp.float32)
    assert float(policy_kl(logits, zero_rows)) == 0.0


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_playout_cap_randomization_composes_with_reuse():
    """PCR's cheap/full cond branches share node capacity, so the packed
    reuse carry threads through either branch with identical shapes."""
    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4,
        pcr_cheap_sims=3, pcr_full_prob=0.5, max_moves=8,
        mcts=MCTSConfig(n_simulations=9, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                        dirichlet_moves=4, backend="pallas",
                        reuse_budget=4, max_nodes=24),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(5))
    assert int(np.asarray(traj.moves_played).max()) > 0
