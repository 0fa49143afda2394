"""Gumbel sequential-halving search (search/gumbel.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.search.gumbel import (
    halving_schedule,
    run_gumbel_mcts,
)
from alphazero_gomoku_tpu.search.tree import run_mcts_with_q

from test_mcts import fake_eval_jax

SIZE = 7
A = SIZE * SIZE


def gcfg(n_sims, m=8, **kw):
    return MCTSConfig(n_simulations=n_sims, search="gumbel",
                      gumbel_max_considered=m, add_noise=False, **kw)


def test_halving_schedule_budgets():
    for n in (2, 3, 8, 16, 50, 200, 400):
        for m0 in (2, 4, 16, 32):
            m, phases = halving_schedule(n, m0)
            total = sum(mk * per for mk, per in phases)
            assert total <= n, (n, m0, phases)
            assert phases[0][0] == m
            # halving: each phase has half the previous actions
            for (m_a, _), (m_b, _) in zip(phases, phases[1:]):
                assert m_b == m_a // 2
            assert phases[-1][0] == 2
            assert all(per >= 1 for _, per in phases)
    with pytest.raises(ValueError):
        halving_schedule(1, 16)


def test_gumbel_finds_win_in_one():
    """P1 has a four with one open end on a nearly-full board (6 legal
    cells, all inside the consideration set): sequential halving must
    play the winning extension and the improved policy must peak there,
    at a small budget.  (On sparse boards with an uninformed prior the
    win move can legitimately miss the top-m Gumbel cut — considering
    only m actions is the algorithm, so the test controls legality
    instead.)"""
    env = GomokuEnv(SIZE)
    board = np.zeros((SIZE, SIZE), np.int8)
    board[3, 1:5] = 1          # four in a row
    board[3, 0] = 2            # left end blocked
    empties = {(3, 5), (3, 6), (0, 0), (0, 6), (6, 0), (6, 6)}
    pat = [1, 2, 2, 1, 2, 1, 1, 2, 1, 2, 2, 1]   # anti-run fill
    k = 0
    for r in range(SIZE):
        for c in range(SIZE):
            if (r, c) in empties or board[r, c] != 0:
                continue
            board[r, c] = pat[k % len(pat)]
            k += 1
    state = env.from_board(jnp.asarray(board), 1)
    assert not bool(state.done)
    states = jax.tree_util.tree_map(lambda x: x[None], state)

    win_idx = 3 * SIZE + 5
    for sims in (16, 64):
        pi, root_q, action = jax.jit(
            lambda s, k: run_gumbel_mcts(env, gcfg(sims), fake_eval_jax,
                                         None, s, k),
            static_argnums=(),
        )(states, jax.random.PRNGKey(0))
        assert int(action[0]) == win_idx, sims
        assert int(np.argmax(np.asarray(pi)[0])) == win_idx
        # winning edge Q is +1 => root_q positive once it dominates visits
        assert np.isfinite(float(root_q[0]))
    # the target is a distribution over legal moves only
    pi = np.asarray(pi)[0]
    legal = np.asarray(env.legal_mask(state))
    assert pi[legal == 0].max() < 1e-6
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-5)


def test_gumbel_batch_dispatch_and_legality():
    """run_mcts_with_q dispatches search='gumbel'; over a batch of random
    positions the outputs are finite distributions and the halving winner
    is always legal."""
    rng = np.random.default_rng(4)
    env = GomokuEnv(SIZE)
    boards = np.zeros((4, SIZE, SIZE), np.int8)
    for b in range(4):
        cells = rng.choice(A, size=8, replace=False)
        boards[b].reshape(-1)[cells[:4]] = 1
        boards[b].reshape(-1)[cells[4:]] = 2
    states = jax.vmap(lambda bd: env.from_board(bd, 1))(jnp.asarray(boards))

    cfg = gcfg(24, m=4)
    pi, root_q = jax.jit(
        lambda s, k: run_mcts_with_q(env, cfg, fake_eval_jax, None, s,
                                     jnp.zeros((4,), jnp.int32), k)
    )(states, jax.random.PRNGKey(1))
    pi = np.asarray(pi)
    assert np.isfinite(pi).all() and np.isfinite(np.asarray(root_q)).all()
    np.testing.assert_allclose(pi.sum(axis=-1), 1.0, atol=1e-5)
    legal = np.asarray(jax.vmap(env.legal_mask)(states))
    assert (pi[legal == 0] < 1e-6).all()

    _, _, action = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg, fake_eval_jax, None, s, k)
    )(states, jax.random.PRNGKey(2))
    picked = np.asarray(action)
    assert (legal[np.arange(4), picked] > 0).all()


def test_gumbel_config_validation():
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=16, search="gumbel", reuse_budget=8)
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=16, search="gumbel", leaves_per_sim=2)
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=16, search="nope")


def test_gumbel_selfplay_games_complete():
    """Lockstep self-play with search='gumbel': games finish, recorded
    pis are the improved-policy targets (legal-only distributions), and
    played moves were all legal."""
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, play_games
    from alphazero_gomoku_tpu.selfplay.runner import collect_examples

    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=4, temp_threshold=4,
        mcts=gcfg(12, m=4),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(7))
    winners = np.asarray(traj.winners)
    moves = np.asarray(traj.moves_played)
    assert (moves > 0).all()
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    np.testing.assert_allclose(pis[active].sum(axis=-1), 1.0, atol=1e-4)
    states, pis_c, zs, stats = collect_examples(traj, use_symmetries=False)
    assert len(states) == int(active.sum())
    assert sum(stats.values()) == 4 and stats[0] + stats[1] + stats[2] == 4
    del winners


def test_alpha_player_gumbel_mode():
    """AlphaZeroPlayer(search='gumbel') plays legal moves (random weights,
    tiny board)."""
    from alphazero_gomoku_tpu.players.alpha_base import AlphaZeroPlayer

    p = AlphaZeroPlayer(rules="gomoku", board_size=SIZE, n_simulations=8,
                        model_path=None, n_res_blocks=1, channels=8,
                        search="gumbel")
    assert p.tree_reuse is False
    board = np.zeros((SIZE, SIZE), np.int8)
    board[3, 3] = 1
    r, c = p.play(board.copy(), 1, (3, 3))
    assert 0 <= r < SIZE and 0 <= c < SIZE and board[r, c] == 0


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_pente_smoke():
    """Gumbel search is env-agnostic: a Pente batch produces legal
    distributions (captures/terminal handling via the shared expand
    path)."""
    from alphazero_gomoku_tpu.games import make_env

    env = make_env("pente", SIZE)
    states = env.init_batch(2)
    states = jax.vmap(env.step)(states, jnp.asarray([24, 25]))
    pi, root_q = jax.jit(
        lambda s, k: run_mcts_with_q(env, gcfg(12, m=4), fake_eval_jax, None,
                                     s, jnp.ones((2,), jnp.int32), k)
    )(states, jax.random.PRNGKey(3))
    pi = np.asarray(pi)
    np.testing.assert_allclose(pi.sum(axis=-1), 1.0, atol=1e-5)
    legal = np.asarray(jax.vmap(env.legal_mask)(states))
    assert (pi[legal == 0] < 1e-6).all()


def test_gumbel_packed_matches_xla():
    """Packed-kernel gumbel (tree_pallas.run_gumbel_packed) vs the XLA
    implementation: same PRNG, same schedule — the halving winners must
    agree exactly and the completed-Q targets to float tolerance."""
    from alphazero_gomoku_tpu.search.tree_pallas import run_gumbel_packed

    rng = np.random.default_rng(9)
    env = GomokuEnv(SIZE)
    boards = np.zeros((8, SIZE, SIZE), np.int8)
    for b in range(8):
        cells = rng.choice(A, size=10, replace=False)
        boards[b].reshape(-1)[cells[:5]] = 1
        boards[b].reshape(-1)[cells[5:]] = 2
    states = jax.vmap(lambda bd: env.from_board(bd, 1))(jnp.asarray(boards))
    cfg = gcfg(24, m=8)

    key = jax.random.PRNGKey(13)
    pi_x, q_x, act_x = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg, fake_eval_jax, None, s, k)
    )(states, key)
    pi_p, q_p, act_p = jax.jit(
        lambda s, k: run_gumbel_packed(env, cfg, fake_eval_jax, None, s, k)
    )(states, key)

    np.testing.assert_array_equal(np.asarray(act_x), np.asarray(act_p))
    np.testing.assert_allclose(np.asarray(pi_x), np.asarray(pi_p),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_x), np.asarray(q_p), atol=1e-5)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_packed_dispatch_via_backend():
    """MCTSConfig(search='gumbel', backend='pallas') routes batches >= 8
    through the packed walk (and still returns valid distributions)."""
    env = GomokuEnv(SIZE)
    states = env.init_batch(8)
    states = jax.vmap(env.step)(states, jnp.arange(8, dtype=jnp.int32) + 20)
    cfg = MCTSConfig(n_simulations=16, search="gumbel",
                     gumbel_max_considered=8, add_noise=False,
                     backend="pallas")
    pi, root_q = jax.jit(
        lambda s, k: run_mcts_with_q(env, cfg, fake_eval_jax, None, s,
                                     jnp.ones((8,), jnp.int32), k)
    )(states, jax.random.PRNGKey(21))
    pi = np.asarray(pi)
    np.testing.assert_allclose(pi.sum(axis=-1), 1.0, atol=1e-5)
    legal = np.asarray(jax.vmap(env.legal_mask)(states))
    assert (pi[legal == 0] < 1e-6).all()


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_pcr_composition_packed():
    """PCR's cheap/full cond + the packed gumbel walk in lockstep
    self-play: both branches share node capacity; games complete."""
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, play_games

    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4, max_moves=10,
        pcr_cheap_sims=4, pcr_full_prob=0.5,
        mcts=MCTSConfig(n_simulations=12, search="gumbel",
                        gumbel_max_considered=4, add_noise=False,
                        backend="pallas"),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(17))
    assert int(np.asarray(traj.moves_played).max()) > 0
    sums = np.asarray(traj.pis).sum(axis=-1)
    active = np.asarray(traj.active)
    assert ((sums[active] > 0.5) | (sums[active] < 1e-6)).all()


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_reuse_empty_carry_matches_fresh():
    """Gumbel with an empty reuse carry is semantically a fresh search
    (same pi target and halving winner; slots merely shift by
    reuse_budget-1)."""
    from alphazero_gomoku_tpu.search.tree_pallas import (
        init_packed_carry,
        run_gumbel_packed,
        run_gumbel_packed_with_tree,
    )

    env = GomokuEnv(SIZE)
    states = env.init_batch(8)
    states = jax.vmap(env.step)(states, jnp.arange(8, dtype=jnp.int32) + 18)
    cfg_fresh = MCTSConfig(n_simulations=16, search="gumbel",
                           gumbel_max_considered=8, add_noise=False,
                           backend="pallas")
    cfg_reuse = MCTSConfig(n_simulations=16, search="gumbel",
                           gumbel_max_considered=8, add_noise=False,
                           backend="pallas", reuse_budget=6,
                           max_nodes=cfg_fresh.node_capacity + 6)
    key = jax.random.PRNGKey(31)
    pi_f, q_f, act_f = jax.jit(
        lambda s, k: run_gumbel_packed(env, cfg_fresh, fake_eval_jax, None,
                                       s, k))(states, key)
    carry0 = init_packed_carry(env, cfg_reuse, states)
    pi_r, q_r, act_r, carry = jax.jit(
        lambda c, s, k: run_gumbel_packed_with_tree(
            env, cfg_reuse, fake_eval_jax, None, k, carry=c, root_states=s)
    )(carry0, states, key)
    np.testing.assert_array_equal(np.asarray(act_f), np.asarray(act_r))
    np.testing.assert_allclose(np.asarray(pi_f), np.asarray(pi_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_r), atol=1e-5)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_selfplay_with_reuse():
    """Lockstep self-play: gumbel + cross-move subtree reuse thread the
    packed carry through the move loop; games complete with legal
    moves."""
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, play_games

    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4, max_moves=10,
        mcts=MCTSConfig(n_simulations=9, search="gumbel",
                        gumbel_max_considered=4, add_noise=False,
                        backend="pallas", reuse_budget=4, max_nodes=24),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(23))
    assert int(np.asarray(traj.moves_played).max()) > 0
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    np.testing.assert_allclose(pis[active].sum(axis=-1), 1.0, atol=1e-4)

@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_round_parallel_matches_serial_xla():
    """Round-parallel gumbel (one NN call per halving round) is BIT-EXACT
    vs the serial XLA driver on midgame boards (every lane has >= m legal
    actions, so every round's candidates are distinct and the disjoint-
    subtree argument gives exact serial equivalence)."""
    import dataclasses

    rng = np.random.default_rng(9)
    env = GomokuEnv(SIZE)
    boards = np.zeros((8, SIZE, SIZE), np.int8)
    for b in range(8):
        cells = rng.choice(A, size=10, replace=False)
        boards[b].reshape(-1)[cells[:5]] = 1
        boards[b].reshape(-1)[cells[5:]] = 2
    states = jax.vmap(lambda bd: env.from_board(bd, 1))(jnp.asarray(boards))
    cfg_s = gcfg(24, m=8)
    cfg_p = dataclasses.replace(cfg_s, gumbel_round_parallel=True)
    key = jax.random.PRNGKey(13)
    pi_s, q_s, act_s = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg_s, fake_eval_jax, None, s, k)
    )(states, key)
    pi_p, q_p, act_p = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg_p, fake_eval_jax, None, s, k)
    )(states, key)
    np.testing.assert_array_equal(np.asarray(act_s), np.asarray(act_p))
    np.testing.assert_array_equal(np.asarray(pi_s), np.asarray(pi_p))
    np.testing.assert_array_equal(np.asarray(q_s), np.asarray(q_p))


def test_gumbel_round_parallel_matches_serial_packed():
    """Packed round-parallel (fan-lane walk kernel, interpret mode) is
    BIT-EXACT vs the packed serial driver, and matches the XLA serial
    driver to float tolerance."""
    import dataclasses

    from alphazero_gomoku_tpu.search.tree_pallas import run_gumbel_packed

    rng = np.random.default_rng(7)
    env = GomokuEnv(SIZE)
    boards = np.zeros((8, SIZE, SIZE), np.int8)
    for b in range(8):
        cells = rng.choice(A, size=12, replace=False)
        boards[b].reshape(-1)[cells[:6]] = 1
        boards[b].reshape(-1)[cells[6:]] = 2
    states = jax.vmap(lambda bd: env.from_board(bd, 1))(jnp.asarray(boards))
    cfg_s = gcfg(24, m=8, backend="pallas")
    cfg_p = dataclasses.replace(cfg_s, gumbel_round_parallel=True)
    key = jax.random.PRNGKey(5)
    pi_s, q_s, act_s = jax.jit(
        lambda s, k: run_gumbel_packed(env, cfg_s, fake_eval_jax, None, s, k)
    )(states, key)
    pi_p, q_p, act_p = jax.jit(
        lambda s, k: run_gumbel_packed(env, cfg_p, fake_eval_jax, None, s, k)
    )(states, key)
    np.testing.assert_array_equal(np.asarray(act_s), np.asarray(act_p))
    np.testing.assert_array_equal(np.asarray(pi_s), np.asarray(pi_p))
    np.testing.assert_array_equal(np.asarray(q_s), np.asarray(q_p))

    cfg_x = dataclasses.replace(cfg_s, backend="xla")
    pi_x, _, act_x = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg_x, fake_eval_jax, None, s, k)
    )(states, key)
    np.testing.assert_array_equal(np.asarray(act_x), np.asarray(act_p))
    np.testing.assert_allclose(np.asarray(pi_x), np.asarray(pi_p), atol=1e-5)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_round_parallel_endgame_duplicates_valid():
    """With fewer legal moves than m the illegal-candidate fallback forces
    DUPLICATE root actions inside one round (the documented divergence
    from serial): the search must still return a normalized, legal pi and
    find the win-in-one."""
    import dataclasses

    env = GomokuEnv(SIZE)
    # the win-in-one board: blocked four, 6 empty cells, m=8 > 6 legal
    board = np.zeros((SIZE, SIZE), np.int8)
    board[3, 1:5] = 1
    board[3, 0] = 2
    empties = {(3, 5), (3, 6), (0, 0), (0, 6), (6, 0), (6, 6)}
    pat = [1, 2, 2, 1, 2, 1, 1, 2, 1, 2, 2, 1]
    k = 0
    for r in range(SIZE):
        for c in range(SIZE):
            if (r, c) in empties or board[r, c] != 0:
                continue
            board[r, c] = pat[k % len(pat)]
            k += 1
    states = jax.vmap(lambda bd: env.from_board(bd, 1))(
        jnp.asarray(board[None].repeat(8, 0)))
    legal = np.asarray(jax.vmap(env.legal_mask)(states))
    assert 0 < legal[0].sum() < 8
    cfg = dataclasses.replace(gcfg(16, m=8), gumbel_round_parallel=True)
    pi, q, act = jax.jit(
        lambda s, k: run_gumbel_mcts(env, cfg, fake_eval_jax, None, s, k)
    )(states, jax.random.PRNGKey(3))
    pi = np.asarray(pi)
    np.testing.assert_allclose(pi.sum(axis=-1), 1.0, atol=1e-5)
    assert (pi[legal == 0] < 1e-6).all()
    assert (np.asarray(act) == 3 * SIZE + 5).all()


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_round_parallel_reuse_carry_matches_serial():
    """Round-parallel composes with cross-move subtree reuse: search move
    1, advance the packed carry, and the move-2 search from the CARRIED
    tree is bit-exact between the parallel and serial drivers."""
    import dataclasses

    from alphazero_gomoku_tpu.search.tree_pallas import (
        init_packed_carry,
        packed_advance_root,
        run_gumbel_packed_with_tree,
    )

    env = GomokuEnv(SIZE)
    states = env.init_batch(8)
    states = jax.vmap(env.step)(states, jnp.arange(8, dtype=jnp.int32) + 18)
    # floor = n_simulations + 2 + reuse_budget (the +2 gained the
    # reserved DMA-guard tile in round 4; this test lagged at 23)
    cfg_s = MCTSConfig(n_simulations=16, search="gumbel",
                       gumbel_max_considered=8, add_noise=False,
                       backend="pallas", reuse_budget=6, max_nodes=24)
    cfg_p = dataclasses.replace(cfg_s, gumbel_round_parallel=True)
    key1, key2 = jax.random.split(jax.random.PRNGKey(41))

    def two_moves(cfg):
        carry = init_packed_carry(env, cfg, states)
        _, _, act, carry = run_gumbel_packed_with_tree(
            env, cfg, fake_eval_jax, None, key1, carry=carry,
            root_states=states)
        carry = packed_advance_root(env, cfg, carry, act)
        return run_gumbel_packed_with_tree(
            env, cfg, fake_eval_jax, None, key2, carry=carry)[:3]

    pi_s, q_s, act_s = jax.jit(lambda: two_moves(cfg_s))()
    pi_p, q_p, act_p = jax.jit(lambda: two_moves(cfg_p))()
    np.testing.assert_array_equal(np.asarray(act_s), np.asarray(act_p))
    np.testing.assert_array_equal(np.asarray(pi_s), np.asarray(pi_p))
    np.testing.assert_array_equal(np.asarray(q_s), np.asarray(q_p))


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gumbel_round_parallel_selfplay_games_complete():
    """Lockstep self-play with the round-parallel flag (packed backend):
    games complete with legal normalized targets."""
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, play_games

    env = GomokuEnv(SIZE)
    cfg = SelfPlayConfig(
        batch_games=8, temp_threshold=4, max_moves=10,
        mcts=MCTSConfig(n_simulations=12, search="gumbel",
                        gumbel_max_considered=4, add_noise=False,
                        backend="pallas", gumbel_round_parallel=True),
    )
    traj = jax.jit(
        lambda p, k: play_games(env, cfg, fake_eval_jax, p, k)
    )(None, jax.random.PRNGKey(11))
    assert int(np.asarray(traj.moves_played).max()) > 0
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    np.testing.assert_allclose(pis[active].sum(axis=-1), 1.0, atol=1e-4)
