"""Pente rules: capture semantics + differential test vs host oracle."""

import numpy as np
import jax
import pytest

from alphazero_gomoku_tpu.games.pente import PenteEnv
from alphazero_gomoku_tpu.games.host import Pente


def sync_check(env, state, host):
    np.testing.assert_array_equal(np.asarray(state.board), host.board)
    assert int(state.to_move) == host.current_player
    assert int(state.captures[0]) == host.captures[1]
    assert int(state.captures[1]) == host.captures[2]
    assert int(state.winner) == host.check_winner()
    assert bool(state.done) == host.is_game_over()


@pytest.mark.parametrize("seed", range(8))
def test_differential_random_games(seed):
    size = 9
    env = PenteEnv(size)
    host = Pente(size)
    state = env.init()
    step = jax.jit(env.step)
    rng = np.random.default_rng(seed)
    while not host.is_game_over():
        assert not bool(state.done)
        legal = np.asarray(env.legal_mask(state))
        np.testing.assert_array_equal(
            legal.astype(np.float32), host.get_valid_moves()
        )
        a = int(rng.choice(np.nonzero(legal)[0]))
        host.do_move(divmod(a, size))
        state = step(state, a)
        sync_check(env, state, host)
    assert bool(state.done)


def make_pair(env):
    return env.init(), Pente(env.size)


def play_both(env, state, host, moves):
    for (r, c) in moves:
        host.do_move((r, c))
        state = env.step(state, r * env.size + c)
        sync_check(env, state, host)
    return state


def test_single_capture():
    env = PenteEnv(9)
    state, host = make_pair(env)
    # P1 at (4,4); P2 builds pair at (4,5),(4,6); P1 closes at (4,7)
    state = play_both(env, state, host, [(4, 4), (4, 5), (0, 0), (4, 6)])
    state = play_both(env, state, host, [(4, 7)])
    assert host.board[4, 5] == 0 and host.board[4, 6] == 0
    assert int(state.captures[0]) == 1


def test_double_direction_capture():
    """One move capturing along two rays scores two pairs."""
    env = PenteEnv(9)
    state, host = make_pair(env)
    moves = [
        (4, 0),          # P1 anchor west
        (4, 1),          # P2
        (0, 4),          # P1 anchor north... wait needs distance 3
    ]
    # Build: P1 at (4,0) and (0,4)? capture pattern: new stone at (4,3):
    #  west ray: (4,2),(4,1) opp, (4,0) mine -> capture
    #  north? use row/col carefully. Use second ray down-right from (4,3):
    #  (5,4),(6,5) opp, (7,6) mine.
    state = play_both(env, state, host, [(4, 0), (4, 1), (7, 6), (4, 2)])
    state = play_both(env, state, host, [(8, 8), (5, 4), (0, 0), (6, 5)])
    # Now P1 to move; board: P2 at (4,1),(4,2),(5,4),(6,5); P1 at (4,0),(7,6),(8,8),(0,0)
    state = play_both(env, state, host, [(4, 3)])
    assert int(state.captures[0]) == 2
    assert host.board[4, 1] == 0 and host.board[4, 2] == 0
    assert host.board[5, 4] == 0 and host.board[6, 5] == 0


def test_moving_into_pair_is_safe():
    """Placing INTO a flanked pair position does not self-capture."""
    env = PenteEnv(9)
    state, host = make_pair(env)
    # P2 stones at (4,4) and (4,7); P1 plays (4,5) then later (4,6):
    # pattern opp-mine-mine-opp is NOT a capture for P1's move.
    state = play_both(
        env, state, host, [(0, 0), (4, 4), (4, 5), (4, 7), (4, 6)]
    )
    assert host.board[4, 5] == 1 and host.board[4, 6] == 1
    assert int(state.captures[0]) == 0 and int(state.captures[1]) == 0


def test_capture_win():
    env = PenteEnv(9, pairs_to_win=2)  # small threshold to keep the test short
    state, host = make_pair(env)
    # two separate captures by P1
    state = play_both(env, state, host, [(0, 0), (0, 1), (4, 4), (0, 2)])
    state = play_both(env, state, host, [(0, 3)])  # captures (0,1),(0,2)
    assert int(state.captures[0]) == 1
    # P2 to move now: P2 builds the pair (1,1),(2,2); P1 fills (7,7)
    state = play_both(env, state, host, [(1, 1), (7, 7), (2, 2)])
    # P1 (3,3) captures (1,1),(2,2) via anchor (0,0)
    host2 = host.clone()
    host2.do_move((3, 3))
    assert host2.captures[1] == 2
    state = env.step(state, 3 * 9 + 3)
    assert int(state.captures[0]) == 2
    # host oracle uses threshold 5, so only check the env's own winner logic
    assert int(state.winner) == 1 and bool(state.done)


def test_capture_frees_squares_for_legality():
    env = PenteEnv(9)
    state, host = make_pair(env)
    state = play_both(env, state, host, [(4, 4), (4, 5), (0, 0), (4, 6)])
    state = play_both(env, state, host, [(4, 7)])
    legal = np.asarray(env.legal_mask(state))
    assert legal[4 * 9 + 5] and legal[4 * 9 + 6]  # captured squares reopened


def test_differential_random_games_15x15():
    """Full-size Pente differential (captures are rarer but longer-range)."""
    size = 15
    env = PenteEnv(size)
    host = Pente(size)
    state = env.init()
    step = jax.jit(env.step)
    rng = np.random.default_rng(99)
    moves = 0
    while not host.is_game_over() and moves < 120:
        legal = np.nonzero(host.get_valid_moves())[0]
        a = int(rng.choice(legal))
        host.do_move(divmod(a, size))
        state = step(state, a)
        moves += 1
    sync_check(env, state, host)


def test_undo_stress_random_walk():
    """Random do/undo interleaving leaves the host engine consistent."""
    rng = np.random.default_rng(5)
    g = Pente(9)
    snapshots = [(g.board.copy(), g.current_player, dict(g.captures))]
    for _ in range(200):
        if g.move_history and rng.random() < 0.35:
            g.undo_move()
            snapshots.pop()
        elif not g.is_game_over():
            legal = np.nonzero(g.get_valid_moves())[0]
            g.do_move(divmod(int(rng.choice(legal)), 9))
            snapshots.append(
                (g.board.copy(), g.current_player, dict(g.captures)))
        else:
            g.undo_move()
            snapshots.pop()
        board, player, caps = snapshots[-1]
        np.testing.assert_array_equal(g.board, board)
        assert g.current_player == player and g.captures == caps
