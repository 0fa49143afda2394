"""Differential tests: native C pure-MCTS kernels vs the NumPy reference.

The native library (alphazero_gomoku_tpu/native/puremcts.c) must be
bit-equal to the vectorized NumPy implementations it replaces; random
boards across both rule tables, plus the Pente capture-threshold edge
cases, are compared exactly.
"""

import numpy as np
import pytest

from alphazero_gomoku_tpu.games.host import Gomoku, Pente
from alphazero_gomoku_tpu.native import load_puremcts
from alphazero_gomoku_tpu.search import pure_mcts as pm

pytestmark = pytest.mark.skipif(
    load_puremcts() is None, reason="native toolchain unavailable")


def random_boards(sizes=(9, 15), trials=8, seed=0):
    rng = np.random.default_rng(seed)
    for size in sizes:
        for t in range(trials):
            density = rng.uniform(0.05, 0.6)
            board = rng.choice(
                np.int8([0, 1, 2]), size=(size, size),
                p=[1 - density, density / 2, density / 2]).astype(np.int8)
            yield size, t, board


@pytest.mark.parametrize("table", ["gomoku", "pente"])
def test_threat_scores_matches_numpy(table):
    for size, t, board in random_boards():
        for player in (1, 2):
            want = pm._threat_scores_np(board, player, table)
            got = pm.threat_scores(board, player, table)
            np.testing.assert_array_equal(
                got, want, err_msg=f"size={size} trial={t} P{player}")


def test_capture_kernels_match_numpy():
    for size, t, board in random_boards():
        for player in (1, 2):
            np.testing.assert_array_equal(
                pm.capture_potential(board, player),
                pm._capture_potential_np(board, player),
                err_msg=f"potential size={size} trial={t} P{player}")
            np.testing.assert_array_equal(
                pm.capture_count_all(board, player),
                pm._capture_count_all_np(board, player),
                err_msg=f"count_all size={size} trial={t} P{player}")


class _FakePente:
    """Minimal state carrying a board + captures (winning_cells protocol)."""

    def __init__(self, board, captures):
        self.board = board
        self.captures = captures
        self.size = board.shape[0]


def _winning_cells_np(state, player):
    board = state.board
    empty = board == 0
    win = np.zeros(board.shape, bool)
    for dr, dc in pm._DIR_PAIRS:
        r_p, _ = pm._runs_and_open(board, player, dr, dc)
        r_m, _ = pm._runs_and_open(board, player, -dr, -dc)
        win |= (1 + r_p.astype(np.int32) + r_m.astype(np.int32)) >= 5
    if hasattr(state, "captures"):
        need = 5 - state.captures[player]
        win |= pm._capture_count_all_np(board, player) >= max(need, 0)
    return win & empty


def test_winning_cells_matches_numpy_gomoku():
    class _S:
        def __init__(self, board):
            self.board = board
            self.size = board.shape[0]

    for size, t, board in random_boards():
        for player in (1, 2):
            s = _S(board)
            np.testing.assert_array_equal(
                pm.winning_cells(s, player), _winning_cells_np(s, player),
                err_msg=f"gomoku size={size} trial={t} P{player}")


@pytest.mark.parametrize("caps", [0, 3, 4, 5])
def test_winning_cells_matches_numpy_pente(caps):
    for size, t, board in random_boards(trials=4, seed=caps + 1):
        for player in (1, 2):
            s = _FakePente(board, {1: caps, 2: caps})
            np.testing.assert_array_equal(
                pm.winning_cells(s, player), _winning_cells_np(s, player),
                err_msg=f"pente caps={caps} size={size} trial={t} P{player}")


def test_policy_scores_match_numpy_path(monkeypatch):
    """Full _policy must produce identical probs with and without native."""
    for game_cls, table in ((Gomoku, "gomoku"), (Pente, "pente")):
        g = game_cls(9)
        rng = np.random.default_rng(7)
        for _ in range(12):
            legal = np.nonzero(g.get_valid_moves())[0]
            g.do_move(divmod(int(rng.choice(legal)), 9))
            if g.is_game_over():
                break
        bot = pm.PureMCTS(n_playout=1, table=table)
        moves_nat, probs_nat = bot._policy(g)
        monkeypatch.setattr(pm, "load_puremcts", lambda: None)
        moves_np, probs_np = bot._policy(g)
        assert moves_nat == moves_np
        np.testing.assert_allclose(probs_nat, probs_np, rtol=1e-6)
