"""Pure-MCTS baseline, player plugin protocol, and CLI runner tests."""

import json
import os

import numpy as np
import pytest

from alphazero_gomoku_tpu.games.host import Gomoku, Pente
from alphazero_gomoku_tpu.players import load_player
from alphazero_gomoku_tpu.search.pure_mcts import (
    MCTSGomoku,
    MCTSPente,
    capture_potential,
    threat_scores,
)


def test_threat_scores_buckets():
    g = Gomoku(9)
    for k in range(3):
        g.do_move((4, 2 + k))
        g.do_move((8, k))
    s = threat_scores(g.board, 1)
    # completing to an open four from either side of the open three
    assert s[4, 1] >= 50.0 and s[4, 5] >= 50.0
    # far-away empty cell scores 0
    assert s[0, 8] == 0.0


def test_capture_potential_counts_patterns():
    # NOTE: like the reference heuristic (mcts_pure.py:277-289) only the 4
    # positive rays are scanned, so orient the pattern positively:
    # playing (4,1) sees (4,2) opp, (4,3) opp, (4,4) mine along +(0,1).
    p = Pente(9)
    for mv in [(4, 4), (4, 2), (0, 0), (4, 3)]:
        p.do_move(mv)
    pot = capture_potential(p.board, 1)
    assert pot[4, 1] == 1
    assert pot[0, 1] == 0


def test_pure_mcts_takes_win_and_blocks():
    g = Gomoku(9)
    for k in range(4):
        g.do_move((4, k))
        g.do_move((8, k if k < 3 else 5))
    assert g.current_player == 1
    mv = MCTSGomoku(n_playout=25).get_move(g)
    assert mv == (4, 4)

    g2 = Gomoku(9)
    g2.do_move((0, 0))
    for k in range(3):
        g2.do_move((4, 2 + k))
        g2.do_move((1, k))
    g2.do_move((4, 5))  # P2 four at (4,2..5); P1 must block
    mv2 = MCTSGomoku(n_playout=25).get_move(g2)
    assert mv2 in [(4, 1), (4, 6)]


def test_pure_mcts_pente_capture_aware():
    p = Pente(9)
    for mv in [(4, 4), (4, 5), (0, 0), (4, 6)]:
        p.do_move(mv)
    # (4,7) both captures a pair and is near threats; ensure legal move out
    mv = MCTSPente(n_playout=30).get_move(p)
    assert p.board[mv] == 0


def test_player_mcts_plugin_protocol():
    player = load_player("player_mcts", "gomoku", 9)
    g = Gomoku(9)
    g.do_move((4, 4))
    mv = player.play(g.clone(), 1, g.last_move)
    assert mv is not None and g.board[mv] == 0
    # raw list board also accepted
    mv2 = player.play(g.board.tolist(), 1, (4, 4))
    assert mv2 is not None


def test_load_player_errors():
    with pytest.raises(ValueError):
        load_player("nonexistent_player_xyz", "gomoku", 9)


@pytest.mark.slow
def test_cli_match_and_tournament(tmp_path, monkeypatch, capsys):
    from alphazero_gomoku_tpu.cli.play import run_match
    from alphazero_gomoku_tpu.cli import play_loop as pl

    monkeypatch.chdir(tmp_path)
    winner = run_match("player_mcts", "player_mcts", "gomoku", size=7)
    assert winner in (0, 1, 2)

    metrics = pl.loop_for_n_games("player_mcts", "player_mcts", 2,
                                  game_name="gomoku", size=7, seed=5)
    out = capsys.readouterr().out
    assert "finished game 2/2" in out
    files = list((tmp_path / "metrics").glob("*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    assert data["n_games"] == 2
    # same-module matchups get seat-qualified labels so per-seat kwargs,
    # metrics and win tallies never collapse onto one key
    assert data["player1"][0] == "player_mcts[1]"
    assert data["player2"][0] == "player_mcts[2]"
    assert data["draws"] + sum(data["wins"].values()) == 2
    # both games recorded moves and seat swap happened
    assert data["starting_player_per_game"]["game_1"] == "player_mcts[1]"
    assert data["starting_player_per_game"]["game_2"] == "player_mcts[2]"
    g1_moves = data["move_made"]["player_mcts[1]"]["game_1"]
    assert len(g1_moves) >= 1


def test_alpha_player_gomoku_and_pente(tmp_path):
    """AlphaZero player plugin works for both games with random weights."""
    from alphazero_gomoku_tpu.players.alpha_base import AlphaZeroPlayer

    p = AlphaZeroPlayer("gomoku", 9, n_simulations=8, model_path=None,
                        n_res_blocks=1, channels=8)
    g = Gomoku(9)
    g.do_move((4, 4))
    mv = p.play(g.clone(), 1, (4, 4))
    assert mv is not None and g.board[mv] == 0

    pp = AlphaZeroPlayer("pente", 9, n_simulations=8, model_path=None,
                        n_res_blocks=1, channels=8)
    pg = Pente(9)
    for m in [(4, 4), (4, 5), (0, 0), (4, 6), (4, 7)]:  # includes a capture
        pg.do_move(m)
    mv2 = pp.play(pg.clone(), 5, (4, 7))
    assert mv2 is not None and pg.board[mv2] == 0
    # finished game -> None
    g2 = Gomoku(9)
    for k in range(4):
        g2.do_move((4, k)); g2.do_move((8, k))
    g2.do_move((4, 4))
    assert p.play(g2.clone(), 9, (4, 4)) is None


def test_infer_to_move_exact_with_captures():
    from alphazero_gomoku_tpu.players.alpha_base import infer_to_move

    g = Gomoku(9)
    assert infer_to_move(g.board) == 1
    g.do_move((4, 4))
    assert infer_to_move(g.board) == 2

    # Pente: P2 captures a P1 pair -> stones are 0 vs 2 with P1 to move;
    # naive counting says P2, the capture-aware formula says P1
    p = Pente(9)
    for m in [(4, 5), (4, 4), (4, 6), (4, 7)]:
        p.do_move(m)  # P2's (4,7) captures (4,5),(4,6)
    assert p.captures[2] == 1 and p.current_player == 1
    caps = (p.captures[1], p.captures[2])
    assert infer_to_move(p.board, caps) == 1
    assert infer_to_move(p.board, (0, 0)) == 2  # naive is wrong here

    # player_mcts honors capture counts from the passed game object
    player = load_player("player_mcts", "pente", 9)
    mv = player.play(p.clone(), 5, p.last_move)
    assert mv is not None and p.board[mv] == 0


def test_mcts_config_validates_capacity():
    from alphazero_gomoku_tpu.search import MCTSConfig
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=100, max_nodes=50).node_capacity


def test_fused_predict_pads_ragged_batches():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from alphazero_gomoku_tpu.models.resnet import NetConfig, init_variables
    from alphazero_gomoku_tpu.ops.fused_net import fold_bn, fused_predict

    cfg = NetConfig(board_size=9, action_size=81, n_res_blocks=1, channels=32)
    v = init_variables(__import__("jax").random.PRNGKey(0), cfg)
    folded = fold_bn(cfg, v["params"], v["batch_stats"])
    obs = jnp.zeros((6, 9, 9, 3), jnp.float32)  # 6 % 8 != 0
    with pltpu.force_tpu_interpret_mode():
        logits, value = fused_predict(cfg, folded, 8, obs)
    assert logits.shape == (6, 81) and value.shape == (6, 1)


def test_winning_cells_matches_clone_scan():
    """Vectorized immediate-win detection == the reference's clone scan."""
    import numpy as np
    from alphazero_gomoku_tpu.search.pure_mcts import winning_cells

    rng = np.random.default_rng(3)
    for game_cls in (Gomoku, Pente):
        for trial in range(6):
            g = game_cls(9)
            for _ in range(int(rng.integers(4, 30))):
                if g.is_game_over():
                    break
                legal = np.nonzero(g.get_valid_moves())[0]
                g.do_move(divmod(int(rng.choice(legal)), 9))
            if g.is_game_over():
                continue
            for player in (1, 2):
                want = np.zeros((9, 9), bool)
                for mv in g.get_legal_moves():
                    probe = g.clone()
                    probe.current_player = player
                    probe.do_move(mv)
                    if probe.check_winner() == player:
                        want[mv] = True
                got = winning_cells(g, player)
                np.testing.assert_array_equal(
                    got, want,
                    err_msg=f"{game_cls.__name__} trial {trial} P{player}")


def test_pure_mcts_never_plays_past_game_end():
    """Expansion stops at terminal nodes (fixed vs reference)."""
    from alphazero_gomoku_tpu.search.pure_mcts import MCTSGomoku, _PureNode

    g = Gomoku(9)
    for k in range(4):
        g.do_move((4, k)); g.do_move((8, k if k < 3 else 5))
    g.do_move((4, 4))  # P1 wins
    assert g.is_game_over()
    m = MCTSGomoku(n_playout=5)
    root = _PureNode(state=g.clone())
    m._playout(root)
    assert root.children == {}  # terminal root never expanded


def test_alpha_player_tactical_guard():
    """The guard must take an immediate win and block an immediate loss,
    independent of network quality (random weights here — the exact
    situation a collapsed value head reproduces)."""
    from alphazero_gomoku_tpu.players.alpha_base import AlphaZeroPlayer

    p = AlphaZeroPlayer("gomoku", 9, n_simulations=4, model_path=None,
                        n_res_blocks=1, channels=8)
    # P1 has an open four -> P1 (to move) must win at an end
    g = Gomoku(9)
    for k in range(4):
        g.do_move((4, k + 1))          # P1 row
        g.do_move((8, k if k < 3 else 5))  # P2 elsewhere
    assert p.play(g.clone(), 8, (8, 5)) in {(4, 0), (4, 5)}

    # P2 to move must block P1's simple four (single gap)
    g2 = Gomoku(9)
    seq1 = [(4, 1), (4, 2), (4, 3), (4, 5)]
    seq2 = [(0, 0), (0, 2), (0, 4), (0, 6)]
    for a, b in zip(seq1, seq2):
        g2.do_move(a)
        g2.do_move(b)
    g2.current_player = 2
    # board now: P1 needs (4,4) or (4,0)/(4,6)? stones at cols 1,2,3,5 ->
    # completing cells are (4,4) (making 1-5) or (4,0)+(4,4)... the scan
    # finds (4,4) (joins both runs) and (4,0)? run 1,2,3 with 0 empty and
    # 4 empty: placing (4,0) gives only 4. So the unique block is (4,4).
    mv = p.play(g2.clone(), 8, (0, 6))
    assert mv == (4, 4)

    # guard off: same position must go through the search path (any legal
    # move; just exercising the flag)
    p2 = AlphaZeroPlayer("gomoku", 9, n_simulations=4, model_path=None,
                         n_res_blocks=1, channels=8, tactical_guard=False)
    mv2 = p2.play(g2.clone(), 8, (0, 6))
    assert mv2 is not None and g2.board[mv2] == 0


def test_load_player_kwargs_override():
    from alphazero_gomoku_tpu.players import load_player

    p = load_player("player_mcts", "gomoku", 9, n_playout=7)
    assert p.n_playout == 7
    p2 = load_player("player_alpha", "gomoku", 9, n_simulations=12)
    assert p2.n_simulations == 12
    # an EXPLICIT checkpoint path that resolves nowhere must raise, never
    # silently substitute the shipped default or random weights
    import pytest
    with pytest.raises(FileNotFoundError):
        load_player("player_alpha", "gomoku", 9,
                    model_path="/nonexistent.ckpt")


def test_play_loop_cli_model_sims_flags(tmp_path, monkeypatch):
    """--p1-sims/--p2-sims reach the per-game player constructors."""
    import alphazero_gomoku_tpu.cli.play_loop as pl

    monkeypatch.setattr(pl, "METRICS_DIR", tmp_path)
    monkeypatch.setattr(pl.time, "sleep", lambda s: None)
    rc = pl.main(["player_mcts", "player_mcts", "1", "--size", "7",
                  "--seed", "3", "--p1-sims", "5", "--p2-sims", "5"])
    assert rc == 0
    import os
    assert any(f.endswith(".json") for f in os.listdir(tmp_path))
