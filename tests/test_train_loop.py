"""End-to-end training loop + arena tests on CPU with tiny configs.

The CPU analogue of the reference's workers==1 serial debug path
(``train.py:670-694``): same jitted code as the TPU path, small shapes.
"""

import os

import numpy as np
import jax
import pytest

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import evaluate_params, train_alphazero
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

SIZE = 7


def test_arena_seats_and_scoring():
    env = GomokuEnv(SIZE)
    m1 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=1)
    m2 = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=2)
    cfg = MCTSConfig(n_simulations=8, cpuct=1.0, add_noise=False)
    eval_fn = make_eval_fn(m1.cfg)
    wins, rate, draws = evaluate_params(
        env, cfg, eval_fn, bundle_of(m1), bundle_of(m2), 4,
        jax.random.PRNGKey(0),
    )
    assert 0 <= wins <= 4 and 0 <= draws <= 4 - wins
    assert rate == wins / 4.0
    # self-play against identical params must be symmetric-ish and legal
    wins2, rate2, draws2 = evaluate_params(
        env, cfg, eval_fn, bundle_of(m1), bundle_of(m1), 4,
        jax.random.PRNGKey(1),
    )
    assert wins2 + draws2 <= 4


def test_arena_self_match_is_seat_fair():
    """X vs X over many games must come out near 50% — a seat or scoring
    bias here silently corrupts the gate (candidates never/always promote),
    the round-3 failure class investigated in TRAINING_GUIDE case 7a."""
    env = GomokuEnv(SIZE)
    m = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=3)
    cfg = MCTSConfig(n_simulations=16, cpuct=1.0, add_noise=False)
    eval_fn = make_eval_fn(m.cfg)
    wins, rate, draws = evaluate_params(
        env, cfg, eval_fn, bundle_of(m), bundle_of(m), 32,
        jax.random.PRNGKey(7),
    )
    decided = 32 - draws
    assert decided >= 8  # random openings at 16 sims must decide games
    assert 0.25 <= wins / max(decided, 1) <= 0.75


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    model_dir = str(tmp_path / "models")
    common = dict(
        game_name="gomoku",
        board_size=SIZE,
        games_per_iteration=4,
        n_simulations=8,
        buffer_size=4000,
        batch_size=64,
        epochs_per_iter=1,
        temp_threshold=4,
        eval_games=2,
        eval_mcts_simulations=8,
        win_rate_threshold=0.55,
        n_res_blocks=1,
        channels=8,
        model_dir=model_dir,
        seed=0,
        verbose=False,
    )
    hist = train_alphazero(num_iterations=2, **common)
    assert len(hist) == 2
    for h in hist:
        assert h["moves"] > 0
        assert 0.0 <= h["win_rate"] <= 1.0
        assert h["buffer_size"] > 0
        assert os.path.exists(h["snapshot"])
    assert os.path.exists(os.path.join(model_dir, "replay_buffer_latest.npz"))
    assert os.path.exists(os.path.join(model_dir, "best_latest.ckpt"))
    # training actually ran once the buffer was big enough
    assert hist[-1]["loss"] is not None

    # resume: buffer reloads, snapshot warm start, iteration numbering
    snap = hist[-1]["snapshot"]
    hist2 = train_alphazero(
        num_iterations=1,
        pretrained_model_path=snap,
        next_iteration_continuation=3,
        **common,
    )
    assert hist2[0]["iteration"] == 3
    assert hist2[0]["buffer_size"] >= hist[-1]["buffer_size"]


@pytest.mark.slow
def test_train_loop_continuous_mode(tmp_path):
    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE,
        num_iterations=1, games_per_iteration=4,
        n_simulations=8, buffer_size=2000, batch_size=64,
        epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8,
        model_dir=str(tmp_path / "m"), seed=1, verbose=False,
        selfplay_mode="continuous", selfplay_steps=30,
    )
    assert hist[0]["moves"] == 4 * 30  # every ply is a real move
    assert hist[0]["buffer_size"] > 0
