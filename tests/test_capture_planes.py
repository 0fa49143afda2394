"""Pente captured-pair observation planes (opt-in net input extension).

The reference's 3-plane encoding is capture-blind (``/root/reference/
games/pente.py`` surfaces captures only through the win check); with
``capture_planes`` the env appends two constant planes carrying each
side's captured-pair count / pairs_to_win.  These tests pin the device
encoder, the host encoder, the host-side training-sample encoder, and the
end-to-end trainer/player plumbing (in_channels=5 checkpoints).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.games import Pente, make_env
from alphazero_gomoku_tpu.games.pente import PenteEnv


def test_encode_shapes_and_values():
    env = PenteEnv(9, capture_planes=True)
    assert env.obs_channels == 5
    board = np.zeros((9, 9), np.int8)
    board[4, 4] = 1
    state = env.from_board(board, to_move=2, captures=(3, 1))
    obs = np.asarray(env.encode(state))
    assert obs.shape == (9, 9, 5)
    # side to move is P2: "mine" = P2's captures (1 pair), theirs = 3
    assert np.allclose(obs[..., 3], 1 / 5.0)
    assert np.allclose(obs[..., 4], 3 / 5.0)
    # base planes unchanged vs the 3-plane env
    base = np.asarray(PenteEnv(9).encode(PenteEnv(9).from_board(
        board, to_move=2, captures=(3, 1))))
    np.testing.assert_array_equal(obs[..., :3], base)


def test_default_env_stays_three_planes():
    env = make_env("pente", 9)
    assert env.obs_channels == 3
    state = env.init()
    assert env.encode(state).shape == (9, 9, 3)
    # gomoku ignores the flag entirely
    assert make_env("gomoku", 9, capture_planes=True).obs_channels == 3


def test_host_encoder_matches_device():
    g = Pente(9)
    # P2 pair at (4,4),(4,5) flanked by P1 at (4,3) and (4,6): the final
    # P1 move at (4,6) performs the custodial capture
    for mv in [(4, 3), (4, 4), (8, 8), (4, 5), (4, 6)]:
        assert g.do_move(mv)
    assert g.captures[1] == 1  # P1 captured one pair
    enc_host = g.get_encoded_state(capture_planes=True)  # [5, 9, 9] NCHW
    assert enc_host.shape == (5, 9, 9)

    env = PenteEnv(9, capture_planes=True)
    state = env.from_board(g.board, g.current_player,
                           captures=(g.captures[1], g.captures[2]))
    enc_dev = np.asarray(env.encode(state))  # [9, 9, 5] NHWC
    np.testing.assert_allclose(enc_host.transpose(1, 2, 0), enc_dev)


@pytest.mark.slow
def test_collect_examples_capture_planes():
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig, collect_examples
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    from alphazero_gomoku_tpu.selfplay.runner import play_games
    from alphazero_gomoku_tpu.models import AZModel

    env = PenteEnv(7, capture_planes=True)
    model = AZModel(board_size=7, n_res_blocks=1, channels=8,
                    in_channels=5, seed=0)
    cfg = SelfPlayConfig(
        batch_games=4, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=8, add_noise=True,
                        dirichlet_alpha=0.05),
    )
    traj = play_games(env, cfg, make_eval_fn(model.cfg), bundle_of(model),
                      jax.random.PRNGKey(0))
    assert traj.captures.shape[-1] == 2
    states, pis, zs, _ = collect_examples(traj, use_symmetries=True,
                                          capture_planes=True)
    assert states.shape[-1] == 5
    # capture planes are spatially constant, so every sample's planes 3/4
    # must be constant across the board (symmetry expansion preserves them)
    flat = states[..., 3:].reshape(len(states), -1, 2)
    np.testing.assert_allclose(flat.max(axis=1), flat.min(axis=1))
    # plane values are multiples of 1/pairs_to_win in [0, 1)
    vals = np.unique(flat) * 5.0
    np.testing.assert_allclose(vals, np.round(vals), atol=1e-6)


@pytest.mark.slow
def test_trainer_and_player_round_trip(tmp_path):
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.selfplay import train_alphazero

    hist = train_alphazero(
        game_name="pente", board_size=7, num_iterations=1,
        games_per_iteration=2, n_simulations=8, buffer_size=512,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8, model_dir=str(tmp_path),
        seed=0, verbose=False, mesh=None, pente_capture_planes=True,
    )
    assert len(hist) == 1
    path = str(tmp_path / "best_latest.ckpt")
    loaded = AZModel.from_checkpoint(path)
    assert loaded.cfg.in_channels == 5

    from alphazero_gomoku_tpu.players.alpha_base import AlphaZeroPlayer
    p = AlphaZeroPlayer(rules="pente", board_size=7, n_simulations=8,
                        model_path=path)
    assert p.env.capture_planes is True
    mv = p.play(np.zeros((7, 7), np.int8), 0, None)
    assert mv is not None and 0 <= mv[0] < 7 and 0 <= mv[1] < 7


def test_in_channels_mismatch_rejected(tmp_path):
    from alphazero_gomoku_tpu.models import AZModel

    m5 = AZModel(board_size=7, n_res_blocks=1, channels=8, in_channels=5)
    path = str(tmp_path / "c5.ckpt")
    m5.save(path)
    m3 = AZModel(board_size=7, n_res_blocks=1, channels=8)
    with pytest.raises(ValueError, match="in_channels"):
        m3.load(path)


def test_pallas_backend_small_batch_falls_back():
    """Batches below Mosaic's 8-sublane minimum must route to the XLA tree
    ops and produce identical policies (the backends are bit-identical)."""
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig, run_mcts
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    from alphazero_gomoku_tpu.games.gomoku import GomokuEnv

    env = GomokuEnv(7)
    model = AZModel(board_size=7, n_res_blocks=1, channels=8, seed=0)
    eval_fn = make_eval_fn(model.cfg)
    states = env.init_batch(1)
    mv = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(3)
    pis = {}
    for backend in ("xla", "pallas"):
        cfg = MCTSConfig(n_simulations=16, add_noise=False, backend=backend)
        pis[backend] = np.asarray(
            run_mcts(env, cfg, eval_fn, bundle_of(model), states, mv, key))
    np.testing.assert_array_equal(pis["xla"], pis["pallas"])
