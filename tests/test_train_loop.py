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


def test_wilson_ci_math():
    from alphazero_gomoku_tpu.selfplay import wilson_ci

    assert wilson_ci(0, 0) == (0.0, 1.0)
    lo, hi = wilson_ci(8, 16)
    assert 0.0 < lo < 0.5 < hi < 1.0
    # canonical value: 8/16 at z=1.96 -> [0.2800, 0.7200] (4 dp)
    assert abs(lo - 0.28) < 0.005 and abs(hi - 0.72) < 0.005
    # degenerate extremes stay inside [0, 1]
    lo0, hi0 = wilson_ci(0, 16)
    lo1, hi1 = wilson_ci(16, 16)
    assert lo0 == 0.0 and hi0 < 0.35 and lo1 > 0.65 and hi1 == 1.0


def test_arena_mirrored_openings_and_pair_stats():
    """Both seat halves must receive the SAME rng (same openings) and the
    pair tally must line up index-for-index."""
    env = GomokuEnv(SIZE)
    m = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=4)
    cfg = MCTSConfig(n_simulations=4, cpuct=1.0, add_noise=False)
    eval_fn = make_eval_fn(m.cfg)
    from alphazero_gomoku_tpu.selfplay import evaluate_params_detailed

    calls = []

    def fake_half(p1, p2, n, key):
        calls.append(np.asarray(key))
        # winner decided by game index parity: P1 wins even games
        return np.where(np.arange(n) % 2 == 0, 1, 2).astype(np.int32)

    r = evaluate_params_detailed(
        env, cfg, eval_fn, bundle_of(m), bundle_of(m), 8,
        jax.random.PRNGKey(11), arena_half_fn=fake_half,
    )
    assert len(calls) == 2
    np.testing.assert_array_equal(calls[0], calls[1])  # mirrored openings
    # half A: candidate is P1, wins games 0,2 of 4; half B: candidate is
    # P2, wins games 1,3 -> every opening pair splits 1-1
    assert r["wins"] == 4 and r["played"] == 8 and r["win_rate"] == 0.5
    assert r["pairs"] == {"win_both": 0, "split": 4, "loss_both": 0, "n": 4}
    lo, hi = r["ci95"]
    assert lo < 0.5 < hi


def test_arena_real_pairing_is_deterministic():
    """With identical params and the mirrored design, the two halves of a
    REAL arena must produce mirror-image winner arrays (deterministic
    argmax play from identical openings)."""
    from alphazero_gomoku_tpu.selfplay.arena import arena_half

    env = GomokuEnv(SIZE)
    m = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=5)
    cfg = MCTSConfig(n_simulations=8, cpuct=1.0, add_noise=False)
    eval_fn = make_eval_fn(m.cfg)
    key = jax.random.PRNGKey(13)
    b = bundle_of(m)
    w_a = np.asarray(arena_half(env, cfg, eval_fn, b, b, 6, key))
    w_b = np.asarray(arena_half(env, cfg, eval_fn, b, b, 6, key))
    np.testing.assert_array_equal(w_a, w_b)


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


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_train_loop_eval_every_skips_arena(tmp_path):
    """eval_every=2: odd iterations skip the arena (win_rate None, no
    gate action) while training continues; arena iterations still gate."""
    hist = train_alphazero(
        game_name="gomoku",
        board_size=SIZE,
        num_iterations=3,
        games_per_iteration=4,
        n_simulations=8,
        buffer_size=4000,
        batch_size=64,
        epochs_per_iter=1,
        temp_threshold=4,
        eval_games=2,
        eval_mcts_simulations=8,
        eval_every=2,
        win_rate_threshold=0.55,
        n_res_blocks=1,
        channels=8,
        model_dir=str(tmp_path / "models"),
        seed=0,
        verbose=False,
    )
    assert len(hist) == 3
    # iterations 1 and 3 skip (1 % 2 == 1), iteration 2 runs the arena
    assert hist[0]["win_rate"] is None
    assert hist[0]["win_rate_ci95"] is None
    assert hist[0]["accepted"] is False
    assert hist[0]["eval_seconds"] == 0.0
    assert hist[1]["win_rate"] is not None
    assert 0.0 <= hist[1]["win_rate"] <= 1.0
    assert hist[2]["win_rate"] is None
    # training ran on every iteration regardless of the skipped arena
    for h in hist[1:]:
        assert h["loss"] is not None


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
        mesh=None,   # single-device continuous; the sharded variant is
                     # test_train_loop_continuous_mode_sharded
    )
    assert hist[0]["moves"] == 4 * 30  # every ply is a real move
    assert hist[0]["buffer_size"] > 0


@pytest.mark.slow  # heaviest single-CPU tests (durations audit)
def test_gate_mode_track_keeps_best_frozen_on_rejection(tmp_path):
    """gate_mode='track': a rejected candidate keeps training (no reset)
    and best never advances — the promoted/snapshotted net stays at the
    start weights under an always-reject threshold."""
    import jax.numpy as jnp

    common = dict(
        game_name="gomoku", board_size=SIZE, num_iterations=2,
        games_per_iteration=2, n_simulations=8, buffer_size=256,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        win_rate_threshold=2.0,  # impossible: every candidate rejected
        n_res_blocks=1, channels=8, seed=6, verbose=False, mesh=None,
    )
    hist = train_alphazero(gate_mode="track",
                           model_dir=str(tmp_path / "t"), **common)
    assert all(not h["accepted"] for h in hist)
    best = AZModel(board_size=SIZE, n_res_blocks=1, channels=8)
    best.load(str(tmp_path / "t" / "best_latest.ckpt"))
    init = AZModel(board_size=SIZE, n_res_blocks=1, channels=8, seed=6)
    for a, b in zip(jax.tree_util.tree_leaves(best.params),
                    jax.tree_util.tree_leaves(init.params)):
        assert jnp.allclose(a, b), "best advanced despite rejection"

    with pytest.raises(ValueError, match="gate_mode"):
        train_alphazero(gate_mode="bogus", model_dir=str(tmp_path / "x"),
                        **common)

    # snapshots persist the CANDIDATE (which trained on), not the frozen
    # best — otherwise track-mode runs leave nothing for the peak harvest
    import glob
    snaps = sorted(glob.glob(str(tmp_path / "t" / "snapshot_iter*.ckpt")))
    assert snaps, "no snapshots written"
    cand = AZModel(board_size=SIZE, n_res_blocks=1, channels=8)
    cand.load(snaps[-1])
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(cand.params),
                        jax.tree_util.tree_leaves(init.params))
    ]
    assert max(diffs) > 0, "snapshot equals start weights: candidate drift lost"


@pytest.mark.slow  # heaviest single-CPU tests (durations audit)
def test_anchor_arena_records_absolute_strength(tmp_path):
    """anchor_arena_every plays the candidate vs a frozen anchor and
    records the stats in history."""
    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE, num_iterations=2,
        games_per_iteration=2, n_simulations=8, buffer_size=256,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        anchor_arena_every=2, n_res_blocks=1, channels=8,
        model_dir=str(tmp_path), seed=2, verbose=False, mesh=None,
    )
    # iterations are 1-based: iter 2 hits the cadence, iter 1 does not
    assert hist[0]["anchor"] is None
    a = hist[1]["anchor"]
    assert a is not None and a["played"] == 2
    assert 0.0 <= a["win_rate"] <= 1.0 and "pairs" in a


@pytest.mark.slow  # heaviest single-CPU tests (durations audit)
def test_int8_inference_training_iteration(tmp_path):
    """inference='int8': the loop re-quantizes each update (buffer-state
    calibration once samples exist) and completes an iteration."""
    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE, num_iterations=2,
        games_per_iteration=2, n_simulations=8, buffer_size=256,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=4, n_res_blocks=1, channels=8,
        inference="int8", model_dir=str(tmp_path / "q"), seed=11,
        verbose=False, mesh=None,
    )
    assert len(hist) == 2
    assert hist[-1]["buffer_size"] > 0


@pytest.mark.slow
def test_train_loop_continuous_mode_sharded(tmp_path):
    """Continuous self-play fans out over the mesh (round-2: it was
    single-device only); records gather for host collection like the
    lockstep path."""
    from alphazero_gomoku_tpu.parallel import make_mesh

    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE,
        num_iterations=1, games_per_iteration=8,
        n_simulations=8, buffer_size=2000, batch_size=64,
        epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8,
        model_dir=str(tmp_path / "m"), seed=1, verbose=False,
        selfplay_mode="continuous", selfplay_steps=30,
        mesh=make_mesh(),
    )
    assert hist[0]["moves"] == 8 * 30  # every ply is a real move
    assert hist[0]["buffer_size"] > 0


@pytest.mark.slow
def test_train_loop_selfplay_move_cap(tmp_path):
    """selfplay_max_moves caps lockstep games; capped games score draws
    (the draw-curriculum lever — reference move cap: train.py:392)."""
    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE,
        num_iterations=1, games_per_iteration=4,
        n_simulations=8, buffer_size=2000, batch_size=32,
        epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8,
        model_dir=str(tmp_path / "m"), seed=3, verbose=False,
        selfplay_max_moves=6, mesh=None,
    )
    assert hist[0]["moves"] <= 4 * 6
    assert hist[0]["winners"][0] == 4  # 6-ply 7x7 games can't be decided


@pytest.mark.slow
def test_train_loop_gumbel_search(tmp_path):
    """Full iteration with --mcts-search gumbel: gumbel self-play
    (completed-Q targets), training, and a gumbel eval arena."""
    hist = train_alphazero(
        game_name="gomoku", board_size=SIZE,
        num_iterations=1, games_per_iteration=4,
        n_simulations=16, buffer_size=2000, batch_size=32,
        epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=16,
        n_res_blocks=1, channels=8,
        model_dir=str(tmp_path / "m"), seed=5, verbose=False,
        mcts_search="gumbel", gumbel_max_considered=8, mesh=None,
    )
    assert hist[0]["moves"] > 0
    assert hist[0]["buffer_size"] > 0
    assert np.isfinite(hist[0]["loss"]["total_loss"])


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_gate_stat_ci_low_semantics(tmp_path):
    """gate_stat='ci_low' (default): promotion needs the Wilson lower
    bound above the threshold, and reset mode only resets on a CI fully
    BELOW the threshold — an inconclusive 2-game arena neither promotes
    nor discards the candidate's training progress."""
    import jax.numpy as jnp

    common = dict(
        game_name="gomoku", board_size=SIZE, num_iterations=1,
        games_per_iteration=2, n_simulations=8, buffer_size=512,
        batch_size=16, epochs_per_iter=1, temp_threshold=4,
        eval_games=2, eval_mcts_simulations=8,
        n_res_blocks=1, channels=8, seed=9, verbose=False, mesh=None,
    )

    def max_param_diff(path_a, path_b):
        a = AZModel(board_size=SIZE, n_res_blocks=1, channels=8)
        a.load(path_a)
        b = AZModel(board_size=SIZE, n_res_blocks=1, channels=8)
        b.load(path_b)
        return max(
            float(jnp.max(jnp.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(a.params),
                            jax.tree_util.tree_leaves(b.params))
        )

    # inconclusive at n=2 (Wilson CI spans any mid threshold): the
    # candidate must NOT be promoted, and must NOT be reset either —
    # its snapshot (the candidate) differs from best (the start net)
    d = str(tmp_path / "inconclusive")
    hist = train_alphazero(gate_mode="reset", gate_stat="ci_low",
                           win_rate_threshold=0.55, model_dir=d, **common)
    assert hist[0]["accepted"] is False
    lo, hi = hist[0]["win_rate_ci95"]
    assert lo < 0.55 < hi  # genuinely inconclusive at n=2
    assert max_param_diff(
        hist[0]["snapshot"], os.path.join(d, "best_latest.ckpt")) > 0

    # threshold 0.0: ci_low >= 0 always -> promoted; best tracks candidate
    d = str(tmp_path / "promote")
    hist = train_alphazero(gate_mode="reset", gate_stat="ci_low",
                           win_rate_threshold=0.0, model_dir=d, **common)
    assert hist[0]["accepted"] is True
    assert max_param_diff(
        hist[0]["snapshot"], os.path.join(d, "best_latest.ckpt")) == 0

    # reference parity lane: point estimate vs impossible threshold ->
    # reset on every miss (snapshot == best == start weights)
    d = str(tmp_path / "parity")
    hist = train_alphazero(gate_mode="reset", gate_stat="win_rate",
                           win_rate_threshold=2.0, model_dir=d, **common)
    assert hist[0]["accepted"] is False
    assert max_param_diff(
        hist[0]["snapshot"], os.path.join(d, "best_latest.ckpt")) == 0

    with pytest.raises(ValueError, match="gate_stat"):
        train_alphazero(gate_stat="bogus", model_dir=str(tmp_path / "x"),
                        **common)


def test_gate_decision_pure():
    """Fast-lane twin of test_gate_stat_ci_low_semantics: the promotion
    gate as a pure function (the slow test drives it through a real
    train_alphazero run)."""
    from alphazero_gomoku_tpu.selfplay.loop import gate_decision

    # ci_low: inconclusive CI spanning the threshold -> no action
    assert gate_decision("ci_low", 0.5, (0.2, 0.8), 0.55) == (False, False)
    # lower bound clears it -> promoted
    assert gate_decision("ci_low", 0.8, (0.66, 0.9), 0.55) == (True, False)
    # upper bound below it -> statistically worse, reset-worthy
    assert gate_decision("ci_low", 0.2, (0.1, 0.4), 0.55) == (False, True)
    # win_rate: reference point-estimate parity -> reset on any miss
    assert gate_decision("win_rate", 0.5, (0.3, 0.7), 0.55) == (False, True)
    assert gate_decision("win_rate", 0.6, (0.4, 0.8), 0.55) == (True, False)
    # skipped arena (eval_every) -> never promote, never reset
    assert gate_decision("ci_low", None, (None, None), 0.55,
                         run_arena=False) == (False, False)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="gate_stat"):
        gate_decision("bogus", 0.5, (0.4, 0.6), 0.5)
