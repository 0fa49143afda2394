"""Cross-move subtree reuse: advance_root mechanics + player integration.

The reference carries node statistics across moves via its state-keyed
dicts (new_mcts_alpha.py:60-64,190-197); the array tree re-roots and
compacts instead (tree.advance_root).  These tests pin the compaction
invariants (stat carry-over, pointer consistency, truncation, fresh
fallback) and that move-1 results are bit-identical to the fresh-search
path (reuse only changes LATER moves).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.search.tree import (advance_root, run_mcts_with_q,
                                              run_mcts_with_tree)

SIZE = 7
A = SIZE * SIZE


def peaked_eval(params, obs):
    b = obs.shape[0]
    logits = jnp.arange(A, dtype=jnp.float32) * 0.4
    return jax.nn.softmax(logits)[None, :].repeat(b, 0), jnp.full((b, 1), 0.1)


def _cfg(**kw):
    base = dict(n_simulations=32, reuse_budget=24, add_noise=False,
                backend="xla", max_depth=12)
    base.update(kw)
    return MCTSConfig(**base)


def _first_move(cfg, batch=2, seed=0):
    env = make_env("gomoku", SIZE)
    states = env.init_batch(batch)
    mn = jnp.zeros((batch,), jnp.int32)
    pi, q, trees = run_mcts_with_tree(env, cfg, peaked_eval, None, mn,
                                      jax.random.PRNGKey(seed),
                                      root_states=states)
    return env, states, mn, pi, trees


def _assert_pointer_consistent(trees, lane=0):
    ch = np.asarray(trees.children[lane])
    par = np.asarray(trees.parent[lane])
    pact = np.asarray(trees.parent_action[lane])
    for n in range(ch.shape[0]):
        for a in np.flatnonzero(ch[n] >= 0):
            c = ch[n, a]
            assert par[c] == n and pact[c] == a, (n, a, c)


def test_move1_identical_to_fresh_search():
    """reuse_budget changes nothing until a tree is actually carried."""
    env, states, mn, pi, _ = _first_move(_cfg())
    pi_fresh, _ = run_mcts_with_q(
        env, _cfg(reuse_budget=0), peaked_eval, None, states, mn,
        jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(pi_fresh))


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_advance_carries_child_stats_and_pointers():
    cfg = _cfg()
    env, states, mn, pi, trees = _first_move(cfg)
    acts = jnp.argmax(pi, -1).astype(jnp.int32)
    child = jax.vmap(lambda t, a: t.children[0, a])(trees, acts)
    assert int(jnp.min(child)) >= 0  # most-visited edge must be expanded
    old_rows = jax.vmap(lambda t, c: t.nw[c])(trees, child)
    adv = advance_root(env, cfg, trees, acts)
    np.testing.assert_allclose(np.asarray(adv.nw[:, 0]),
                               np.asarray(old_rows))
    # root state equals the stepped state
    stepped = jax.vmap(env.step)(states, acts)
    np.testing.assert_array_equal(np.asarray(adv.states.board[:, 0]),
                                  np.asarray(stepped.board))
    assert int(adv.parent[0, 0]) == -1
    _assert_pointer_consistent(adv)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_advance_truncates_to_budget():
    cfg = _cfg(n_simulations=64, reuse_budget=4, max_depth=16)
    env, states, mn, pi, trees = _first_move(cfg, batch=1)
    acts = jnp.argmax(pi, -1).astype(jnp.int32)
    adv = advance_root(env, cfg, trees, acts)
    # only slots [0, 4) may be live; everything above is orphaned
    live = np.asarray(adv.parent[0] >= 0) | (
        np.arange(adv.parent.shape[1]) == 0)
    assert live[: cfg.reuse_budget].sum() >= 1
    assert not live[cfg.reuse_budget:].any()
    _assert_pointer_consistent(adv)
    # children must never point at dropped slots
    ch = np.asarray(adv.children[0])
    assert ch.max() < cfg.reuse_budget


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_advance_unexpanded_action_falls_back_to_fresh():
    cfg = _cfg()
    env, states, mn, pi, trees = _first_move(cfg, batch=1)
    # pick a legal action whose child is unexpanded
    ch0 = np.asarray(trees.children[0, 0])
    unexp = int(np.flatnonzero(ch0 < 0)[0])
    adv = advance_root(env, cfg, trees, jnp.asarray([unexp], jnp.int32))
    assert float(jnp.sum(adv.nw[0, 0])) == 0.0  # no stats to carry
    stepped = jax.vmap(env.step)(states, jnp.asarray([unexp], jnp.int32))
    np.testing.assert_array_equal(np.asarray(adv.states.board[:, 0]),
                                  np.asarray(stepped.board))
    assert int(jnp.max(adv.children[0])) == -1  # root-only tree


def test_resumed_search_accumulates_root_visits():
    cfg = _cfg()
    env, states, mn, pi, trees = _first_move(cfg)
    acts = jnp.argmax(pi, -1).astype(jnp.int32)
    adv = advance_root(env, cfg, trees, acts)
    carried = float(jnp.sum(adv.nw[0, 0, :A]))
    pi2, q2, trees2 = run_mcts_with_tree(
        env, cfg, peaked_eval, None, mn + 1, jax.random.PRNGKey(1),
        trees=adv)
    total = float(jnp.sum(trees2.nw[0, 0, :A]))
    assert total == pytest.approx(carried + cfg.n_simulations)
    assert float(jnp.min(jnp.sum(pi2, -1))) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_player_reuses_tree_across_moves():
    from alphazero_gomoku_tpu.players.alpha_base import AlphaZeroPlayer

    p = AlphaZeroPlayer(rules="gomoku", board_size=SIZE, n_simulations=16,
                        n_res_blocks=1, channels=8, tactical_guard=False,
                        tree_reuse=True)
    board = np.zeros((SIZE, SIZE), np.int8)
    mv = p.play(board, 0, None)
    assert board[mv] == 0
    board[mv] = 1
    assert p._trees is not None
    # opponent replies; the player should resume (not fresh-search)
    empty = np.argwhere(board == 0)
    board[tuple(empty[0])] = 2
    resumed = p._resume_trees_from_board(board, 1)
    assert resumed is not None
    mv2 = p.play(board, 2, tuple(empty[0]))
    assert board[mv2] == 0


@pytest.mark.slow  # heaviest single-CPU tests (durations audit)
def test_packed_reuse_matches_xla_backend():
    """Packed-backend reuse (interpret mode) is bit-identical to the XLA
    backend across an advance: same pi at move 1, after advancing through
    the same action, and at the resumed move 2."""
    from alphazero_gomoku_tpu.search.tree_pallas import (
        packed_advance_root, run_mcts_packed_with_tree)

    env = make_env("gomoku", SIZE)
    cfg = _cfg(n_simulations=24, reuse_budget=16)
    batch = 8  # packed kernels need >= 8 lanes
    states = env.init_batch(batch)
    mn = jnp.zeros((batch,), jnp.int32)
    key1, key2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    pi_x, q_x, trees = run_mcts_with_tree(env, cfg, peaked_eval, None, mn,
                                          key1, root_states=states)
    pi_p, q_p, carry = run_mcts_packed_with_tree(
        env, cfg, peaked_eval, None, mn, key1, root_states=states,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(pi_x), np.asarray(pi_p))

    acts = jnp.argmax(pi_x, -1).astype(jnp.int32)
    trees2 = advance_root(env, cfg, trees, acts)
    carry2 = packed_advance_root(env, cfg, carry, acts)
    # carried root rows agree: N/W of the new root
    A = SIZE * SIZE
    # node-as-group layout: root tile = sublane rows [0, 8); N at row
    # SL_N (0), W at row SL_W (1)
    from alphazero_gomoku_tpu.ops.tree_kernels import SL_N, SL_W
    np.testing.assert_allclose(np.asarray(carry2.packed[:, SL_N, 0:A]),
                               np.asarray(trees2.nw[:, 0, :A]))
    np.testing.assert_allclose(np.asarray(carry2.packed[:, SL_W, 0:A]),
                               np.asarray(trees2.nw[:, 0, A:]))

    pi_x2, _, _ = run_mcts_with_tree(env, cfg, peaked_eval, None, mn + 1,
                                     key2, trees=trees2)
    pi_p2, _, _ = run_mcts_packed_with_tree(
        env, cfg, peaked_eval, None, mn + 1, key2, carry=carry2,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(pi_x2), np.asarray(pi_p2))


def test_selfplay_runner_with_reuse():
    """play_games threads the packed tree across moves (reuse on) and
    produces valid trajectories; reuse off stays bit-identical to before."""
    import dataclasses
    import functools
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
    from alphazero_gomoku_tpu.selfplay.runner import play_games

    env = make_env("gomoku", SIZE)
    base = SelfPlayConfig(
        batch_games=8, temp_threshold=4,
        mcts=MCTSConfig(n_simulations=12, max_depth=10, backend="pallas",
                        reuse_budget=8),
    )
    cfg = dataclasses.replace(base, max_moves=16)
    traj = jax.jit(functools.partial(play_games, env, cfg, peaked_eval))(
        None, jax.random.PRNGKey(5))
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    moves = int(np.asarray(traj.moves_played).sum())
    assert moves > 0
    # recorded policies on active plies are proper distributions
    sums = pis[active].sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)

    with pytest.raises(ValueError, match="reuse"):
        bad = dataclasses.replace(
            base, max_moves=8,
            mcts=MCTSConfig(n_simulations=12, backend="xla",
                            reuse_budget=8))
        play_games(env, bad, peaked_eval, None, jax.random.PRNGKey(0))
