"""Differential tests: Pallas packed-tree search == XLA reference search.

The Pallas backend (``search/tree_pallas.py`` + ``ops/tree_kernels.py``)
must reproduce ``tree.run_mcts_with_q`` EXACTLY: identical PRNG protocol,
f32 PUCT arithmetic, first-max argmax tie-breaking, and terminal/depth-cap
handling make the visit-count policies bit-equal.  Kernels run in Pallas
interpret mode on CPU (Mosaic-compilation coverage is exercised on real
TPU hardware; see DECISIONS.md perf notes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.games.pente import PenteEnv
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
from alphazero_gomoku_tpu.search.tree_pallas import run_mcts_packed

from test_mcts import fake_eval_jax  # integer-exact fake network (7x7)

SIZE = 7
A = SIZE * SIZE


def random_states(env, batch, plies, seed):
    """Advance a batch of games with random legal moves (host-driven)."""
    states = env.init_batch(batch)
    rng = np.random.default_rng(seed)
    for t in range(plies):
        legal = np.asarray(jax.vmap(env.legal_mask)(states))
        acts = np.array([
            rng.choice(np.flatnonzero(row)) if row.any() else 0
            for row in legal
        ], dtype=np.int32)
        states = jax.vmap(env.step_safe)(states, jnp.asarray(acts))
    return states


def both_backends(env, cfg, states, move_no, key):
    moves = jnp.full((states.done.shape[0],), move_no, jnp.int32)
    pi_x, q_x = jax.jit(
        lambda s, k: run_mcts_with_q(env, cfg, fake_eval_jax, None, s,
                                     moves, k)
    )(states, key)
    pi_p, q_p = jax.jit(
        lambda s, k: run_mcts_packed(env, cfg, fake_eval_jax, None, s,
                                     moves, k, interpret=True)
    )(states, key)
    return (np.asarray(pi_x), np.asarray(q_x),
            np.asarray(pi_p), np.asarray(q_p))


@pytest.mark.parametrize("plies,noise", [(0, False), (5, False), (9, True)])
def test_packed_matches_xla_gomoku(plies, noise):
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.25, add_noise=noise,
                     dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                     dirichlet_moves=6)
    states = random_states(env, 4, plies, seed=plies + 17)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=plies,
                                         key=jax.random.PRNGKey(plies))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)
    assert np.isfinite(pi_p).all()


@pytest.mark.parametrize("k", [2, 4])
def test_packed_matches_xla_kleaf(k):
    """k-leaves-per-sim virtual-loss search: packed backend (vl/finalize
    kernel modes) must equal the XLA k-leaf path bit-for-bit."""
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.25, add_noise=False,
                     leaves_per_sim=k)
    states = random_states(env, 4, 6, seed=31 + k)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=6,
                                         key=jax.random.PRNGKey(k))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)


@pytest.mark.slow  # heaviest single-CPU tests (durations audit)
def test_packed_matches_xla_kleaf_near_terminal():
    """k-leaf with terminal stops in the batch window (orphan slots +
    virtual-loss cancellation on terminal paths)."""
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=16, cpuct=1.25, add_noise=False,
                     leaves_per_sim=4)
    # drive games close to the end so terminals appear inside the search
    states = random_states(env, 4, 30, seed=9)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=30,
                                         key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)


def test_packed_matches_xla_fpu_parent():
    """fpu_mode='parent' (first-play urgency) in the select kernel must
    match the XLA path bit-for-bit."""
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.25, add_noise=False,
                     fpu_mode="parent")
    states = random_states(env, 4, 7, seed=41)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=7,
                                         key=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)


def test_packed_matches_xla_depth_capped():
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=32, cpuct=1.25, add_noise=False,
                     max_depth=3)
    states = random_states(env, 3, 4, seed=5)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=4,
                                         key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)


def test_packed_matches_xla_near_terminal():
    """Batches mixing live, nearly-won, and finished games."""
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.0, add_noise=False)
    states = env.init_batch(3)
    # lane 0: empty; lane 1: four-in-a-row threat; lane 2: finished game
    seqs = {
        1: [(3, 0), (0, 0), (3, 1), (0, 1), (3, 2), (0, 2), (3, 3), (0, 3)],
        2: [(3, 0), (0, 0), (3, 1), (0, 1), (3, 2), (0, 2), (3, 3), (0, 3),
            (3, 4)],
    }
    for lane, seq in seqs.items():
        st = env.init()
        for r, c in seq:
            st = env.step(st, jnp.int32(r * SIZE + c))
        states = jax.tree_util.tree_map(
            lambda full, one: full.at[lane].set(one), states, st
        )
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=8,
                                         key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)
    # sanity: the threatened lane must find the winning completion
    assert int(np.argmax(pi_p[1])) == 3 * SIZE + 4


@pytest.mark.slow
def test_packed_matches_xla_pente():
    env = PenteEnv(SIZE)
    cfg = MCTSConfig(n_simulations=16, cpuct=1.25, add_noise=True,
                     dirichlet_alpha=0.2, dirichlet_epsilon=0.25,
                     dirichlet_moves=8)
    states = random_states(env, 3, 6, seed=11)
    pi_x, q_x, pi_p, q_p = both_backends(env, cfg, states, move_no=6,
                                         key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(pi_x, pi_p)
    np.testing.assert_array_equal(q_x, q_p)

def test_lane_tile_override_is_bit_identical(monkeypatch):
    """AZG_LANE_TILE (ops/tree_kernels.LANE_TILE) only changes how many
    lanes share a grid step; a 2x tile over the same batch must produce
    bit-identical select-walk outputs (the envelope probe relies on it)."""
    import alphazero_gomoku_tpu.ops.tree_kernels as tk
    from alphazero_gomoku_tpu.ops.tree_kernels import (
        GROUP, SL_C, SL_N, SL_P, SL_W, packed_layout)

    rng = np.random.default_rng(0)
    a, n_nodes, b = 49, 32, 16
    lay = packed_layout(a, n_nodes)
    nodes = np.zeros((b, lay.n_nodes, GROUP, lay.seg), np.float32)
    nodes[:, :, SL_P, :] = -1.0
    nodes[:, :, SL_C, :] = -1.0
    nodes[:, 0, SL_P, :a] = rng.random((b, a), dtype=np.float32)
    for i in range(b):
        for c in range(1, 5):
            act = int(rng.integers(0, a))
            nodes[i, 0, SL_C, act] = c
            nodes[i, 0, SL_N, act] = float(rng.integers(1, 5))
            nodes[i, 0, SL_W, act] = float(rng.random() * 2 - 1)
            nodes[i, c, SL_P, :a] = rng.random(a, dtype=np.float32)
    packed = jnp.asarray(
        nodes.reshape(b, lay.n_nodes * GROUP, lay.seg))
    outs = {}
    for tile in (8, 16):
        monkeypatch.setattr(tk, "LANE_TILE", tile)
        outs[tile] = [np.asarray(x) for x in
                      tk.select_walk(packed, lay, 1.0, 6, interpret=True)]
    for x, y in zip(outs[8], outs[16]):
        np.testing.assert_array_equal(x, y)


