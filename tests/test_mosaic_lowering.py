"""Mosaic (TPU) lowering checks that run WITHOUT TPU hardware.

Pallas interpret mode (the rest of the CPU test lane) runs the kernel
*semantics* but never invokes the Mosaic compiler, so a whole class of
real-compiler failures survives the suite and only explodes on device:
dynamic-offset VMEM indexing, jnp-constant `pl.ds` starts ("Too many
leaves for PyTreeDef" — the round-4 pipeline bug this file was written
for), unsupported broadcasts, scoped-VMEM overflows at lowering time.

``jax.export`` cross-platform lowering runs the full TPU lowering
pipeline — including Mosaic MLIR emission for every pallas_call — on the
CPU-only test runner.  It does NOT run the Mosaic→machine-code backend
compile (that needs the real toolchain), but every kernel-structure
error observed so far fails at the stage this covers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_gomoku_tpu.ops import tree_kernels as tk

SIZE = 7
A = SIZE * SIZE


def lower_for_tpu(fn, *args):
    """Raise if the TPU lowering (incl. Mosaic emission) fails."""
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


def chain_tree(b, depth, layout):
    nodes = np.zeros((layout.n_nodes, tk.GROUP, layout.seg), np.float32)
    nodes[:, tk.SL_P, :] = -1.0
    nodes[:, tk.SL_C, :] = -1.0
    nodes[: depth + 1, tk.SL_P, 0] = 1.0
    nodes[:depth, tk.SL_C, 0] = np.arange(1, depth + 1)
    nodes[: depth + 1, tk.SL_N, 0] = 1.0
    rows = nodes.reshape(layout.n_nodes * tk.GROUP, layout.seg)
    return jnp.asarray(np.broadcast_to(rows, (b,) + rows.shape).copy())


@pytest.fixture(scope="module")
def layout():
    return tk.packed_layout(A, 32)


@pytest.fixture(scope="module")
def packed(layout):
    return chain_tree(8, 4, layout)


def test_select_walk_lowers(layout, packed):
    lower_for_tpu(lambda p: tk.select_walk(p, layout, 1.25, 8), packed)


def test_select_walk_fpu_parent_lowers(layout, packed):
    lower_for_tpu(
        lambda p: tk.select_walk(p, layout, 1.25, 8, fpu_parent=True),
        packed)


def test_gumbel_walk_lowers(layout, packed):
    b = packed.shape[0]
    roots = jnp.zeros((b,), jnp.int32)
    lower_for_tpu(
        lambda p, r: tk.gumbel_select_walk(p, r, layout, 8, 50.0, 1.0),
        packed, roots)


@pytest.mark.parametrize("mode", ["backup", "vl", "finalize"])
def test_backup_paths_lowers(layout, packed, mode):
    b = packed.shape[0]
    d = 8
    lower_for_tpu(
        lambda p: tk.backup_paths(
            p,
            jnp.zeros((d, b), jnp.int32), jnp.zeros((d, b), jnp.int32),
            jnp.full((b,), 2, jnp.int32), jnp.full((b,), 0.25, jnp.float32),
            jnp.ones((b,), jnp.int32), jnp.int32(5), layout,
            jnp.full((b, A), 0.1, jnp.float32), jnp.zeros((b,), jnp.float32),
            mode=mode),
        packed)


def test_full_packed_search_lowers():
    """The whole jitted packed-search program (walk + eval + backup +
    glue) lowers for TPU — the closest CPU-side stand-in for the
    on-device compile of the production self-play step."""
    from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.search.tree_pallas import run_mcts_packed
    from test_mcts import fake_eval_jax

    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=12, add_noise=False, backend="pallas")
    states = env.init_batch(8)
    moves = jnp.zeros((8,), jnp.int32)
    lower_for_tpu(
        lambda s, k: run_mcts_packed(env, cfg, fake_eval_jax, None, s,
                                     moves, k, interpret=False),
        states, jax.random.PRNGKey(0))
