"""MCTS driver over the packed node-row layout (Pallas tree kernels).

Drop-in alternative to :func:`search.tree.run_mcts_with_q` producing
bit-identical policies: the per-simulation select walk and backup run as
Pallas kernels (:mod:`alphazero_gomoku_tpu.ops.tree_kernels`) instead of
XLA gather/scatter loops, and the tree lives as ONE packed f32 array
``[B, n_nodes, row]`` instead of separate N/W/prior/children tensors.
Everything else — root evaluation + Dirichlet noise, the game-step on
expansion, leaf evaluation by the network, terminal handling — stays plain
XLA and is shared with the reference implementation in ``tree.py``.

Per simulation (all inside one ``lax.scan`` step, no host round-trips):
  1. ``select_walk`` kernel: PUCT walk to an unexpanded edge / terminal /
     depth cap; returns leaf, expansion action, and the walk path.
  2. XLA: gather the leaf's game state (one row per lane), ``env.step`` the
     expansion edge, write the new state at the lane-uniform ``slot``
     (dense dynamic-update-slice), evaluate the network on the new leaf.
  3. ``backup_paths`` kernel: writes the fresh node's row (signed priors +
     done flag — stats/children stay at the pre-move init) at ``slot``,
     then applies N/W updates along the recorded path with the per-hop
     perspective flip, linking ``slot`` into the parent's children segment
     on the expansion edge.  Composing the row in-kernel keeps every
     in-scan touch of the packed tree inside the custom-calls — an XLA
     row write forces a node-major layout cluster and a full-tree
     relayout copy per simulation (round-3 device trace: 0.37 ms/sim,
     >30% of simulation time).

Reference semantics: ``/root/reference/mcts/new_mcts_alpha.py:102-151``
(same citations as ``tree.py``; see that module's header for the conscious
deltas, all of which apply here unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.ops.tree_kernels import (
    backup_paths,
    packed_layout,
    select_walk,
)
from alphazero_gomoku_tpu.search.tree import (
    EvalFn,
    MCTSConfig,
    _signed_priors,
    root_signed_priors,
    terminal_leaf_value,
)


def _flat_board(st):
    """[..., H, W] board -> [..., H*W]: the node-state stack stores boards
    FLAT.  With the 4-D stack ``s8[B, N, H, W]`` XLA assigns the scan
    carry a batch-minor layout (for the per-sim gather/update) while
    ``env.step``/``encode`` consumers want row-major — and reconciles
    them with a whole-stack relayout copy EVERY simulation (round-2
    device trace: copy.127, 46 MB at 85 GB/s = 0.54 ms/sim, 25% of
    simulation time at batch 256).  A flat minor dim admits one layout
    for both uses; the per-lane reshape to [B, H, W] after the gather is
    on the small array."""
    b = st.board
    return st._replace(board=b.reshape(b.shape[:-2] + (-1,)))


def _unflat_board(st, h, w):
    b = st.board
    return st._replace(board=b.reshape(b.shape[:-1] + (h, w)))


def run_mcts_packed(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    root_states,
    move_numbers,
    rng: jax.Array,
    interpret: bool = None,
):
    """Batched MCTS on the packed layout: returns ``(pi [B, A], root_q [B])``.

    Matches :func:`tree.run_mcts_with_q` exactly (same PRNG stream, same
    f32 arithmetic, same argmax tie-breaking); differential-tested in
    ``tests/test_tree_kernels.py``.  ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU tests/debug) and Mosaic on TPU.
    """
    if interpret is None:
        # Mosaic-compile on accelerators (incl. the axon TPU plugin);
        # interpret on the CPU backend (tests/debug)
        interpret = jax.default_backend() == "cpu"
    batch = root_states.done.shape[0]
    a = env.num_actions
    n = cfg.node_capacity
    layout = packed_layout(a, n)
    s = layout.seg

    def compose_rows(signed_priors, done):
        """[B, A] signed priors + [B] done -> fresh packed rows [B, R]."""
        row = jnp.zeros((batch, layout.row), jnp.float32)
        row = row.at[:, 2 * s:2 * s + a].set(signed_priors)
        row = row.at[:, 3 * s:3 * s + a].set(-1.0)
        row = row.at[:, 4 * s].set(done.astype(jnp.float32))
        return row

    # --- states stack [B, N, ...] with the root at node 0 ----------------
    def stack_field(x):
        z = jnp.zeros((batch, n) + x.shape[1:], x.dtype)
        return z.at[:, 0].set(x)

    size = env.size
    states = jax.tree_util.tree_map(stack_field, _flat_board(root_states))

    # --- root priors (+ Dirichlet), same PRNG protocol as tree.py --------
    rng, sub = jax.random.split(rng)
    signed = root_signed_priors(env, cfg, eval_fn, net_params, root_states,
                                move_numbers, sub)

    packed = jnp.zeros((batch, layout.n_nodes, layout.row), jnp.float32)
    packed = packed.at[:, :, 3 * s:3 * s + a].set(-1.0)
    packed = packed.at[:, 0, :].set(compose_rows(signed, root_states.done))

    # --- simulations ------------------------------------------------------
    def one_sim(carry, sim_idx):
        packed, states = carry
        slot = sim_idx + 1

        leaf, action, pnodes, pacts, plen = select_walk(
            packed, layout, cfg.cpuct, cfg.depth_limit, interpret=interpret,
            fpu_parent=cfg.fpu_mode == "parent",
        )
        expanding = action >= 0
        safe_action = jnp.maximum(action, 0)

        parent_state = _unflat_board(jax.tree_util.tree_map(
            lambda x: jax.vmap(lambda xb, i: xb[i])(x, leaf), states
        ), size, size)
        child_state = jax.vmap(env.step)(parent_state, safe_action)
        # orphan slots (terminal/capped stops) get a copy of the stop node's
        # state; nothing ever links to them (tree._select_and_expand)
        write_state = jax.tree_util.tree_map(
            lambda c, p: jnp.where(
                expanding.reshape((-1,) + (1,) * (c.ndim - 1)), c, p
            ),
            child_state, parent_state,
        )
        states = jax.tree_util.tree_map(
            lambda st, ws: jax.vmap(
                lambda stb, wsb: jax.lax.dynamic_update_index_in_dim(
                    stb, wsb, slot, 0)
            )(st, ws),
            states, _flat_board(write_state),
        )

        obs = jax.vmap(env.encode)(write_state)
        probs, values = eval_fn(net_params, obs)
        probs = probs.reshape(batch, a)
        values = values.reshape(batch)

        terminal = write_state.done
        leaf_value = jnp.where(
            terminal,
            jax.vmap(lambda st: terminal_leaf_value(env, cfg, st))(
                write_state),
            values,
        ).astype(jnp.float32)

        legal = jax.vmap(env.legal_mask)(write_state).astype(probs.dtype)
        # the fresh slot row (signed priors + done flag) is written INSIDE
        # the backup kernel: any XLA update of `packed` in this scan body
        # drags the whole tree into a node-major layout cluster and costs
        # a full-tree relayout copy per simulation (see _backup_kernel)
        packed = backup_paths(
            packed, pnodes, pacts, plen, leaf_value,
            expanding.astype(jnp.int32), slot, layout,
            signed_priors=jax.vmap(_signed_priors)(probs, legal),
            done=write_state.done, interpret=interpret,
        )
        return (packed, states), None

    def one_macro(carry, step_idx):
        """k-leaves-per-sim (cfg.leaves_per_sim > 1): k select+virtual-loss
        passes, ONE [k*B] network call, k finalize passes — the packed
        mirror of tree.one_macro (same op order, bit-identical results;
        see ops/tree_kernels.backup_paths modes).  The j loops are
        ``lax.scan``s to keep the compiled program k-independent (an
        unrolled macro body blew the remote-compile budget at k=2,
        batch 128)."""
        packed, states = carry
        k = cfg.leaves_per_sim
        base_slot = step_idx * k + 1

        def select_j(carry, j):
            packed, states = carry
            slot = base_slot + j
            leaf, action, pnodes, pacts, plen = select_walk(
                packed, layout, cfg.cpuct, cfg.depth_limit,
                interpret=interpret,
                fpu_parent=cfg.fpu_mode == "parent")
            expanding = action >= 0
            safe_action = jnp.maximum(action, 0)
            parent_state = _unflat_board(jax.tree_util.tree_map(
                lambda x: jax.vmap(lambda xb, i: xb[i])(x, leaf), states),
                size, size)
            child_state = jax.vmap(env.step)(parent_state, safe_action)
            write_state = jax.tree_util.tree_map(
                lambda c, p: jnp.where(
                    expanding.reshape((-1,) + (1,) * (c.ndim - 1)), c, p),
                child_state, parent_state)
            states = jax.tree_util.tree_map(
                lambda st, ws: jax.vmap(
                    lambda stb, wsb: jax.lax.dynamic_update_index_in_dim(
                        stb, wsb, slot, 0)
                )(st, ws),
                states, _flat_board(write_state))
            legal = jax.vmap(env.legal_mask)(write_state).astype(jnp.float32)
            n_legal = jnp.maximum(
                jnp.sum(legal, axis=-1, keepdims=True), 1.0)
            placeholder = jnp.where(legal > 0, legal / n_legal, -1.0)
            packed = backup_paths(
                packed, pnodes, pacts, plen,
                jnp.zeros((batch,), jnp.float32),
                expanding.astype(jnp.int32), slot, layout,
                signed_priors=placeholder, done=write_state.done,
                interpret=interpret, mode="vl")
            return (packed, states), (pnodes, pacts, plen, expanding,
                                      write_state, legal)

        (packed, states), (pnodes_k, pacts_k, plen_k, expanding_k,
                           write_state_k, legal_k) = jax.lax.scan(
            select_j, (packed, states), jnp.arange(k, dtype=jnp.int32))

        obs = jax.vmap(lambda ws: jax.vmap(env.encode)(ws))(write_state_k)
        obs = obs.reshape((k * batch,) + obs.shape[2:])
        probs, values = eval_fn(net_params, obs)
        probs = probs.reshape(k, batch, a)
        values = values.reshape(k, batch)

        def finalize_j(packed, xs):
            (j, pnodes, pacts, plen, expanding, write_state, legal,
             probs_j, values_j) = xs
            leaf_value = jnp.where(
                write_state.done,
                jax.vmap(lambda st: terminal_leaf_value(env, cfg, st))(
                    write_state),
                values_j,
            ).astype(jnp.float32)
            packed = backup_paths(
                packed, pnodes, pacts, plen, leaf_value,
                expanding.astype(jnp.int32), base_slot + j, layout,
                signed_priors=jax.vmap(_signed_priors)(
                    probs_j, legal.astype(probs_j.dtype)),
                done=write_state.done, interpret=interpret,
                mode="finalize")
            return packed, None

        packed, _ = jax.lax.scan(
            finalize_j, packed,
            (jnp.arange(k, dtype=jnp.int32), pnodes_k, pacts_k, plen_k,
             expanding_k, write_state_k, legal_k, probs, values))
        return (packed, states), None

    if cfg.leaves_per_sim == 1:
        (packed, _), _ = jax.lax.scan(
            one_sim, (packed, states),
            jnp.arange(cfg.n_simulations, dtype=jnp.int32),
        )
    else:
        (packed, _), _ = jax.lax.scan(
            one_macro, (packed, states),
            jnp.arange(cfg.n_simulations // cfg.leaves_per_sim,
                       dtype=jnp.int32),
        )

    # --- visit-count policy + root value (as tree.run_mcts_with_q) -------
    counts = packed[:, 0, 0:a]
    totals = jnp.sum(counts, axis=-1, keepdims=True)
    legal01 = (packed[:, 0, 2 * s:2 * s + a] >= 0.0).astype(jnp.float32)
    uniform = legal01 / jnp.maximum(
        jnp.sum(legal01, axis=-1, keepdims=True), 1.0)
    pi = jnp.where(totals > 0, counts / jnp.maximum(totals, 1e-30), uniform)
    root_w = jnp.sum(packed[:, 0, s:s + a], axis=-1)
    root_q = root_w / jnp.maximum(totals[:, 0], 1.0)
    return pi, root_q
