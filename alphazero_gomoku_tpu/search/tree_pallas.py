"""MCTS driver over the packed node-row layout (Pallas tree kernels).

Drop-in alternative to :func:`search.tree.run_mcts_with_q` producing
bit-identical policies: the per-simulation select walk and backup run as
Pallas kernels (:mod:`alphazero_gomoku_tpu.ops.tree_kernels`) instead of
XLA gather/scatter loops, and the tree lives as ONE packed f32 array
``[B, n_nodes * 8, seg]`` of per-node [8, seg] tiles instead of separate
N/W/prior/children tensors (segment map in ``ops/tree_kernels``).
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

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.ops.tree_kernels import (
    GROUP,
    SL_C,
    SL_META,
    SL_N,
    SL_P,
    SL_W,
    backup_paths,
    gumbel_select_walk,
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


def _init_packed(batch, layout):
    """Fresh packed tree [B, n_nodes * GROUP, seg]: zero stats, children -1.

    Node ``k`` owns sublane rows ``[k*GROUP, (k+1)*GROUP)``; the strided
    write hits every node's child sublane (``SL_C``) in one XLA op.  Runs
    once per move, outside the simulation scan (the per-sim tree writes
    all live inside the Pallas custom-calls — see ops/tree_kernels).
    """
    packed = jnp.zeros((batch, layout.n_nodes * GROUP, layout.seg),
                       jnp.float32)
    return packed.at[:, SL_C::GROUP, :].set(-1.0)


class PackedCarry(NamedTuple):
    """Packed tree + sidecar state threaded across moves for subtree reuse.

    ``parent``/``parent_action`` ([B, n_nodes] i32, -1 at roots/orphans)
    are maintained by the XLA glue (dense lane-uniform writes at the
    expansion slot — the packed rows themselves hold only child links)
    solely so :func:`packed_advance_root` can run the same parent-pointer
    reachability sweeps as ``tree._advance_root_single``.
    """

    packed: jax.Array
    states: Any          # flat-board node-state stack pytree
    parent: jax.Array
    parent_action: jax.Array


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
    pi, root_q, _ = run_mcts_packed_with_tree(
        env, cfg, eval_fn, net_params, move_numbers, rng,
        root_states=root_states, interpret=interpret)
    return pi, root_q


def run_mcts_packed_with_tree(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    move_numbers,
    rng: jax.Array,
    carry: Optional[PackedCarry] = None,
    root_states=None,
    interpret: bool = None,
):
    """Reuse-aware packed search: returns ``(pi, root_q, PackedCarry)``.

    Packed mirror of ``tree.run_mcts_with_tree``: with
    ``cfg.reuse_budget > 0`` thread the returned carry through
    :func:`packed_advance_root` between moves and pass it back in; fresh
    simulations then allocate slots from ``reuse_budget`` upward —
    lane-uniform because the compaction always renumbers survivors to the
    ``[0, reuse_budget)`` prefix, so the backup kernel's scalar-slot
    scheme carries over unchanged.  Root priors (and Dirichlet noise) are
    recomputed every move; the carried root row keeps its N/W statistics
    and child links.
    """
    if interpret is None:
        # Mosaic-compile on accelerators (incl. the axon TPU plugin);
        # interpret on the CPU backend (tests/debug)
        interpret = jax.default_backend() == "cpu"
    reuse = cfg.reuse_budget > 0
    if reuse and cfg.leaves_per_sim > 1:
        raise ValueError("subtree reuse is not supported with "
                         "leaves_per_sim > 1")
    if carry is not None and not reuse:
        raise ValueError("carry= requires cfg.reuse_budget > 0")
    a = env.num_actions
    n = cfg.node_capacity
    layout = packed_layout(a, n)
    size = env.size

    if carry is not None:
        packed, states, parent, pact_arr = carry
        if root_states is None:
            root_states = _unflat_board(
                jax.tree_util.tree_map(lambda x: x[:, 0], states),
                size, size)
        # else: caller-authoritative roots (the self-play runner passes its
        # own game states — identical to the carried roots for live lanes;
        # finished lanes carry junk trees whose pi is masked downstream)
        batch = root_states.done.shape[0]
        slot_base = cfg.reuse_budget
    else:
        if root_states is None:
            raise ValueError("need root_states for the first move")
        batch = root_states.done.shape[0]
        slot_base = 1

    # --- root priors (+ Dirichlet), same PRNG protocol as tree.py --------
    rng, sub = jax.random.split(rng)
    signed = root_signed_priors(env, cfg, eval_fn, net_params, root_states,
                                move_numbers, sub)

    if carry is None:
        # --- states stack [B, N, ...] with the root at node 0 ------------
        def stack_field(x):
            z = jnp.zeros((batch, n) + x.shape[1:], x.dtype)
            return z.at[:, 0].set(x)

        states = jax.tree_util.tree_map(stack_field,
                                        _flat_board(root_states))
        packed = _init_packed(batch, layout)
        parent = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
        pact_arr = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
    # refresh the root prior segment + done flag; N/W/children carry
    # (zeros/-1 on a fresh tree, so this doubles as the root compose)
    packed = packed.at[:, SL_P, :a].set(signed)
    packed = packed.at[:, SL_META, 0].set(
        root_states.done.astype(jnp.float32))

    # --- simulations ------------------------------------------------------
    def one_sim(carry, sim_idx):
        if reuse:
            packed, states, parent, pact_arr = carry
        else:
            packed, states = carry
        slot = sim_idx + slot_base

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
        if reuse:
            # sidecar parent pointers for packed_advance_root (dense
            # lane-uniform column writes; tiny next to the tree itself)
            parent = parent.at[:, slot].set(jnp.where(expanding, leaf, -1))
            pact_arr = pact_arr.at[:, slot].set(action)
            return (packed, states, parent, pact_arr), None
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
        if reuse:
            (packed, states, parent, pact_arr), _ = jax.lax.scan(
                one_sim, (packed, states, parent, pact_arr),
                jnp.arange(cfg.n_simulations, dtype=jnp.int32),
            )
        else:
            (packed, states), _ = jax.lax.scan(
                one_sim, (packed, states),
                jnp.arange(cfg.n_simulations, dtype=jnp.int32),
            )
    else:
        (packed, states), _ = jax.lax.scan(
            one_macro, (packed, states),
            jnp.arange(cfg.n_simulations // cfg.leaves_per_sim,
                       dtype=jnp.int32),
        )

    # --- visit-count policy + root value (as tree.run_mcts_with_q) -------
    # root = node 0, whose tile is sublane rows [0, GROUP): N at row SL_N,
    # W at SL_W, signed priors at SL_P
    counts = packed[:, SL_N, :a]
    totals = jnp.sum(counts, axis=-1, keepdims=True)
    legal01 = (packed[:, SL_P, :a] >= 0.0).astype(jnp.float32)
    uniform = legal01 / jnp.maximum(
        jnp.sum(legal01, axis=-1, keepdims=True), 1.0)
    pi = jnp.where(totals > 0, counts / jnp.maximum(totals, 1e-30), uniform)
    root_w = jnp.sum(packed[:, SL_W, :a], axis=-1)
    root_q = root_w / jnp.maximum(totals[:, 0], 1.0)
    return pi, root_q, PackedCarry(packed, states, parent, pact_arr)


# ----------------------------------------------------------------------
# Gumbel sequential halving on the packed layout
# ----------------------------------------------------------------------
def run_gumbel_packed(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    root_states,
    rng: jax.Array,
    interpret: bool = None,
):
    """Packed-kernel mirror of :func:`search.gumbel.run_gumbel_mcts`.

    Returns ``(pi_target [B, A], root_q [B], action [B])``.  Stateless:
    fresh tree per call even under a reuse config (mirroring
    ``run_mcts_packed``); the reuse-aware entry is
    :func:`run_gumbel_packed_with_tree`.
    """
    pi, root_q, action, _ = run_gumbel_packed_with_tree(
        env, cfg, eval_fn, net_params, rng, root_states=root_states,
        interpret=interpret)
    return pi, root_q, action


def run_gumbel_packed_with_tree(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    rng: jax.Array,
    carry: Optional[PackedCarry] = None,
    root_states=None,
    interpret: bool = None,
):
    """Gumbel sequential halving on the packed layout, reuse-aware.

    Same algorithm as :func:`search.gumbel.run_gumbel_mcts` (static
    halving schedule, forced root actions, the deterministic non-root
    rule, completed-Q targets) with the per-hop tree walk in
    :func:`ops.tree_kernels.gumbel_select_walk` and the shared backup
    kernel; the node value for the completed-Q mix rides the packed
    row's done segment (column ``4*seg + 1``).  Differential-tested
    against the XLA implementation (tests/test_gumbel.py).

    With ``cfg.reuse_budget > 0`` thread the returned carry through
    :func:`packed_advance_root` between moves exactly as the PUCT
    search does (same compaction; the value column rides the rows).
    Root priors AND the root value estimate are re-evaluated every
    move; carried N/W/children sharpen the halving's q_hat from the
    first simulation.  Returns ``(pi_target, root_q, action, carry)``.
    """
    from alphazero_gomoku_tpu.search.gumbel import halving_schedule
    from alphazero_gomoku_tpu.search.tree import (NEG_INF, _masked_priors,
                                                  terminal_leaf_value)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    reuse = cfg.reuse_budget > 0
    if carry is not None and not reuse:
        raise ValueError("carry= requires cfg.reuse_budget > 0")
    a = env.num_actions
    n = cfg.node_capacity
    layout = packed_layout(a, n)
    size = env.size
    m, phases = halving_schedule(cfg.n_simulations, cfg.gumbel_max_considered)

    if carry is not None:
        packed, states, parent, pact_arr = carry
        if root_states is None:
            root_states = _unflat_board(
                jax.tree_util.tree_map(lambda x: x[:, 0], states),
                size, size)
        batch = root_states.done.shape[0]
        slot_base = cfg.reuse_budget
    else:
        if root_states is None:
            raise ValueError("need root_states for the first move")
        batch = root_states.done.shape[0]
        slot_base = 1

    # --- root evaluation ------------------------------------------------
    obs = jax.vmap(env.encode)(root_states)
    probs, v0 = eval_fn(net_params, obs)
    probs = probs.reshape(batch, a)
    v0 = v0.reshape(batch).astype(jnp.float32)
    legal = jax.vmap(env.legal_mask)(root_states).astype(probs.dtype)
    priors = jax.vmap(_masked_priors)(probs, legal)
    signed = jnp.where(legal > 0, priors, -1.0)

    if carry is None:
        def stack_field(x):
            z = jnp.zeros((batch, n) + x.shape[1:], x.dtype)
            return z.at[:, 0].set(x)

        states = jax.tree_util.tree_map(stack_field,
                                        _flat_board(root_states))
        packed = _init_packed(batch, layout)
        parent = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
        pact_arr = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
    # refresh the root prior segment, done flag, and value estimate;
    # N/W/children carry over (zeros on a fresh tree).  Root = node 0 =
    # sublane rows [0, GROUP).
    packed = packed.at[:, SL_P, :a].set(signed)
    packed = packed.at[:, SL_META, 0].set(
        root_states.done.astype(jnp.float32))
    packed = packed.at[:, SL_META, 1].set(v0)

    logits = jnp.where(legal > 0, jnp.log(jnp.maximum(priors, 1e-30)),
                       NEG_INF)
    u = jax.random.uniform(rng, (batch, a), jnp.float32,
                           minval=1e-12, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    g = jnp.where(legal > 0, g, NEG_INF)
    _, ranked = jax.lax.top_k(g + logits, m)

    def root_score(packed):
        n_root = packed[:, SL_N, :a]
        w_root = packed[:, SL_W, :a]
        q_hat = w_root / jnp.maximum(n_root, 1.0)
        maxvisit = jnp.max(n_root, axis=-1, keepdims=True)
        sig = (cfg.gumbel_c_visit + maxvisit) * cfg.gumbel_c_scale * q_hat
        return jnp.where(n_root > 0, g + logits + sig, NEG_INF)

    sims_done = 0
    for m_k, visits in phases:
        n_phase = m_k * visits

        def one_round(sim_carry, r, m_k=m_k, sims_done=sims_done):
            """Round-parallel step: the round's m_k simulations force
            DISTINCT root actions (disjoint subtrees), so all m_k walks
            run in ONE kernel launch (``fan=m_k`` lanes per tree) and all
            leaf evals in ONE network call; the backups then replay in
            serial slot order.  Exactly serial-equivalent outside the
            endgame duplicate-candidate case (see
            MCTSConfig.gumbel_round_parallel)."""
            packed, states, parent, pact_arr = sim_carry
            cand = ranked[:, :m_k]                                # [B, k]
            cand_ok = jnp.take_along_axis(legal, cand, axis=1) > 0
            root_act = jnp.where(cand_ok, cand,
                                 ranked[:, :1]).astype(jnp.int32)
            leaf, action, pnodes, pacts, plen = gumbel_select_walk(
                packed, root_act.reshape(batch * m_k), layout,
                cfg.depth_limit, cfg.gumbel_c_visit, cfg.gumbel_c_scale,
                interpret=interpret, fan=m_k)
            leaf2 = leaf.reshape(batch, m_k)
            action2 = action.reshape(batch, m_k)
            expanding2 = action2 >= 0
            safe2 = jnp.maximum(action2, 0)

            parent_state = _unflat_board(jax.tree_util.tree_map(
                lambda x: jax.vmap(lambda xb, i: xb[i])(x, leaf2), states
            ), size, size)                                        # [B,k,..]
            child_state = jax.vmap(jax.vmap(env.step))(parent_state, safe2)
            write_state = jax.tree_util.tree_map(
                lambda c, p: jnp.where(
                    expanding2.reshape(
                        expanding2.shape + (1,) * (c.ndim - 2)), c, p),
                child_state, parent_state)

            obs = jax.vmap(jax.vmap(env.encode))(write_state)
            probs, values = eval_fn(
                net_params, obs.reshape((batch * m_k,) + obs.shape[2:]))
            probs = probs.reshape(batch, m_k, a)
            values = values.reshape(batch, m_k)

            terminal = write_state.done                           # [B, k]
            leaf_value = jnp.where(
                terminal,
                jax.vmap(jax.vmap(
                    lambda st: terminal_leaf_value(env, cfg, st)))(
                        write_state),
                values,
            ).astype(jnp.float32)
            child_legal = jax.vmap(jax.vmap(env.legal_mask))(
                write_state).astype(probs.dtype)
            signed_p = jax.vmap(jax.vmap(_signed_priors))(probs, child_legal)

            d = pnodes.shape[0]
            xs = (
                jnp.arange(m_k, dtype=jnp.int32),
                jnp.moveaxis(pnodes.reshape(d, batch, m_k), 2, 0),
                jnp.moveaxis(pacts.reshape(d, batch, m_k), 2, 0),
                plen.reshape(batch, m_k).T,
                leaf_value.T,
                expanding2.T,
                jnp.moveaxis(signed_p, 1, 0),
                terminal.T,
                jax.tree_util.tree_map(
                    lambda x: jnp.moveaxis(x, 1, 0),
                    _flat_board(write_state)),
                leaf2.T,
                action2.T,
            )

            def apply_col(inner, x):
                packed, states, parent, pact_arr = inner
                c, pn, pa, pln, lv, ex, sp, dn, ws, lf, ac = x
                slot = sims_done + r * m_k + c + slot_base
                packed = backup_paths(
                    packed, pn, pa, pln, lv, ex.astype(jnp.int32), slot,
                    layout, signed_priors=sp, done=dn, interpret=interpret,
                )
                states = jax.tree_util.tree_map(
                    lambda st, wsb: jax.vmap(
                        lambda stb, w1: jax.lax.dynamic_update_index_in_dim(
                            stb, w1, slot, 0)
                    )(st, wsb),
                    states, ws,
                )
                parent = parent.at[:, slot].set(jnp.where(ex, lf, -1))
                pact_arr = pact_arr.at[:, slot].set(ac)
                return (packed, states, parent, pact_arr), None

            inner, _ = jax.lax.scan(
                apply_col, (packed, states, parent, pact_arr), xs)
            return inner, None

        def one_sim(sim_carry, j):
            packed, states, parent, pact_arr = sim_carry
            slot = sims_done + j + slot_base
            col = j % m_k
            cand = ranked[:, col]
            cand_ok = jnp.take_along_axis(
                legal, cand[:, None], axis=1)[:, 0] > 0
            root_act = jnp.where(cand_ok, cand, ranked[:, 0]).astype(
                jnp.int32)

            leaf, action, pnodes, pacts, plen = gumbel_select_walk(
                packed, root_act, layout, cfg.depth_limit,
                cfg.gumbel_c_visit, cfg.gumbel_c_scale,
                interpret=interpret)
            expanding = action >= 0
            safe_action = jnp.maximum(action, 0)

            parent_state = _unflat_board(jax.tree_util.tree_map(
                lambda x: jax.vmap(lambda xb, i: xb[i])(x, leaf), states
            ), size, size)
            child_state = jax.vmap(env.step)(parent_state, safe_action)
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

            child_legal = jax.vmap(env.legal_mask)(write_state).astype(
                probs.dtype)
            packed = backup_paths(
                packed, pnodes, pacts, plen, leaf_value,
                expanding.astype(jnp.int32), slot, layout,
                signed_priors=jax.vmap(_signed_priors)(probs, child_legal),
                done=write_state.done, interpret=interpret,
            )
            # sidecar parent pointers for packed_advance_root (inert on
            # stateless searches; tiny next to the tree itself)
            parent = parent.at[:, slot].set(jnp.where(expanding, leaf, -1))
            pact_arr = pact_arr.at[:, slot].set(action)
            return (packed, states, parent, pact_arr), None

        if cfg.gumbel_round_parallel:
            (packed, states, parent, pact_arr), _ = jax.lax.scan(
                one_round, (packed, states, parent, pact_arr),
                jnp.arange(visits, dtype=jnp.int32))
        else:
            (packed, states, parent, pact_arr), _ = jax.lax.scan(
                one_sim, (packed, states, parent, pact_arr),
                jnp.arange(n_phase, dtype=jnp.int32))
        sims_done += n_phase

        # halve: keep the top half of the considered set by
        # g + logits + sigma(q_hat); scoring over the full action space
        # with -inf outside the set keeps this a plain top_k
        in_set = jnp.zeros((batch, a), jnp.bool_)
        in_set = in_set.at[
            jnp.arange(batch)[:, None], ranked[:, :m_k]].set(True)
        scores = jnp.where(in_set, root_score(packed), NEG_INF)
        _, ranked = jax.lax.top_k(scores, m)
        del in_set, scores

    action = ranked[:, 0].astype(jnp.int32)

    # --- outputs (completed-Q target, as the XLA implementation) --------
    n_root = packed[:, SL_N, :a]
    w_root = packed[:, SL_W, :a]
    q = w_root / jnp.maximum(n_root, 1.0)
    p = jnp.maximum(packed[:, SL_P, :a], 0.0)
    visited = n_root > 0.0
    p_vis = jnp.sum(jnp.where(visited, p, 0.0), axis=-1, keepdims=True)
    w_q = jnp.sum(jnp.where(visited, p * q, 0.0), axis=-1,
                  keepdims=True) / jnp.maximum(p_vis, 1e-8)
    sum_n = jnp.sum(n_root, axis=-1, keepdims=True)
    v_mix = (v0[:, None] + sum_n * w_q) / (1.0 + sum_n)
    v_mix = jnp.where(p_vis > 1e-8, v_mix, v0[:, None])
    comp_q = jnp.where(visited, q, v_mix)
    maxvisit = jnp.max(n_root, axis=-1, keepdims=True)
    sig = (cfg.gumbel_c_visit + maxvisit) * cfg.gumbel_c_scale * comp_q
    target_scores = jnp.where(legal > 0, logits + sig, NEG_INF)
    pi_target = jax.nn.softmax(target_scores, axis=-1)

    root_q = jnp.sum(w_root, axis=-1) / jnp.maximum(sum_n[:, 0], 1.0)
    return pi_target, root_q, action, PackedCarry(packed, states, parent,
                                                  pact_arr)


# ----------------------------------------------------------------------
# cross-move subtree reuse (packed layout)
# ----------------------------------------------------------------------
def packed_advance_root(env, cfg: MCTSConfig, carry: PackedCarry,
                        actions) -> PackedCarry:
    """Re-root each lane's packed tree at the played action and compact.

    Packed mirror of ``tree.advance_root`` (same (depth, old-index)
    keep-priority, same ``reuse_budget`` truncation, same fresh-root
    fallback for unexpanded actions), operating on whole packed rows:
    survivors are gathered to the ``[0, reuse_budget)`` prefix, the child
    links INSIDE the rows are renumbered, dropped rows become orphan rows
    (zero stats, children -1) exactly matching the fresh-region invariant
    the backup kernel's slot-row compose relies on.  Runs once per MOVE
    as plain XLA (one gather over the tree ~ a couple of ms), so the
    round-3 "no XLA writes to packed inside the sim scan" rule is not in
    play here.
    """
    if cfg.reuse_budget <= 0:
        raise ValueError("packed_advance_root requires cfg.reuse_budget > 0")
    a = env.num_actions
    layout = packed_layout(a, cfg.node_capacity)
    size = env.size

    def single(packed, states, parent, pact, action):
        cap = layout.n_nodes
        budget = cfg.reuse_budget
        idx = jnp.arange(cap, dtype=jnp.int32)
        # per-lane node view [cap, GROUP, seg] of the sublane-flat tree
        nodes = packed.reshape(cap, GROUP, layout.seg)
        r = nodes[0, SL_C, action].astype(jnp.int32)
        have = r >= 0
        r_safe = jnp.maximum(r, 0)

        psafe = jnp.maximum(parent, 0)
        reach0 = idx == r_safe
        depth0 = jnp.where(reach0, 0, cap).astype(jnp.int32)

        def sweep(c, _):
            reach, depth = c
            preach = reach[psafe] & (parent >= 0)
            nd = jnp.where(reach, depth,
                           jnp.where(preach, depth[psafe] + 1, cap))
            return (reach | preach, nd.astype(jnp.int32)), ()

        (reach, depth), _ = jax.lax.scan(
            sweep, (reach0, depth0), None,
            length=min(cfg.depth_limit, cap))

        big = jnp.int32(2) * cap * cap
        key = jnp.where(reach, depth * cap + idx, big)
        order = jnp.argsort(key).astype(jnp.int32)
        take = (key[order] < big) & (idx < budget)

        new_of_old = jnp.full((cap,), -1, jnp.int32).at[order].set(
            jnp.where(take, idx, -1).astype(jnp.int32))

        def remap(ptr):
            return jnp.where(ptr >= 0, new_of_old[jnp.maximum(ptr, 0)], -1)

        rows = nodes[order]                               # [cap, GROUP, seg]
        ch = remap(rows[:, SL_C, :].astype(jnp.int32))
        rows = rows.at[:, SL_C, :].set(ch.astype(jnp.float32))
        rows = jnp.where(take[:, None, None], rows, 0.0)
        # orphan/fresh node tiles must carry children = -1 (matching the
        # fresh-tree init the backup kernel's slot compose relies on)
        rows = rows.at[:, SL_C, :].set(
            jnp.where(take[:, None], rows[:, SL_C, :], -1.0))

        # the state stack has cfg.node_capacity rows, matching the node
        # count exactly; survivors all rank below
        # reuse_budget <= node_capacity
        n_stack = states.done.shape[0]
        order_s = order[:n_stack]
        take_s = take[:n_stack]
        new_states = jax.tree_util.tree_map(
            lambda x: jnp.where(
                take_s.reshape((-1,) + (1,) * (x.ndim - 1)), x[order_s],
                jnp.zeros_like(x)),
            states)
        new_parent = jnp.where(take, remap(parent[order]), -1).at[0].set(-1)
        new_pact = jnp.where(take, pact[order], -1).at[0].set(-1)

        # fresh fallback: the played action was never expanded
        root_state = _unflat_board(
            jax.tree_util.tree_map(lambda x: x[0], states), size, size)
        stepped = _flat_board(env.step(root_state, action))
        fresh_rows = jnp.zeros_like(rows)
        fresh_rows = fresh_rows.at[:, SL_C, :].set(-1.0)
        fresh_states = jax.tree_util.tree_map(
            lambda x, st: jnp.zeros_like(x).at[0].set(st),
            states, stepped)
        no_tree = jnp.full_like(new_parent, -1)

        pick = lambda yes, no: jnp.where(have, yes, no)
        out_states = jax.tree_util.tree_map(pick, new_states, fresh_states)
        out_rows = pick(rows, fresh_rows).reshape(cap * GROUP, layout.seg)
        return (out_rows, out_states,
                pick(new_parent, no_tree), pick(new_pact, no_tree))

    packed, states, parent, pact = jax.vmap(single)(
        carry.packed, carry.states, carry.parent, carry.parent_action,
        jnp.asarray(actions, jnp.int32))
    return PackedCarry(packed, states, parent, pact)


def init_packed_carry(env, cfg: MCTSConfig, root_states) -> PackedCarry:
    """Empty-tree carry for ``root_states``: searching with this carry is
    semantically identical to a fresh search (zero stats, children -1;
    node indices shift by ``reuse_budget - 1``, which PUCT never sees).
    Lets the self-play runner keep a structurally-fixed while_loop carry
    from move 0."""
    if cfg.reuse_budget <= 0:
        raise ValueError("init_packed_carry requires cfg.reuse_budget > 0")
    a = env.num_actions
    layout = packed_layout(a, cfg.node_capacity)
    batch = root_states.done.shape[0]
    n = cfg.node_capacity

    def stack_field(x):
        z = jnp.zeros((batch, n) + x.shape[1:], x.dtype)
        return z.at[:, 0].set(x)

    states = jax.tree_util.tree_map(stack_field, _flat_board(root_states))
    packed = _init_packed(batch, layout)
    parent = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
    pact = jnp.full((batch, layout.n_nodes), -1, jnp.int32)
    return PackedCarry(packed, states, parent, pact)
