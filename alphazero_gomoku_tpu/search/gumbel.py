"""Gumbel AlphaZero search: sequential halving at the root (opt-in).

Implements "Policy improvement by planning with Gumbel" (Danihelka,
Guez, Schrittwieser, Silver, ICLR 2022 — the search mctx ships as
``gumbel_muzero_policy``), from the paper, on this package's array tree:

  - **Root**: sample one Gumbel ``g(a)`` per action and consider the
    ``m = gumbel_max_considered`` actions with the highest
    ``g + logits``.  Run *sequential halving*: give every considered
    action an equal share of the simulation budget, then keep the top
    half by ``g + logits + sigma(q_hat)`` and repeat until one action
    remains — that action is the move to PLAY.  Planning with Gumbel
    gives a policy-improvement guarantee at ANY simulation budget (the
    paper's headline: strong play at a handful of sims per move, where
    PUCT+Dirichlet needs hundreds), which is the framework's main lever
    toward the BASELINE.md north-star throughput: equal strength at k
    times fewer simulations is k times more moves/s.
  - **Policy target**: ``softmax(logits + sigma(completedQ))`` over legal
    actions — the paper's improved policy over ALL actions (visited
    actions use their backed-up Q, unvisited ones the node's mixed value
    estimate), NOT the visit-count distribution.
  - **Non-root selection** is deterministic:
    ``argmax_a pi'(a) - N(a) / (1 + sum_b N(b))`` with
    ``pi' = softmax(logits + sigma(completedQ))`` — in expectation it
    tracks pi' without any sampling.
  - ``sigma(q) = (c_visit + max_b N(b)) * c_scale * q`` (paper eq. 8).

No Dirichlet noise anywhere: move exploration comes from the per-move
Gumbel sample at the root.  Search statistics live in the same
:class:`~alphazero_gomoku_tpu.search.tree.Tree` arrays as the PUCT
search (plus the per-node ``value`` field for the completed-Q mix), the
expansion/backup path is shared (``_apply_eval_and_backup``), and the
whole search is one XLA program (a static Python loop over the halving
phases, each a ``lax.scan`` over its simulations).

Opt-in via ``MCTSConfig(search="gumbel")``; XLA tree ops only (the
packed Pallas kernels hard-code the PUCT walk).  Reference comparison:
the upstream engine (``/root/reference/mcts/new_mcts_alpha.py``) has no
Gumbel mode — this is a capability the TPU framework adds on top of
reference parity, A/B-able against PUCT via ``tools/gumbel_ab.py``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.search.tree import (
    EvalFn,
    MCTSConfig,
    NEG_INF,
    Tree,
    _apply_eval_and_backup,
    _masked_priors,
    _node_state,
    _write_node,
    init_tree,
)


def halving_schedule(n_simulations: int,
                     max_considered: int) -> Tuple[int, List[Tuple[int, int]]]:
    """Static sequential-halving plan for a budget of ``n_simulations``.

    Returns ``(m, [(m_k, visits_per_action), ...])`` where ``m`` is the
    number of root actions actually considered (``max_considered``
    halved until the minimal halving run ``m + m/2 + ... + 2`` fits the
    budget) and each phase gives every surviving action
    ``visits_per_action`` simulations.  Leftover budget goes to the last
    phase (the paper spends any remainder on the final comparison, where
    Q resolution matters most).  Total simulations never exceed
    ``n_simulations``.
    """
    if n_simulations < 2:
        raise ValueError("gumbel search needs n_simulations >= 2")
    m = max(2, max_considered)
    while sum(_halving_ms(m)) > n_simulations and m > 2:
        m //= 2
    ms = _halving_ms(m)
    phases = len(ms)
    per = [max(1, n_simulations // (phases * mk)) for mk in ms]
    used = sum(p * mk for p, mk in zip(per, ms))
    left = n_simulations - used
    if left > 0:
        per[-1] += left // ms[-1]
    return m, list(zip(ms, per))


def _halving_ms(m: int) -> List[int]:
    ms = []
    while m >= 2:
        ms.append(m)
        m //= 2
    return ms


def _sigma(q: jnp.ndarray, n_row: jnp.ndarray, cfg: MCTSConfig):
    """Monotone Q transform, paper eq. 8: (c_visit + max N) * c_scale * q."""
    maxvisit = jnp.max(n_row)
    return (cfg.gumbel_c_visit + maxvisit) * cfg.gumbel_c_scale * q


def _completed_q(tree: Tree, node, cfg: MCTSConfig):
    """Per-action completed Q at ``node`` (paper §4): visited actions use
    their backed-up mean, unvisited ones the node's MIXED value estimate
    — an interpolation of the node's own network value with the
    prior-weighted mean Q of its visited children (mctx's
    ``qtransform_completed_by_mix_value``)."""
    a = tree.prior.shape[-1]
    nw = tree.nw[node]
    n, w = nw[:a], nw[a:]
    q = w / jnp.maximum(n, 1.0)
    p = jnp.maximum(tree.prior[node], 0.0)
    visited = n > 0.0
    p_visited = jnp.sum(jnp.where(visited, p, 0.0))
    w_q = jnp.sum(jnp.where(visited, p * q, 0.0)) / jnp.maximum(
        p_visited, 1e-8)
    sum_n = jnp.sum(n)
    v_mix = (tree.value[node] + sum_n * w_q) / (1.0 + sum_n)
    # with no visited children the prior-weighted mean is undefined; fall
    # back to the node's own value
    v_mix = jnp.where(p_visited > 1e-8, v_mix, tree.value[node])
    return jnp.where(visited, q, v_mix)


def _node_logits(tree: Tree, node):
    """log-prior logits (shift-invariant) with illegality at -inf."""
    p_signed = tree.prior[node]
    logits = jnp.log(jnp.maximum(p_signed, 1e-30))
    return jnp.where(p_signed >= 0.0, logits, NEG_INF)


def _improved_policy(tree: Tree, node, cfg: MCTSConfig):
    """pi' = softmax(logits + sigma(completedQ)) over legal actions."""
    a = tree.prior.shape[-1]
    n_row = tree.nw[node][:a]
    comp_q = _completed_q(tree, node, cfg)
    logits = _node_logits(tree, node)
    scores = jnp.where(logits > NEG_INF / 2,
                       logits + _sigma(comp_q, n_row, cfg), NEG_INF)
    return jax.nn.softmax(scores)


def _gumbel_walk(cfg: MCTSConfig, tree: Tree, root_action):
    """Read-only walk: forced root hop, then the deterministic non-root
    rule ``argmax pi'(a) - N(a)/(1 + sum N)``.  Returns ``(node, action)``
    — the stop node and the edge to expand (-1 on terminal/depth stops).
    """

    def cond(carry):
        _, _, stop, _ = carry
        return ~stop

    def body(carry):
        node, _, _, depth = carry
        done = tree.states.done[node]
        capped = depth >= cfg.depth_limit
        is_root = depth == 0
        a = tree.prior.shape[-1]
        n_row = tree.nw[node][:a]
        pi_prime = _improved_policy(tree, node, cfg)
        scores = pi_prime - n_row / (1.0 + jnp.sum(n_row))
        scores = jnp.where(tree.prior[node] >= 0.0, scores, NEG_INF)
        action = jnp.where(is_root, root_action,
                           jnp.argmax(scores).astype(jnp.int32))
        child = tree.children[node, action]
        stop_here = done | capped | (child == -1)
        nxt = jnp.where(stop_here, node, child)
        return (nxt, jnp.where(done | capped, -1, action), stop_here,
                depth + 1)

    node, action, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(-1), jnp.bool_(False),
                     jnp.int32(0))
    )
    return node, action


def _gumbel_link(tree: Tree, node, action, slot, write_state):
    """Write ``write_state`` at ``slot`` and link it under ``(node,
    action)`` when expanding (shared by the serial and round-parallel
    paths; orphan slots on terminal stops keep parent -1)."""
    expanding = action >= 0
    safe_action = jnp.maximum(action, 0)
    tree = _write_node(tree, slot, write_state)
    tree = tree._replace(
        children=tree.children.at[node, safe_action].set(
            jnp.where(expanding, slot, tree.children[node, safe_action])
        ),
        parent=tree.parent.at[slot].set(jnp.where(expanding, node, -1)),
        parent_action=tree.parent_action.at[slot].set(action),
    )
    return tree, jnp.where(expanding, slot, node)


def _gumbel_select_and_expand(env, cfg: MCTSConfig, tree: Tree, slot,
                              root_action):
    """Forced root hop, then the deterministic non-root walk; allocate.

    Mirrors ``tree._select_and_expand``'s expansion mechanics (orphan
    slots on terminal stops, depth cap as leaf) with the Gumbel non-root
    rule instead of PUCT.
    """
    node, action = _gumbel_walk(cfg, tree, root_action)
    expanding = action >= 0
    safe_action = jnp.maximum(action, 0)
    parent_state = _node_state(tree, node)
    child_state = env.step(parent_state, safe_action)
    child_legal = env.legal_mask(child_state)
    write_state = jax.tree_util.tree_map(
        lambda x, y: jnp.where(expanding, x, y), child_state, parent_state
    )
    tree, leaf = _gumbel_link(tree, node, action, slot, write_state)
    return tree, leaf, child_legal


def _gumbel_apply(env, cfg: MCTSConfig, tree: Tree, node, action, slot,
                  write_state, probs, value, child_legal) -> Tree:
    """Apply one precomputed simulation: link ``write_state`` at ``slot``
    under ``(node, action)``, then store priors and back up (the
    round-parallel path's sequential half — the walk, ``env.step``, and
    the network eval already ran batched across the round)."""
    tree, leaf = _gumbel_link(tree, node, action, slot, write_state)
    return _apply_eval_and_backup(env, cfg, tree, leaf, slot, probs, value,
                                  child_legal)


def run_gumbel_mcts(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    root_states,
    rng: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched Gumbel search: ``(pi_target [B, A], root_q [B], action [B])``.

    ``pi_target`` is the paper's improved policy (the training target);
    ``action`` is the sequential-halving winner (``argmax g + logits +
    sigma(q_hat)`` among the final survivors) — the move self-play should
    PLAY (exploration lives in the Gumbel sample, so no temperature
    sampling and no Dirichlet noise apply); ``root_q`` is the mean
    backed-up root value, as :func:`tree.run_mcts_with_q`.
    """
    batch = root_states.done.shape[0]
    if cfg.backend == "pallas" and batch >= 8:
        # packed-kernel walk (ops/tree_kernels.gumbel_select_walk);
        # differential-tested against the XLA implementation below
        from alphazero_gomoku_tpu.search.tree_pallas import (
            run_gumbel_packed,
        )
        return run_gumbel_packed(env, cfg, eval_fn, net_params,
                                 root_states, rng)
    a = env.num_actions
    m, phases = halving_schedule(cfg.n_simulations, cfg.gumbel_max_considered)

    trees = jax.vmap(lambda s: init_tree(env, cfg, s))(root_states)

    # --- root evaluation: priors, logits, value ------------------------
    obs = jax.vmap(env.encode)(root_states)
    probs, v0 = eval_fn(net_params, obs)
    probs = probs.reshape(batch, a)
    v0 = v0.reshape(batch)
    legal = jax.vmap(env.legal_mask)(root_states).astype(probs.dtype)
    priors = jax.vmap(_masked_priors)(probs, legal)
    signed = jnp.where(legal > 0, priors, -1.0)
    trees = trees._replace(
        prior=trees.prior.at[:, 0, :].set(signed),
        value=trees.value.at[:, 0].set(v0.astype(jnp.float32)),
    )
    logits = jnp.where(legal > 0, jnp.log(jnp.maximum(priors, 1e-30)),
                       NEG_INF)

    # --- Gumbel top-m consideration set --------------------------------
    u = jax.random.uniform(rng, (batch, a), jnp.float32,
                           minval=1e-12, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    g = jnp.where(legal > 0, g, NEG_INF)
    _, ranked = jax.lax.top_k(g + logits, m)      # [B, m] action indices

    def root_score(trees, ranked_width):
        """g + logits + sigma(q_hat) over the whole action space, -inf on
        root actions with zero visits (can only be illegal-padding slots
        of the consideration set, which halving must shed first)."""
        n_root = trees.nw[:, 0, :a]
        w_root = trees.nw[:, 0, a:]
        q_hat = w_root / jnp.maximum(n_root, 1.0)
        sig = jax.vmap(lambda q, n: _sigma(q, n, cfg))(q_hat, n_root)
        s = g + logits + sig
        return jnp.where(n_root > 0, s, NEG_INF)

    # --- sequential halving ---------------------------------------------
    sims_done = 0
    for m_k, visits in phases:
        n_phase = m_k * visits

        def one_round(carry, r, m_k=m_k, sims_done=sims_done):
            """One round-parallel step: the round's m_k simulations force
            DISTINCT root actions, so their walks/evals are independent
            of each other's writes (disjoint subtrees) and batch into one
            network call; the tree updates then replay in serial slot
            order.  See MCTSConfig.gumbel_round_parallel for the endgame
            duplicate-candidate caveat."""
            trees, ranked_k = carry
            cand = ranked_k[:, :m_k]                              # [B, k]
            cand_ok = jnp.take_along_axis(legal, cand, axis=1) > 0
            root_act = jnp.where(cand_ok, cand,
                                 ranked_k[:, :1]).astype(jnp.int32)
            node, action = jax.vmap(lambda t, ra: jax.vmap(
                lambda r1: _gumbel_walk(cfg, t, r1))(ra)
            )(trees, root_act)                                    # [B, k]
            expanding = action >= 0
            safe = jnp.maximum(action, 0)
            parent_state = jax.vmap(lambda t, nn: jax.vmap(
                lambda n1: _node_state(t, n1))(nn))(trees, node)
            child_state = jax.vmap(jax.vmap(env.step))(parent_state, safe)
            child_legal = jax.vmap(jax.vmap(env.legal_mask))(child_state)
            write_state = jax.tree_util.tree_map(
                lambda c, p: jnp.where(
                    expanding.reshape(
                        expanding.shape + (1,) * (c.ndim - 2)), c, p),
                child_state, parent_state)
            obs = jax.vmap(jax.vmap(env.encode))(write_state)     # [B,k,..]
            probs, values = eval_fn(
                net_params, obs.reshape((batch * m_k,) + obs.shape[2:]))
            probs = probs.reshape(batch, m_k, a)
            values = values.reshape(batch, m_k)

            xs = (
                jnp.arange(m_k, dtype=jnp.int32),
                node.T, action.T,
                jax.tree_util.tree_map(
                    lambda x: jnp.moveaxis(x, 1, 0), write_state),
                jnp.moveaxis(probs, 1, 0), values.T,
                jnp.moveaxis(child_legal.astype(probs.dtype), 1, 0),
            )

            def apply_col(trees, x):
                c, nd, act, ws, pr, vl, cl = x
                slot = sims_done + r * m_k + c + 1
                trees = jax.vmap(
                    lambda t, n1, a1, w1, p1, v1, l1: _gumbel_apply(
                        env, cfg, t, n1, a1, slot, w1, p1, v1, l1)
                )(trees, nd, act, ws, pr, vl, cl)
                return trees, None

            trees, _ = jax.lax.scan(apply_col, trees, xs)
            return (trees, ranked_k), None

        def one_sim(carry, j):
            trees, ranked_k = carry
            slot = sims_done + j + 1
            # round-robin over the m_k survivors; lanes with fewer legal
            # actions than m_k fall back to their top-ranked action (the
            # padded slots carry -inf scores and shed at the next halve)
            col = j % m_k
            cand = ranked_k[:, col]
            cand_ok = jnp.take_along_axis(
                legal, cand[:, None], axis=1)[:, 0] > 0
            root_act = jnp.where(cand_ok, cand, ranked_k[:, 0]).astype(
                jnp.int32)
            trees, leaves, child_legal = jax.vmap(
                lambda t, r: _gumbel_select_and_expand(env, cfg, t, slot, r)
            )(trees, root_act)
            obs = jax.vmap(
                lambda t, l: env.encode(_node_state(t, l)))(trees, leaves)
            probs, values = eval_fn(net_params, obs)
            probs = probs.reshape(batch, a)
            values = values.reshape(batch)
            trees = jax.vmap(
                lambda t, l, p, v, cl: _apply_eval_and_backup(
                    env, cfg, t, l, slot, p, v, cl)
            )(trees, leaves, probs, values, child_legal)
            return (trees, ranked_k), None

        if cfg.gumbel_round_parallel:
            (trees, _), _ = jax.lax.scan(
                one_round, (trees, ranked),
                jnp.arange(visits, dtype=jnp.int32))
        else:
            (trees, _), _ = jax.lax.scan(
                one_sim, (trees, ranked),
                jnp.arange(n_phase, dtype=jnp.int32))
        sims_done += n_phase

        # halve: keep the top m_k//2 of the considered set by
        # g + logits + sigma(q_hat).  Scoring over the full action space
        # with -inf outside the considered set keeps this a plain top_k.
        keep = max(1, m_k // 2)
        in_set = jnp.zeros((batch, a), jnp.bool_)
        in_set = in_set.at[
            jnp.arange(batch)[:, None], ranked[:, :m_k]].set(True)
        scores = jnp.where(in_set, root_score(trees, m_k), NEG_INF)
        _, ranked = jax.lax.top_k(scores, m)      # re-ranked, width m
        del in_set, scores

    action = ranked[:, 0].astype(jnp.int32)

    # --- outputs ---------------------------------------------------------
    comp_q = jax.vmap(lambda t: _completed_q(t, jnp.int32(0), cfg))(trees)
    n_root = trees.nw[:, 0, :a]
    sig = jax.vmap(lambda q, n: _sigma(q, n, cfg))(comp_q, n_root)
    target_scores = jnp.where(legal > 0, logits + sig, NEG_INF)
    pi_target = jax.nn.softmax(target_scores, axis=-1)

    sum_n = jnp.sum(n_root, axis=-1)
    root_w = jnp.sum(trees.nw[:, 0, a:], axis=-1)
    root_q = root_w / jnp.maximum(sum_n, 1.0)
    return pi_target, root_q, action
