"""NN-guided PUCT MCTS as an array tree in HBM (mctx-style), batched over games.

TPU re-design of the reference's dict-of-arrays transposition-table search
(``/root/reference/mcts/new_mcts_alpha.py``): nodes live in preallocated
``[max_nodes, ...]`` arrays; one simulation = jitted select -> expand ->
batched NN evaluate -> backup, with ``lax.while_loop`` tree walks and no host
round-trips.  ``vmap`` runs B independent game trees in lockstep so every
simulation step feeds the network a B-sized leaf batch.

Search semantics matched to the reference:
  - PUCT score ``W/(1+N) + cpuct * P * sqrt(sum N)/(1+N)`` with illegal
    actions at -1e9 (``new_mcts_alpha.py:136-140``); ties resolve to the
    lowest action index (numpy argmax convention).
  - priors = softmax policy masked to legal moves and NOT renormalized
    (mass the network leaks onto illegal moves is simply dropped, exactly
    like the reference); uniform over legal only if the masked sum
    vanishes (``new_mcts_alpha.py:163-168``; see ``_masked_priors``).
  - root-only Dirichlet noise over the full action vector, gated on
    ``move_number < dirichlet_moves`` (``new_mcts_alpha.py:170-174``).
  - terminal value is 0 for draws and -1 for the side to move otherwise
    (``new_mcts_alpha.py:106-112``).
  - final policy = root visit counts / total, uniform-over-legal fallback
    (``new_mcts_alpha.py:88-97``).

Conscious deltas from the reference (documented for the decision log):
  - no transposition table: transposed paths get distinct nodes.  The
    reference's table is a cache keyed on (board, player) over an
    otherwise-identical search; the array tree drops it for O(1) addressing.
  - leaves are evaluated by the network immediately (the lockstep game batch
    IS the leaf batch) instead of the reference's queue-until-32-leaves with
    uniform-prior placeholders (``new_mcts_alpha.py:116-132``) — strictly
    fresher priors, same batching effect.
  - the root is evaluated exactly at tree init rather than via the queue.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    n_simulations: int
    cpuct: float = 1.0
    dirichlet_alpha: float = 0.03
    dirichlet_epsilon: float = 0.03
    dirichlet_moves: int = 10
    add_noise: bool = True
    max_nodes: Optional[int] = None  # default: n_simulations + 1
    max_depth: int = 0  # 0 = unbounded; see _select docstring
    # first-play urgency: Q used for UNVISITED edges during selection.
    #   "zero": the reference-exact W/(1+N) (= 0 when N=0,
    #     new_mcts_alpha.py:136-140).
    #   "parent": unvisited edges inherit the node's running mean Q
    #     (sum W / sum N). Fixes the measured round-2 pathology: when the
    #     value head is confidently lost, every VISITED action backs up
    #     Q ~ -1 while unvisited ones keep Q = 0, so visits flatten
    #     across all legal moves and the final argmax degenerates exactly
    #     when one forced block would save the game. Players default to
    #     "parent"; self-play keeps "zero" for reference comparability.
    #   RESOLVED (round 5): the round-2 "parent + pallas crashes minutes
    #     into long runs" report does NOT reproduce under the round-4
    #     tunnel-claim discipline: repro/parent_pallas_longrun.py ran
    #     181,140 moves of continuous parent@cap56 production-shape
    #     self-play (6x128 net, batch 128, 200 sims, 10 batches, 16.5
    #     min on device) CLEAN, on top of the round-4 cap-8/cap-56
    #     probes. The original reports are reclassified as stale-claim
    #     tunnel wedges (DECISIONS round 4/5). "parent" is safe for
    #     training; self-play default stays "zero" only for reference
    #     comparability (/root/reference/mcts/new_mcts_alpha.py:40-47).
    fpu_mode: str = "zero"
    # leaves selected (with virtual loss) per network call, per game.
    # 1 = the reference-exact sequential search.  k>1 selects k leaves
    # back-to-back — each select backs up an assumed loss so the next
    # avoids the same path, fresh children carry uniform placeholder
    # priors until the batched eval lands (the reference's own queue
    # placeholder trick, new_mcts_alpha.py:125-132) — then evaluates all
    # k*B leaves in ONE forward and replaces the assumed losses with the
    # real values.  Total leaf evaluations stay n_simulations, so equal
    # configs spend equal network FLOPs. Strength parity is checked by
    # arena A/B (tools/kleaf_ab.py); throughput gain comes from amortizing
    # per-step glue and bigger MXU batches.
    leaves_per_sim: int = 1
    # "xla": gather/scatter tree ops (reference implementation);
    # "pallas": packed-row DMA kernels (bit-identical results, faster on
    # TPU and immune to the large-batch XLA scatter fault; see
    # ops/tree_kernels.py)
    backend: str = "xla"
    # terminal leaf value convention:
    #   "always_loss": draws 0, otherwise -1 for the side to move — the
    #     production reference (new_mcts_alpha.py:106-112);
    #   "signed": +1 if the side to move is the winner else -1 — the legacy
    #     reference (old_mcts_alpha.py:80-84).  In states reachable by play
    #     the mover can never already have won (the opponent moved last),
    #     so both modes coincide (tests/test_mcts.py); the flag exists to
    #     formally cover the legacy search's semantic surface (SURVEY M2).
    terminal_value_mode: str = "always_loss"
    # cross-move subtree reuse (opt-in).  0 = off: every move searches a
    # fresh tree (bit-exact reference-parity semantics).  R > 0: callers
    # thread the returned tree through :func:`advance_root` (XLA backend)
    # or ``tree_pallas.packed_advance_root`` (packed backend) between
    # moves, which re-roots at the played action and compacts the
    # surviving subtree (BFS priority, truncated to R slots); fresh
    # simulations then allocate slots R, R+1, ... so expansion writes
    # stay lane-uniform dense slices.  Support matrix (tests assert each
    # cell, tests/test_reuse_matrix.py):
    #   puct   x xla    -> yes (players default ON; run_mcts_with_tree)
    #   puct   x pallas -> yes (self-play PackedCarry; bit-identical to
    #                      the XLA backend by differential test)
    #   gumbel x xla    -> NO  (__post_init__ raises: the gumbel reuse
    #                      driver exists only on the packed backend)
    #   gumbel x pallas -> yes (run_gumbel_packed_with_tree)
    # Self-play additionally requires backend='pallas' and batch >= 8
    # (selfplay/runner.py — the packed kernels' lane floor).  Measured
    # motivation: ~42-47% of a move's expansions already exist in the
    # previous move's tree (tools/tt_rate_probe.py) — the reference gets
    # this for free from its state-keyed node dicts
    # (new_mcts_alpha.py:60-64,190-197).
    reuse_budget: int = 0
    # root search algorithm.  "puct": the reference-parity PUCT search
    # (everything above).  "gumbel": Gumbel sequential halving at the
    # root with the deterministic non-root rule and the completed-Q
    # policy target (search/gumbel.py; Danihelka et al., ICLR 2022) — a
    # capability beyond the reference, built for strength-per-simulation.
    # Gumbel ignores the Dirichlet/cpuct/fpu knobs (exploration is the
    # per-move Gumbel sample) and runs on the XLA tree ops.
    search: str = "puct"
    gumbel_max_considered: int = 16   # root actions entering halving
    gumbel_c_visit: float = 50.0      # sigma(q) = (c_visit + maxN)*c_scale*q
    gumbel_c_scale: float = 1.0
    # Batch each halving ROUND's m_k simulations (one per surviving root
    # action) into ONE tree walk + ONE network call.  Simulations within
    # a round force DISTINCT root actions, so they descend into disjoint
    # subtrees and read none of each other's writes — the batched form
    # replays the serial schedule exactly (same slot numbering, same
    # stats; differential-tested bit-equal).  The only divergence is the
    # endgame degenerate case (fewer legal moves than m_k): the illegal-
    # candidate fallback then forces DUPLICATE root actions in one round,
    # which serially would descend a ply deeper but here re-visit the
    # same root edge (the duplicate's expansion becomes an unreachable
    # orphan; the backed-up value is identical because the duplicate
    # evaluates the same child state).  Cuts network calls per move from
    # n_simulations to the number of rounds (~n/m ... log m terms): a
    # LATENCY lever for small-batch play (arenas, interactive players)
    # where the MXU is far from saturated; at production self-play
    # batches the forward is compute-bound and gains are small.
    gumbel_round_parallel: bool = False

    def __post_init__(self):
        if self.fpu_mode not in ("zero", "parent"):
            raise ValueError(f"unknown fpu_mode: {self.fpu_mode!r}")
        if self.search not in ("puct", "gumbel"):
            raise ValueError(f"unknown search: {self.search!r}")
        if self.search == "gumbel":
            if self.reuse_budget > 0 and self.backend != "pallas":
                raise ValueError(
                    "gumbel + subtree reuse runs on the packed backend "
                    "only (tree_pallas.run_gumbel_packed_with_tree)")
            if self.leaves_per_sim > 1:
                raise ValueError("gumbel search does not support "
                                 "leaves_per_sim > 1")
        elif self.gumbel_round_parallel:
            raise ValueError(
                "gumbel_round_parallel requires search='gumbel'")
        if self.leaves_per_sim < 1:
            raise ValueError(f"leaves_per_sim={self.leaves_per_sim} < 1")
        if (self.leaves_per_sim > 1
                and self.n_simulations % self.leaves_per_sim != 0):
            raise ValueError(
                f"n_simulations={self.n_simulations} not divisible by "
                f"leaves_per_sim={self.leaves_per_sim}")

    @property
    def node_capacity(self) -> int:
        # with reuse, slots [0, reuse_budget) hold the compacted carry-over
        # subtree and fresh simulations allocate from reuse_budget upward.
        # +2 (round 4): one slot beyond the last simulation's is RESERVED
        # as the packed kernels' DMA-guard ("park") tile — path rows of
        # -1 (lanes shorter than the tile's longest, depth-capped stops)
        # route their unconditional DMAs to a tile nothing else ever
        # touches, because Mosaic does not honor per-lane DMA predication
        # (pl.when around copies).  See ops/tree_kernels._group_base.
        floor = self.n_simulations + 2 + self.reuse_budget
        cap = self.max_nodes or floor
        if cap < floor:
            # every simulation burns one slot (+ the park tile); a smaller
            # capacity would make slot indices run off the node arrays
            # (silent clamped-scatter corruption), so reject it outright
            raise ValueError(
                f"max_nodes={cap} < n_simulations+2+reuse_budget={floor}"
            )
        return cap

    @property
    def depth_limit(self) -> int:
        return self.max_depth or self.node_capacity


class Tree(NamedTuple):
    """Array tree for ONE game; batch via vmap (adds a leading axis).

    Layout notes (TPU): legality is folded into the SIGN of the stored
    prior (illegal => -1.0), and visit counts and total values share one
    ``nw [N, 2A]`` tensor (counts in columns :A, W in columns A:), so a
    select hop gathers two rows instead of four.
    """

    states: Any          # env-state pytree stacked to [N, ...]
    prior: jax.Array     # f32 [N, A]; -1.0 marks an illegal action
    nw: jax.Array        # f32 [N, 2A]: [:, :A] visit counts, [:, A:] total W
    children: jax.Array  # i32 [N, A], -1 = unexpanded
    parent: jax.Array    # i32 [N], -1 at root
    parent_action: jax.Array  # i32 [N]
    value: jax.Array     # f32 [N] leaf value at expansion (network value,
                         # or terminal value), side-to-move perspective —
                         # consumed by the Gumbel completed-Q mixing
                         # (search/gumbel.py); PUCT ignores it


EvalFn = Callable[[Any, jax.Array], Tuple[jax.Array, jax.Array]]
# eval_fn(net_params, obs [B, H, W, C]) -> (policy_probs [B, A], value [B] or [B, 1])


# ----------------------------------------------------------------------
# noise
# ----------------------------------------------------------------------
DIRICHLET_SERIES_TERMS = 8


def symmetric_dirichlet(key: jax.Array, alpha: float, shape) -> jax.Array:
    """Loop-free symmetric Dirichlet(alpha) sampler over the last axis.

    ``jax.random.dirichlet``'s gamma sampler contains a rejection
    ``while_loop`` that interacts catastrophically with this module's
    nested search loops on TPU (measured 60x+ self-play slowdown), so noise
    is drawn via the boost identity ``Gamma(a) = Gamma(a+1) * U^(1/a)``
    unrolled into its exact series
    ``Gamma(a) = sum_k E_k * prod_{j<=k} U_j^(1/a)`` (E ~ Exp(1), U ~
    Uniform), truncated at ``DIRICHLET_SERIES_TERMS`` terms and evaluated
    in log space with a final softmax (no underflow at tiny alpha).  The
    truncation error of the normalized sample decays like
    ``(a/(1+a))^K`` — at the K=8 default it is <0.6% relative for
    alpha <= 1.0 and vanishing for the small alphas used as root noise;
    distribution-tested against ``numpy.random.dirichlet`` across this
    range (tests/test_mcts.py).
    """
    k_u, k_e = jax.random.split(key)
    terms = (DIRICHLET_SERIES_TERMS,)
    log_u = jnp.log(jax.random.uniform(k_u, terms + tuple(shape), jnp.float32,
                                       minval=1e-30, maxval=1.0))
    exp = jax.random.exponential(k_e, terms + tuple(shape), jnp.float32)
    # t_k = log(E_k) + (sum_{j<=k} log U_j) / alpha;  log G = logsumexp_k t_k
    cum_log_u = jnp.cumsum(log_u, axis=0)
    t = jnp.log(jnp.maximum(exp, 1e-30)) + cum_log_u / alpha
    log_g = jax.nn.logsumexp(t, axis=0)
    return jax.nn.softmax(log_g, axis=-1)


# ----------------------------------------------------------------------
# helpers (single game; callers vmap)
# ----------------------------------------------------------------------
def _masked_priors(probs: jax.Array, legal: jax.Array) -> jax.Array:
    """Mask priors to legal moves; uniform-over-legal fallback when the
    masked mass vanishes.

    NOTE: like the reference (``new_mcts_alpha.py:163-168``), the masked
    priors are NOT renormalized — whatever probability the network put on
    illegal moves is simply dropped, slightly damping the exploration term
    on nodes where the policy head leaks mass onto occupied squares.
    """
    p = probs * legal
    total = jnp.sum(p)
    n_legal = jnp.maximum(jnp.sum(legal), 1.0)
    uniform = legal / n_legal
    return jnp.where(total < 1e-8, uniform, p)


def _puct_scores(tree: Tree, node, cpuct: float,
                 fpu_mode: str = "zero") -> jax.Array:
    a = tree.prior.shape[-1]
    nw_row = tree.nw[node]
    n, w = nw_row[:a], nw_row[a:]
    p_signed = tree.prior[node]
    p = jnp.maximum(p_signed, 0.0)
    sum_n = jnp.sum(n)
    if fpu_mode == "parent":
        # true-mean Q for visited edges + parent mean for unvisited: the
        # reference's W/(1+N) damping keeps any visited edge's Q strictly
        # above the parent mean, which would lock selection onto the
        # first-visited child regardless of priors
        parent_q = jnp.sum(w) / jnp.maximum(sum_n, 1.0)
        q = jnp.where(n > 0.0, w / jnp.maximum(n, 1.0), parent_q)
    else:
        q = w / (1.0 + n)
    sqrt_sum = jnp.sqrt(sum_n)
    scores = q + cpuct * p * sqrt_sum / (1.0 + n)
    return jnp.where(p_signed >= 0.0, scores, NEG_INF)


def _write_node(tree: Tree, idx, state) -> Tree:
    states = jax.tree_util.tree_map(
        lambda stack, s: stack.at[idx].set(s), tree.states, state
    )
    return tree._replace(states=states)


def _signed_priors(probs, legal_f32):
    """Masked/renormalized priors with illegality in the sign (-1.0)."""
    p = _masked_priors(probs, legal_f32)
    return jnp.where(legal_f32 > 0, p, -1.0)


def _node_state(tree: Tree, idx):
    return jax.tree_util.tree_map(lambda stack: stack[idx], tree.states)


def terminal_leaf_value(env, cfg: MCTSConfig, state) -> jax.Array:
    """Terminal value per ``cfg.terminal_value_mode`` (single state)."""
    if cfg.terminal_value_mode == "signed":
        return jnp.where(
            state.winner == 0, 0.0,
            jnp.where(state.winner == state.to_move, 1.0, -1.0),
        ).astype(jnp.float32)
    if cfg.terminal_value_mode != "always_loss":
        raise ValueError(
            f"unknown terminal_value_mode: {cfg.terminal_value_mode!r}"
        )
    return env.terminal_value(state)


# ----------------------------------------------------------------------
# phases
# ----------------------------------------------------------------------
def _select_and_expand(env, cfg: MCTSConfig, tree: Tree, slot):
    """Walk PUCT argmax to an unexpanded edge or a terminal node; allocate.

    ``slot`` is the node index this simulation writes (``sim_index + 1``).
    Because every simulation burns exactly one slot and ``slot`` is
    identical across the vmapped game lanes, all expansion-time writes
    lower to dense dynamic-update-slices instead of per-lane scatters —
    the dominant cost class on TPU.  Simulations that stop on an
    already-terminal node leave their slot orphaned (never linked into
    ``children``), wasting only capacity they would not have used anyway.

    ``cfg.max_depth`` (if set) truncates the walk: a simulation reaching the
    cap treats the (already-evaluated, non-terminal) node it stopped on as
    its leaf — the lockstep evaluator then re-evaluates that node and backs
    up its own network value, adding visits along the path prefix.  This
    bounds the O(sims * pv_length) walk blow-up when the search concentrates
    on one deep principal variation (conscious delta from the reference,
    which walks unboundedly; see DECISIONS.md).

    Returns (tree, leaf_index, leaf_legal_mask).
    """

    def cond(carry):
        node, _, stop, _ = carry
        return ~stop

    def body(carry):
        node, _, _, depth = carry
        done = tree.states.done[node]
        capped = depth >= cfg.depth_limit
        scores = _puct_scores(tree, node, cfg.cpuct, cfg.fpu_mode)
        action = jnp.argmax(scores).astype(jnp.int32)
        child = tree.children[node, action]
        # stop when: terminal node, depth cap, or unexpanded edge
        stop_here = done | capped | (child == -1)
        nxt = jnp.where(stop_here, node, child)
        return (nxt, jnp.where(done | capped, -1, action), stop_here,
                depth + 1)

    node, action, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(-1), jnp.bool_(False),
                     jnp.int32(0))
    )

    expanding = action >= 0  # False when we stopped on a terminal node
    safe_action = jnp.maximum(action, 0)
    parent_state = _node_state(tree, node)
    child_state = env.step(parent_state, safe_action)
    child_legal = env.legal_mask(child_state)

    # Orphan slots get a copy of the parent's (terminal) state; harmless
    # because nothing ever points at them.
    write_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(expanding, a, b), child_state, parent_state
    )
    tree = _write_node(tree, slot, write_state)
    tree = tree._replace(
        children=tree.children.at[node, safe_action].set(
            jnp.where(expanding, slot, tree.children[node, safe_action])
        ),
        parent=tree.parent.at[slot].set(jnp.where(expanding, node, -1)),
        parent_action=tree.parent_action.at[slot].set(action),
    )
    leaf = jnp.where(expanding, slot, node)
    return tree, leaf, child_legal


def _apply_eval_and_backup(env, cfg: MCTSConfig, tree: Tree, leaf, slot,
                           probs, value, child_legal) -> Tree:
    """Store NN priors at the fresh slot and back up the leaf value.

    The prior write targets ``slot`` unconditionally (lane-uniform index =>
    dense slice write); when the simulation stopped on a terminal node the
    slot is an orphan, so the junk priors are unreachable.
    """
    leaf_state = _node_state(tree, leaf)
    terminal = leaf_state.done
    leaf_value = jnp.where(
        terminal, terminal_leaf_value(env, cfg, leaf_state), value
    ).astype(jnp.float32)

    priors = _signed_priors(probs, child_legal.astype(probs.dtype))
    tree = tree._replace(
        prior=tree.prior.at[slot].set(priors),
        # the slot's own value estimate (junk on orphan slots, which are
        # unreachable) — the Gumbel completed-Q mix reads it
        value=tree.value.at[slot].set(leaf_value),
    )

    a_count = tree.prior.shape[-1]

    # walk to the root, flipping perspective at each hop
    def cond(carry):
        node, _, _ = carry
        return tree.parent[node] != -1

    def body(carry):
        node, v, nw = carry
        p = tree.parent[node]
        a = tree.parent_action[node]
        v = -v
        nw = nw.at[p, a].add(1.0)
        nw = nw.at[p, a_count + a].add(v)
        return (p, v, nw)

    _, _, nw = jax.lax.while_loop(
        cond, body, (leaf, leaf_value, tree.nw)
    )
    return tree._replace(nw=nw)


def _virtual_loss_walk(tree: Tree, leaf) -> Tree:
    """Apply virtual loss along ``leaf`` -> root: every traversed edge gets
    N+1 and W-1, with NO perspective alternation — each edge is made less
    attractive to ITS OWN selecting player (the AGZ/LC0 convention; an
    alternating backup would instead attract re-selection at every other
    ply)."""
    a_count = tree.prior.shape[-1]

    def cond(carry):
        node, _ = carry
        return tree.parent[node] != -1

    def body(carry):
        node, nw = carry
        p = tree.parent[node]
        a = tree.parent_action[node]
        nw = nw.at[p, a].add(1.0)
        nw = nw.at[p, a_count + a].add(-1.0)
        return (p, nw)

    _, nw = jax.lax.while_loop(cond, body, (leaf, tree.nw))
    return tree._replace(nw=nw)


def _select_expand_vl(env, cfg: MCTSConfig, tree: Tree, slot):
    """Select + expand one leaf and immediately apply VIRTUAL LOSS.

    Building block of the k-leaves-per-sim batched search
    (``cfg.leaves_per_sim > 1``): the fresh child gets uniform-over-legal
    placeholder priors (the reference's queue-pending placeholder,
    ``new_mcts_alpha.py:125-132``) so a subsequent select in the same
    batch can descend through it, and every edge on the path gets N+1 /
    W-1 so subsequent selects are steered away from the same path.
    :func:`_finalize_leaf` later replaces the virtual loss with the real
    evaluation.
    """
    tree, leaf, child_legal = _select_and_expand(env, cfg, tree, slot)
    legal_f32 = child_legal.astype(jnp.float32)
    n_legal = jnp.maximum(jnp.sum(legal_f32), 1.0)
    placeholder = jnp.where(legal_f32 > 0, legal_f32 / n_legal, -1.0)
    tree = tree._replace(prior=tree.prior.at[slot].set(placeholder))
    return _virtual_loss_walk(tree, leaf), leaf, child_legal


def _finalize_leaf(env, cfg: MCTSConfig, tree: Tree, leaf, slot,
                   probs, value, child_legal) -> Tree:
    """Replace a leaf's placeholder priors and virtual loss with the real
    evaluation: overwrite the slot's prior row, then walk the path adding
    ``v_flipped + 1`` to W at each edge (the +1 cancels the virtual loss;
    ``v_flipped`` alternates perspective exactly like the k=1 backup; N
    was already counted by the virtual-loss walk)."""
    leaf_state = _node_state(tree, leaf)
    leaf_value = jnp.where(
        leaf_state.done, terminal_leaf_value(env, cfg, leaf_state), value
    ).astype(jnp.float32)
    priors = _signed_priors(probs, child_legal.astype(probs.dtype))
    tree = tree._replace(prior=tree.prior.at[slot].set(priors))

    a_count = tree.prior.shape[-1]

    def cond(carry):
        node, _, _ = carry
        return tree.parent[node] != -1

    def body(carry):
        node, v, nw = carry
        p = tree.parent[node]
        a = tree.parent_action[node]
        v = -v
        nw = nw.at[p, a_count + a].add(v + 1.0)
        return (p, v, nw)

    _, _, nw = jax.lax.while_loop(cond, body, (leaf, leaf_value, tree.nw))
    return tree._replace(nw=nw)


# ----------------------------------------------------------------------
# root priors (shared by the XLA and Pallas search backends)
# ----------------------------------------------------------------------
def root_signed_priors(env, cfg: MCTSConfig, eval_fn: EvalFn, net_params,
                       root_states, move_numbers, noise_key) -> jax.Array:
    """Masked root priors with the Dirichlet gate applied; illegality is
    encoded in the sign (-1.0), ready to store as a node's prior row."""
    batch = root_states.done.shape[0]
    a = env.num_actions
    root_obs = jax.vmap(env.encode)(root_states)
    root_probs, _ = eval_fn(net_params, root_obs)
    root_probs = root_probs.reshape(batch, a)
    root_legal = jax.vmap(env.legal_mask)(root_states).astype(root_probs.dtype)
    priors = jax.vmap(_masked_priors)(root_probs, root_legal)

    if cfg.add_noise:
        noise = symmetric_dirichlet(noise_key, cfg.dirichlet_alpha, (batch, a))
        noised = (1.0 - cfg.dirichlet_epsilon) * priors \
            + cfg.dirichlet_epsilon * noise
        noised = noised / jnp.sum(noised, axis=-1, keepdims=True)
        gate = (move_numbers < cfg.dirichlet_moves)[:, None]
        priors = jnp.where(gate, noised, priors)

    return jnp.where(root_legal > 0, priors, -1.0)


# ----------------------------------------------------------------------
# entry point
# ----------------------------------------------------------------------
def init_tree(env, cfg: MCTSConfig, root_state) -> Tree:
    """Allocate a tree (single game) with the root written at slot 0."""
    n = cfg.node_capacity
    a = env.num_actions
    stack = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n,) + x.shape, x.dtype), root_state
    )
    tree = Tree(
        states=stack,
        prior=jnp.full((n, a), -1.0, jnp.float32),
        nw=jnp.zeros((n, 2 * a), jnp.float32),
        children=jnp.full((n, a), -1, jnp.int32),
        parent=jnp.full((n,), -1, jnp.int32),
        parent_action=jnp.full((n,), -1, jnp.int32),
        value=jnp.zeros((n,), jnp.float32),
    )
    return _write_node(tree, 0, root_state)


def run_mcts(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    root_states,
    move_numbers,
    rng: jax.Array,
) -> jax.Array:
    """Batched MCTS: returns the visit-count policy ``pi [B, A]``.

    Args:
        env: functional game env (static).
        cfg: search configuration (static).
        eval_fn: network forward (static); sees the whole [B] leaf batch.
        net_params: network parameter pytree (dynamic).
        root_states: env-state pytree with leading batch axis [B].
        move_numbers: i32 [B] current move number per game (Dirichlet gate).
        rng: PRNG key.

    All of this compiles to a single XLA program; no host round-trips.
    """
    pi, _ = run_mcts_with_q(env, cfg, eval_fn, net_params, root_states,
                            move_numbers, rng)
    return pi


def run_mcts_with_q(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    root_states,
    move_numbers,
    rng: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Like :func:`run_mcts` but also returns the root value estimate.

    ``root_q [B]`` is the mean backed-up value over all root edge visits
    (``sum W / sum N`` at the root), from the perspective of the player to
    move — the same convention as the self-play outcome ``z``, making it
    usable as a soft value target (``value_target_mix`` in the trainer).
    """
    if cfg.search == "gumbel":
        # Gumbel sequential halving (search/gumbel.py; packed-kernel walk
        # when backend == "pallas" and the batch clears the lane floor);
        # move_numbers is unused (no Dirichlet gate in Gumbel search)
        from alphazero_gomoku_tpu.search.gumbel import run_gumbel_mcts
        pi, root_q, _ = run_gumbel_mcts(env, cfg, eval_fn, net_params,
                                        root_states, rng)
        return pi, root_q
    # Mosaic requires >=8 sublanes per vector register; the packed-row
    # kernels fail to lower below that, and the two backends are
    # bit-identical (tests/test_tree_pallas.py), so tiny batches
    # (interactive play, probes) silently take the XLA path.
    if cfg.backend == "pallas" and root_states.done.shape[0] >= 8:
        from alphazero_gomoku_tpu.search.tree_pallas import run_mcts_packed
        return run_mcts_packed(env, cfg, eval_fn, net_params, root_states,
                               move_numbers, rng)
    if cfg.backend not in ("xla", "pallas"):
        raise ValueError(f"unknown MCTS backend: {cfg.backend!r}")
    pi, root_q, _ = _run_mcts_xla(env, cfg, eval_fn, net_params,
                                  root_states, move_numbers, rng,
                                  init_trees=None)
    return pi, root_q


def run_mcts_with_tree(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    net_params,
    move_numbers,
    rng: jax.Array,
    trees: Optional[Tree] = None,
    root_states=None,
) -> Tuple[jax.Array, jax.Array, Tree]:
    """Reuse-aware search: returns ``(pi, root_q, trees)``.

    The cross-move protocol (``cfg.reuse_budget > 0``; XLA backend only —
    the packed kernels' lane-uniform slot scheme does not yet carry
    per-lane subtree sizes):

      1. First move: pass ``root_states`` (``trees=None``) — fresh trees.
      2. Play an action; call :func:`advance_root` with the returned trees
         and the action (repeat for the opponent's reply when driving a
         single seat).
      3. Pass the advanced trees back in (``root_states=None``); fresh
         simulations allocate from slot ``reuse_budget`` and the kept
         root statistics bias the new search — the reference's state-keyed
         carry-over (new_mcts_alpha.py:60-64), array-tree style.

    Root priors (and Dirichlet noise, when enabled) are recomputed every
    move, matching the reference's per-move root noise refresh.
    """
    if trees is None:
        if root_states is None:
            raise ValueError("need root_states for the first move")
        return _run_mcts_xla(env, cfg, eval_fn, net_params, root_states,
                             move_numbers, rng, init_trees=None)
    if cfg.reuse_budget <= 0:
        raise ValueError("trees= requires cfg.reuse_budget > 0")
    root_states = jax.tree_util.tree_map(lambda x: x[:, 0], trees.states)
    return _run_mcts_xla(env, cfg, eval_fn, net_params, root_states,
                         move_numbers, rng, init_trees=trees)


def _run_mcts_xla(env, cfg, eval_fn, net_params, root_states, move_numbers,
                  rng, init_trees):
    batch = root_states.done.shape[0]
    a = env.num_actions

    if init_trees is None:
        trees = jax.vmap(lambda s: init_tree(env, cfg, s))(root_states)
        slot_base = 1
    else:
        trees = init_trees
        slot_base = max(cfg.reuse_budget, 1)

    rng, sub = jax.random.split(rng)
    signed = root_signed_priors(env, cfg, eval_fn, net_params, root_states,
                                move_numbers, sub)
    trees = trees._replace(prior=trees.prior.at[:, 0, :].set(signed))

    # --- simulations ----------------------------------------------------
    k = cfg.leaves_per_sim

    def one_sim(trees, sim_idx):
        # identical across lanes => dense slice writes; starts above the
        # reused-subtree prefix when resuming from advance_root
        slot = sim_idx + slot_base
        trees, leaves, child_legal = jax.vmap(
            lambda t: _select_and_expand(env, cfg, t, slot)
        )(trees)
        obs = jax.vmap(lambda t, l: env.encode(_node_state(t, l)))(trees, leaves)
        probs, values = eval_fn(net_params, obs)
        probs = probs.reshape(batch, a)
        values = values.reshape(batch)
        trees = jax.vmap(
            lambda t, l, p, v, cl: _apply_eval_and_backup(
                env, cfg, t, l, slot, p, v, cl)
        )(trees, leaves, probs, values, child_legal)
        return trees, None

    def one_macro(trees, step_idx):
        """k virtual-loss selects, ONE [k*B] network call, k finalizes.

        The j loops are ``lax.scan``s, not Python-unrolled: at production
        shapes an unrolled k=2 macro body blew the remote-compile budget
        (>15 min) while the scanned form compiles like the k=1 program.
        """
        base_slot = step_idx * k + slot_base

        def select_j(trees, j):
            trees, leaf, legal = jax.vmap(
                lambda t: _select_expand_vl(env, cfg, t, base_slot + j)
            )(trees)
            return trees, (leaf, legal)

        trees, (leaves, legals) = jax.lax.scan(
            select_j, trees, jnp.arange(k, dtype=jnp.int32))

        obs = jax.vmap(lambda leaf_row: jax.vmap(
            lambda t, l: env.encode(_node_state(t, l)))(trees, leaf_row)
        )(leaves)
        obs = obs.reshape((k * batch,) + obs.shape[2:])
        probs, values = eval_fn(net_params, obs)
        probs = probs.reshape(k, batch, a)
        values = values.reshape(k, batch)

        def finalize_j(trees, xs):
            j, leaf, p, v, legal = xs
            trees = jax.vmap(
                lambda t, l, pp, vv, cl: _finalize_leaf(
                    env, cfg, t, l, base_slot + j, pp, vv, cl)
            )(trees, leaf, p, v, legal)
            return trees, None

        trees, _ = jax.lax.scan(
            finalize_j, trees,
            (jnp.arange(k, dtype=jnp.int32), leaves, probs, values, legals))
        return trees, None

    if k == 1:
        trees, _ = jax.lax.scan(
            one_sim, trees, jnp.arange(cfg.n_simulations, dtype=jnp.int32)
        )
    else:
        trees, _ = jax.lax.scan(
            one_macro, trees,
            jnp.arange(cfg.n_simulations // k, dtype=jnp.int32)
        )

    # --- visit-count policy --------------------------------------------
    counts = trees.nw[:, 0, :a]
    totals = jnp.sum(counts, axis=-1, keepdims=True)
    legal01 = (trees.prior[:, 0, :] >= 0.0).astype(jnp.float32)
    uniform = legal01 / jnp.maximum(
        jnp.sum(legal01, axis=-1, keepdims=True), 1.0)
    pi = jnp.where(totals > 0, counts / jnp.maximum(totals, 1e-30), uniform)
    root_w = jnp.sum(trees.nw[:, 0, a:], axis=-1)
    root_q = root_w / jnp.maximum(totals[:, 0], 1.0)
    return pi, root_q, trees


# ----------------------------------------------------------------------
# cross-move subtree reuse
# ----------------------------------------------------------------------
def _advance_root_single(env, cfg: MCTSConfig, tree: Tree, action) -> Tree:
    """Re-root one game's tree at ``children[0, action]`` and compact.

    The surviving subtree's nodes are renumbered to the prefix
    ``[0, reuse_budget)`` in (depth, old-index) order — shallow nodes
    first, so a subtree larger than the budget sheds its deepest nodes.
    A truncated child's edge statistics survive in its parent's ``nw``
    row; the child itself re-expands on first selection (fresh priors),
    matching an unexpanded edge with history.  If the played action was
    never expanded (e.g. a random opening ply), a fresh tree is built
    from the stepped root state instead.
    """
    cap = cfg.node_capacity
    budget = cfg.reuse_budget
    idx = jnp.arange(cap, dtype=jnp.int32)
    r = tree.children[0, action]
    have = r >= 0
    r_safe = jnp.maximum(r, 0)

    # reachability + depth from r, propagated down parent pointers:
    # a node joins when its parent is reached; depth_limit sweeps cover
    # the deepest possible subtree
    parent = tree.parent
    psafe = jnp.maximum(parent, 0)
    reach0 = idx == r_safe
    depth0 = jnp.where(reach0, 0, cap).astype(jnp.int32)

    def sweep(carry, _):
        reach, depth = carry
        preach = reach[psafe] & (parent >= 0)
        pdepth = depth[psafe] + 1
        nd = jnp.where(reach, depth, jnp.where(preach, pdepth, cap))
        return (reach | preach, nd.astype(jnp.int32)), ()

    (reach, depth), _ = jax.lax.scan(
        sweep, (reach0, depth0), None,
        length=min(cfg.depth_limit, cap))

    big = jnp.int32(2) * cap * cap
    key = jnp.where(reach, depth * cap + idx, big)
    order = jnp.argsort(key).astype(jnp.int32)     # keep-priority permutation
    j = idx
    take = (key[order] < big) & (j < budget)       # [cap] rows that survive

    new_of_old = jnp.full((cap,), -1, jnp.int32).at[order].set(
        jnp.where(take, j, -1).astype(jnp.int32))

    def remap(ptr):
        return jnp.where(ptr >= 0, new_of_old[jnp.maximum(ptr, 0)], -1)

    states = jax.tree_util.tree_map(
        lambda x: jnp.where(
            take.reshape((-1,) + (1,) * (x.ndim - 1)), x[order],
            jnp.zeros_like(x)),
        tree.states)
    prior = jnp.where(take[:, None], tree.prior[order], -1.0)
    nw = jnp.where(take[:, None], tree.nw[order], 0.0)
    children = jnp.where(take[:, None], remap(tree.children[order]), -1)
    parent_new = jnp.where(take, remap(tree.parent[order]), -1)
    parent_act = jnp.where(take, tree.parent_action[order], -1)
    # the new root's old parent (the old root) is outside the subtree, so
    # remap already yields -1; make it explicit anyway
    parent_new = parent_new.at[0].set(-1)
    parent_act = parent_act.at[0].set(-1)
    value = jnp.where(take, tree.value[order], 0.0)
    reused = Tree(states, prior, nw, children, parent_new, parent_act, value)

    fresh = init_tree(env, cfg,
                      env.step(_node_state(tree, jnp.int32(0)), action))
    return jax.tree_util.tree_map(
        lambda a_, b_: jnp.where(have, a_, b_), reused, fresh)


def advance_root(env, cfg: MCTSConfig, trees: Tree, actions) -> Tree:
    """Batched re-root: one played action per lane (i32 [B]).

    See :func:`run_mcts_with_tree` for the cross-move protocol.
    """
    if cfg.reuse_budget <= 0:
        raise ValueError("advance_root requires cfg.reuse_budget > 0")
    return jax.vmap(
        lambda t, a_: _advance_root_single(env, cfg, t, a_)
    )(trees, jnp.asarray(actions, jnp.int32))
