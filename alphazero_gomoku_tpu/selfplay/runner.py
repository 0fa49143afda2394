"""Lockstep batched self-play: B games per device, whole games in one jit.

TPU re-design of the reference's per-process game loop
(``/root/reference/train.py:360-412`` + worker fan-out ``:62-129``): instead
of N worker processes each playing one game at a time against a private model
copy, ONE jitted program advances B games in lockstep — every move runs a
batched MCTS whose leaf evaluations batch across all B games, so the network
always sees full batches and the host is never consulted mid-game.

Reference semantics preserved:
  - temperature schedule ``temp = max(0, 1 - move/temp_threshold)``
    (``train.py:92-93,647-648``).
  - move sampling from ``pi^(1/T)`` via log-softmax, argmax when T == 0
    (``train.py:252-266``), with illegal-sample fallback to argmax
    (``train.py:379-382``).
  - per-move records of (state, pi, player); outcome z in {-1, 0, 1} assigned
    from the winner's perspective after the game (``train.py:399-403``).
  - 8-fold dihedral augmentation of stored samples (``train.py:405-410``).
  - max-moves cap (``train.py:392``).

Games that finish early are frozen by ``step_safe`` and their subsequent
records masked out via the ``active`` flags.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_gomoku_tpu.ops.symmetry import expand_symmetries_batch_np
from alphazero_gomoku_tpu.search.tree import EvalFn, MCTSConfig, run_mcts_with_q


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    batch_games: int
    mcts: MCTSConfig
    temp_threshold: int = 10
    max_moves: int = 0  # 0 => board_size ** 2
    use_symmetries: bool = True
    # Plies played uniformly at random in the board centre (and NOT recorded
    # as training samples) before search-driven play begins.  Opening
    # diversity lever against the blitz/value-collapse failure mode
    # (DECISIONS.md round-1 training notes); the reference randomizes the
    # opening this way in its arena (``train.py:191-198``) but not in
    # self-play — this generalizes that mechanism as an opt-in.
    opening_random_moves: int = 0
    # Playout cap randomization (KataGo, "Accelerating Self-Play Learning
    # in Go", arXiv:1902.10565 §3.1 — PAPERS.md): when ``pcr_cheap_sims``
    # > 0, each ply is searched with the FULL ``mcts.n_simulations`` only
    # with probability ``pcr_full_prob``; other plies run a cheap
    # ``pcr_cheap_sims``-simulation search with root noise off.  Cheap
    # plies still advance the game and still become VALUE samples (z is
    # outcome-based), but their recorded pi is all-zero — which the KL
    # policy loss treats as weight-0 (0*log0 convention, losses.policy_kl)
    # — so the policy head trains only on full searches while games cost
    # a fraction of the simulations.  The choice is batch-uniform per ply
    # (one compiled program, two static search branches under lax.cond).
    pcr_cheap_sims: int = 0
    pcr_full_prob: float = 0.25

    def resolved_max_moves(self, env) -> int:
        return self.max_moves or env.num_actions


def _pcr_cheap_mcts(cfg: SelfPlayConfig) -> MCTSConfig:
    """Validated cheap-search config for playout cap randomization.

    Shares the full search's node capacity (and depth cap) so the
    cheap/full ``lax.cond`` branches — and, under reuse, their tree
    carries — have identical shapes; root noise off per KataGo §3.1.
    """
    if cfg.pcr_cheap_sims >= cfg.mcts.n_simulations:
        raise ValueError(
            f"pcr_cheap_sims={cfg.pcr_cheap_sims} must be below "
            f"n_simulations={cfg.mcts.n_simulations}")
    if cfg.mcts.leaves_per_sim > 1:
        raise ValueError(
            "playout cap randomization is not supported with "
            "leaves_per_sim > 1")
    return dataclasses.replace(
        cfg.mcts, n_simulations=cfg.pcr_cheap_sims, add_noise=False,
        max_nodes=cfg.mcts.node_capacity)


def center_mask(env) -> jnp.ndarray:
    """f32 [A] mask of the centre 9x9 (whole board if smaller), matching the
    reference's random-opening region (``train.py:191-198``)."""
    size = env.size
    span = min(9, size)
    r0 = (size - span) // 2
    rows = (jnp.arange(size) >= r0) & (jnp.arange(size) < r0 + span)
    grid = rows[:, None] & rows[None, :]
    return grid.reshape(-1).astype(jnp.float32)


def random_center_actions(rng: jax.Array, legal: jax.Array,
                          center: jax.Array) -> jax.Array:
    """Uniform random legal action in the centre region ([B] batched);
    falls back to uniform-over-legal if the centre is full."""
    in_center = legal * center
    pool = jnp.where(jnp.sum(in_center, axis=-1, keepdims=True) > 0,
                     in_center, legal)
    logits = jnp.where(pool > 0, 0.0, -1e30)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


class Trajectories(NamedTuple):
    """Per-step records of a lockstep batch ([T, B, ...]) + outcomes [B]."""

    boards: jax.Array    # int8 [T, B, H, W] board BEFORE the move
    players: jax.Array   # int32 [T, B] player to move
    pis: jax.Array       # f32 [T, B, A] MCTS policy
    root_qs: jax.Array   # f32 [T, B] root value estimate (side-to-move view)
    active: jax.Array    # bool [T, B] record valid (game not yet finished)
    winners: jax.Array   # int32 [B]
    moves_played: jax.Array  # int32 [B] number of moves each game lasted
    captures: jax.Array = None  # int32 [T, B, 2] captured pairs BEFORE the
                                # move (Pente; zeros for capture-free games)


def sample_actions(pi: jax.Array, temp: jax.Array, legal: jax.Array,
                   rng: jax.Array) -> jax.Array:
    """Reference-style temperature sampling over ``pi`` (batched).

    ``pi^(1/T)`` categorical when T > 0, argmax when T <= 0; samples that
    land on illegal actions fall back to argmax (``train.py:379-382``).
    ``temp`` may be a scalar (lockstep plies) or per-game ``[B]``.
    """
    temp = jnp.asarray(temp, jnp.float32)
    tcol = temp[:, None] if temp.ndim == 1 else temp
    logits = jnp.log(pi + 1e-15) / jnp.maximum(tcol, 1e-8)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    greedy = jnp.argmax(pi, axis=-1)
    take_greedy = (temp <= 0.0) | ~jnp.take_along_axis(
        legal, sampled[:, None], axis=1
    ).squeeze(1)
    return jnp.where(take_greedy, greedy, sampled).astype(jnp.int32)


def play_games(
    env,
    cfg: SelfPlayConfig,
    eval_fn: EvalFn,
    net_params,
    rng: jax.Array,
) -> Trajectories:
    """Play ``cfg.batch_games`` lockstep games to completion (one XLA program).

    Implemented as a ``while_loop`` writing into preallocated ``[T, B, ...]``
    record buffers so the program stops as soon as EVERY game in the batch
    has finished — no wasted full-length plies on early-ending batches.
    """
    batch = cfg.batch_games
    max_moves = cfg.resolved_max_moves(env)
    states0 = env.init_batch(batch)
    size = env.size
    center = center_mask(env)

    # cross-move subtree reuse (cfg.mcts.reuse_budget > 0): the packed
    # tree is threaded through the move loop and re-rooted at every
    # played action, so each move's search starts with ~45% of its
    # expansions already in place (tools/tt_rate_probe.py).  Reuse
    # itself works on BOTH backends (support matrix at
    # MCTSConfig.reuse_budget, search/tree.py); THIS self-play driver
    # wires only the packed carry, hence the pallas requirement below.
    gumbel = cfg.mcts.search == "gumbel"
    reuse = cfg.mcts.reuse_budget > 0
    if reuse and (cfg.mcts.backend != "pallas" or batch < 8):
        raise ValueError(
            "self-play subtree reuse requires backend='pallas' and "
            "batch_games >= 8 (the packed kernels' lane floor)")
    if reuse:
        from alphazero_gomoku_tpu.search.tree_pallas import (
            init_packed_carry, packed_advance_root,
            run_mcts_packed_with_tree)
        tree0 = init_packed_carry(env, cfg.mcts, states0)

    # playout cap randomization: the cheap search shares the full
    # search's node capacity (and depth cap) so both lax.cond branches —
    # and, under reuse, their tree carries — have identical shapes
    pcr = cfg.pcr_cheap_sims > 0
    if pcr:
        cheap_mcts = _pcr_cheap_mcts(cfg)

    buffers0 = (
        jnp.zeros((max_moves, batch, size, size), jnp.int8),      # boards
        jnp.zeros((max_moves, batch), jnp.int32),                 # players
        jnp.zeros((max_moves, batch, env.num_actions), jnp.float32),  # pis
        jnp.zeros((max_moves, batch), jnp.float32),               # root_qs
        jnp.zeros((max_moves, batch), jnp.bool_),                 # active
        jnp.zeros((max_moves, batch, 2), jnp.int32),              # captures
    )

    def cond(carry):
        if reuse:
            states, _, t, _, _ = carry
        else:
            states, _, t, _ = carry
        return (t < max_moves) & ~jnp.all(states.done)

    def body(carry):
        if reuse:
            states, rng, t, bufs, tree = carry
        else:
            states, rng, t, bufs = carry
        rng, k_search, k_sample, k_open, k_pcr = jax.random.split(rng, 5)
        active = ~states.done
        move_nums = jnp.full((batch,), t, jnp.int32)

        def search(mcfg):
            if gumbel:
                if reuse:
                    from alphazero_gomoku_tpu.search.tree_pallas import (
                        run_gumbel_packed_with_tree,
                    )
                    return run_gumbel_packed_with_tree(
                        env, mcfg, eval_fn, net_params, k_search,
                        carry=tree, root_states=states,
                    )
                from alphazero_gomoku_tpu.search.gumbel import (
                    run_gumbel_mcts,
                )
                return run_gumbel_mcts(env, mcfg, eval_fn, net_params,
                                       states, k_search)
            if reuse:
                return run_mcts_packed_with_tree(
                    env, mcfg, eval_fn, net_params, move_nums, k_search,
                    carry=tree, root_states=states,
                )
            pi, root_q = run_mcts_with_q(
                env, mcfg, eval_fn, net_params, states, move_nums, k_search,
            )
            return pi, root_q

        if pcr:
            full_move = jax.random.bernoulli(k_pcr, cfg.pcr_full_prob)
            out = jax.lax.cond(full_move,
                               lambda: search(cfg.mcts),
                               lambda: search(cheap_mcts))
        else:
            full_move = jnp.bool_(True)
            out = search(cfg.mcts)
        gumbel_act = None
        if gumbel and reuse:
            pi, root_q, gumbel_act, tree = out
        elif gumbel:
            pi, root_q, gumbel_act = out
        elif reuse:
            pi, root_q, tree = out
        else:
            pi, root_q = out
        temp = jnp.maximum(
            0.0, 1.0 - t.astype(jnp.float32) / cfg.temp_threshold
        )
        legal = jax.vmap(env.legal_mask)(states)
        if gumbel:
            # the sequential-halving winner IS the move (exploration is
            # the per-move root Gumbel sample; no temperature sampling)
            actions = jnp.where(active, gumbel_act, 0).astype(jnp.int32)
        else:
            # done games have all-zero pi; give them a harmless action 0
            safe_pi = jnp.where(active[:, None], pi, 1.0)
            actions = sample_actions(safe_pi, temp,
                                     legal | ~active[:, None], k_sample)
        is_open = t < cfg.opening_random_moves
        if cfg.opening_random_moves:
            rand_actions = random_center_actions(
                k_open, legal.astype(jnp.float32), center)
            actions = jnp.where(is_open, rand_actions, actions)
        boards_b, players_b, pis_b, rootq_b, active_b, caps_b = bufs
        step_caps = getattr(states, "captures", None)
        if step_caps is None:
            step_caps = jnp.zeros((batch, 2), jnp.int32)
        bufs = (
            boards_b.at[t].set(states.board),
            players_b.at[t].set(states.to_move),
            # cheap (playout-cap-randomized) plies record an all-zero pi:
            # a weight-0 policy target under the KL's 0*log0 convention,
            # while the record still trains the value head
            pis_b.at[t].set(jnp.where(full_move, pi, jnp.zeros_like(pi))),
            rootq_b.at[t].set(root_q),
            # random-opening plies are diversity, not policy samples: the
            # search pi there would pair with a move the policy did not
            # choose, so the record is masked out
            active_b.at[t].set(active & ~is_open),
            caps_b.at[t].set(step_caps),
        )
        states = jax.vmap(env.step_safe)(states, actions)
        if reuse:
            tree = packed_advance_root(env, cfg.mcts, tree, actions)
            return (states, rng, t + 1, bufs, tree)
        return (states, rng, t + 1, bufs)

    if reuse:
        init = (states0, rng, jnp.int32(0), buffers0, tree0)
        final_states, _, _, bufs_out, _ = jax.lax.while_loop(
            cond, body, init)
    else:
        final_states, _, _, bufs_out = jax.lax.while_loop(
            cond, body, (states0, rng, jnp.int32(0), buffers0))
    (boards, players, pis, root_qs, active, captures) = bufs_out
    return Trajectories(
        boards=boards,
        players=players,
        pis=pis,
        root_qs=root_qs,
        active=active,
        winners=final_states.winner,
        moves_played=final_states.move_count,
        captures=captures,
    )


def encode_board_np(boards: np.ndarray, players: np.ndarray,
                    captures: np.ndarray = None,
                    pairs_to_win: int = 5) -> np.ndarray:
    """Encode raw boards to NHWC float planes (vectorized, host side).

    With ``captures`` ([N, 2] pairs for players 1/2), appends the two
    normalized captured-pair planes (mirrors ``PenteEnv.encode`` with
    ``capture_planes=True``).
    """
    p = players.reshape(players.shape + (1, 1))
    plane_me = (boards == p).astype(np.float32)
    plane_opp = (boards == (3 - p)).astype(np.float32)
    ones = np.ones_like(plane_me)
    planes = [plane_me, plane_opp, ones]
    if captures is not None:
        caps = captures.astype(np.float32) / float(pairs_to_win)
        # inactive trailing records carry player 0; clip for safe indexing
        # (they are masked out by the caller before training)
        pc = np.clip(players, 1, 2)
        mine = np.take_along_axis(
            caps, (pc - 1).reshape(-1, 1), axis=1)[:, 0]
        theirs = np.take_along_axis(
            caps, (2 - pc).reshape(-1, 1), axis=1)[:, 0]
        planes += [ones * mine.reshape(-1, 1, 1),
                   ones * theirs.reshape(-1, 1, 1)]
    return np.stack(planes, axis=-1)


def collect_examples(
    traj: Trajectories, use_symmetries: bool = True,
    value_target_mix: float = 0.0, capture_planes: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Flatten trajectories into training samples (host side).

    ``value_target_mix`` softens the value target toward the search's own
    root estimate: ``target = (1-mix) * z + mix * root_q`` (both in the
    side-to-move perspective).  mix=0 is the reference's pure game outcome
    (``train.py:399-403``); mix>0 counters the round-1 value-head collapse
    (saturated +-1 targets from blitz self-play; DECISIONS.md).

    Returns (states [N, H, W, 3], pis [N, A], zs [N], winner_stats).
    """
    boards = np.asarray(traj.boards)
    players = np.asarray(traj.players)
    pis = np.asarray(traj.pis)
    active = np.asarray(traj.active)
    winners = np.asarray(traj.winners)

    t, b = active.shape
    win_per_record = np.broadcast_to(winners[None, :], (t, b))
    z = np.where(
        win_per_record == 0, 0.0,
        np.where(win_per_record == players, 1.0, -1.0),
    ).astype(np.float32)
    if value_target_mix > 0.0:
        root_qs = np.asarray(traj.root_qs)
        z = (1.0 - value_target_mix) * z + value_target_mix * root_qs

    mask = active.reshape(-1)
    caps = None
    if capture_planes:
        caps = np.asarray(traj.captures).reshape(-1, 2)[mask]
    # mask BEFORE encoding: lockstep trajectories are mostly padding
    # (torch-style [T=board^2, B] rows vs ~20-30 real plies per game), so
    # encoding first built float planes for ~10x more records than kept
    states = encode_board_np(
        boards.reshape(-1, *boards.shape[2:])[mask],
        players.reshape(-1)[mask],
        captures=caps,
    )
    flat_pis = pis.reshape(-1, pis.shape[-1])[mask].astype(np.float32)
    flat_z = z.reshape(-1)[mask]

    if use_symmetries:
        states, flat_pis = expand_symmetries_batch_np(states, flat_pis)
        flat_z = np.tile(flat_z, 8)

    stats = {
        0: int((winners == 0).sum()),
        1: int((winners == 1).sum()),
        2: int((winners == 2).sum()),
    }
    return states, flat_pis, flat_z, stats


# ----------------------------------------------------------------------
# continuous (auto-reset) self-play
# ----------------------------------------------------------------------
class ContinuousRecords(NamedTuple):
    """Per-ply records of an auto-reset stream ([T, B, ...]).

    Unlike :class:`Trajectories`, every ply of every lane is a real move:
    finished games reset to fresh ones in place, so there is no lockstep
    tail where finished lanes idle.  Game boundaries are marked by
    ``ended`` and the outcome of the segment is read from ``winners`` at
    the boundary ply.
    """

    boards: jax.Array    # int8 [T, B, H, W] board BEFORE the move
    players: jax.Array   # int32 [T, B] player to move
    pis: jax.Array       # f32 [T, B, A]
    root_qs: jax.Array   # f32 [T, B] root value estimate (side-to-move view)
    recorded: jax.Array  # bool [T, B] ply is a policy sample (not a random opening)
    ended: jax.Array     # bool [T, B] game finished (or hit cap) on this ply
    winners: jax.Array   # int32 [T, B] winner where ended (0 = draw/cap)
    captures: jax.Array = None  # int32 [T, B, 2] captured pairs BEFORE the
                                # move (Pente; zeros otherwise)


def play_games_continuous(
    env,
    cfg: SelfPlayConfig,
    eval_fn: EvalFn,
    net_params,
    rng: jax.Array,
    total_steps: int,
) -> ContinuousRecords:
    """Advance B lanes for ``total_steps`` plies with in-place game resets.

    Per-lane move counters drive the temperature schedule and the Dirichlet
    gate (games in one batch sit at different plies after resets).  A lane
    reaching ``cfg.max_moves`` without a result is reset and scored a draw,
    mirroring the reference's move cap (``train.py:392``).
    """
    batch = cfg.batch_games
    max_moves = cfg.resolved_max_moves(env)
    fresh = env.init_batch(batch)
    center = center_mask(env)
    pcr = cfg.pcr_cheap_sims > 0
    if pcr:
        cheap_mcts = _pcr_cheap_mcts(cfg)
    gumbel = cfg.mcts.search == "gumbel"

    def one_ply(carry, _):
        states, rng = carry
        rng, k_search, k_sample, k_open, k_pcr = jax.random.split(rng, 5)

        def search(mcfg):
            if gumbel:
                from alphazero_gomoku_tpu.search.gumbel import (
                    run_gumbel_mcts,
                )
                return run_gumbel_mcts(env, mcfg, eval_fn, net_params,
                                       states, k_search)
            pi, root_q = run_mcts_with_q(env, mcfg, eval_fn, net_params,
                                         states, states.move_count,
                                         k_search)
            return pi, root_q, jnp.zeros((batch,), jnp.int32)

        if pcr:
            full_move = jax.random.bernoulli(k_pcr, cfg.pcr_full_prob)
            pi, root_q, g_act = jax.lax.cond(full_move,
                                             lambda: search(cfg.mcts),
                                             lambda: search(cheap_mcts))
        else:
            full_move = jnp.bool_(True)
            pi, root_q, g_act = search(cfg.mcts)
        temp = jnp.maximum(
            0.0, 1.0 - states.move_count.astype(jnp.float32)
            / cfg.temp_threshold
        )
        legal = jax.vmap(env.legal_mask)(states)
        if gumbel:
            actions = g_act
        else:
            actions = sample_actions(pi, temp, legal, k_sample)
        is_open = states.move_count < cfg.opening_random_moves
        if cfg.opening_random_moves:
            rand_actions = random_center_actions(
                k_open, legal.astype(jnp.float32), center)
            actions = jnp.where(is_open, rand_actions, actions)

        record_board = states.board
        record_player = states.to_move
        record_caps = getattr(states, "captures", None)
        if record_caps is None:
            record_caps = jnp.zeros((batch, 2), jnp.int32)

        states = jax.vmap(env.step)(states, actions)
        capped = states.move_count >= max_moves
        ended = states.done | capped
        winners = jnp.where(states.done, states.winner, 0)

        # reset finished lanes in place
        states = jax.tree_util.tree_map(
            lambda f, s: jnp.where(
                ended.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh, states,
        )
        # cheap (playout-cap-randomized) plies record a zero pi: value-only
        # samples under the KL's 0*log0 convention (see play_games)
        record_pi = jnp.where(full_move, pi, jnp.zeros_like(pi))
        return (states, rng), (record_board, record_player, record_pi,
                               root_q, ~is_open, ended, winners, record_caps)

    (_, _), (boards, players, pis, root_qs, recorded, ended, winners,
             captures) = (
        jax.lax.scan(one_ply, (env.init_batch(batch), rng), None,
                     length=total_steps)
    )
    return ContinuousRecords(boards=boards, players=players, pis=pis,
                             root_qs=root_qs, recorded=recorded,
                             ended=ended, winners=winners,
                             captures=captures)


def collect_examples_continuous(
    rec: ContinuousRecords, use_symmetries: bool = True,
    value_target_mix: float = 0.0, capture_planes: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Assign z per record from its game segment's outcome (host side).

    Records belonging to games still unfinished at the end of the stream
    are dropped (their outcome is unknown), as are random-opening plies.
    ``value_target_mix`` softens z toward the root search value (see
    :func:`collect_examples`).
    """
    boards = np.asarray(rec.boards)
    players = np.asarray(rec.players)
    pis = np.asarray(rec.pis)
    ended = np.asarray(rec.ended)
    winners = np.asarray(rec.winners)
    t, b = ended.shape

    # for each ply, the winner at the NEXT game boundary (inclusive) in its
    # lane: suffix-minimum of boundary indices + one gather — fully
    # vectorized (this was the last O(T) Python loop on the collection
    # path)
    idx = np.where(ended, np.arange(t, dtype=np.int64)[:, None], t)
    nxt_idx = np.minimum.accumulate(idx[::-1], axis=0)[::-1]
    has_end = nxt_idx < t
    win_fwd = np.take_along_axis(
        winners, np.minimum(nxt_idx, t - 1), axis=0).astype(np.int32)
    win_fwd = np.where(has_end, win_fwd, 0)

    z = np.where(win_fwd == 0, 0.0,
                 np.where(win_fwd == players, 1.0, -1.0)).astype(np.float32)
    if value_target_mix > 0.0:
        root_qs = np.asarray(rec.root_qs)
        z = (1.0 - value_target_mix) * z + value_target_mix * root_qs

    mask = (has_end & np.asarray(rec.recorded)).reshape(-1)
    caps = None
    if capture_planes:
        caps = np.asarray(rec.captures).reshape(-1, 2)[mask]
    # mask before encoding (see collect_examples): only unfinished-tail
    # and opening plies drop here, but the encode is the expensive step
    states = encode_board_np(
        boards.reshape(-1, *boards.shape[2:])[mask],
        players.reshape(-1)[mask],
        captures=caps,
    )
    flat_pis = pis.reshape(-1, pis.shape[-1])[mask].astype(np.float32)
    flat_z = z.reshape(-1)[mask]

    if use_symmetries:
        states, flat_pis = expand_symmetries_batch_np(states, flat_pis)
        flat_z = np.tile(flat_z, 8)

    w_at_ends = winners[ended]
    stats = {
        0: int((w_at_ends == 0).sum()),
        1: int((w_at_ends == 1).sum()),
        2: int((w_at_ends == 2).sum()),
    }
    return states, flat_pis, flat_z, stats
