"""Arena evaluation: candidate vs best, batched lockstep on device.

Re-design of the reference's multiprocess evaluation
(``/root/reference/train.py:165-245,418-569``): instead of worker processes
loading two checkpoints from disk, both parameter sets stay in HBM and all
games advance lockstep in one jitted ``while_loop``.

Reference semantics preserved:
  - random opening move for player 1 restricted to the centre 9x9
    (radius 4) for opening diversity (``train.py:191-198``).
  - seats alternate: the candidate plays P1 in even-indexed games
    (``train.py:201,220``).
  - deterministic argmax move selection, Dirichlet noise off
    (``train.py:204-225``).
  - a game still unfinished at the move cap counts as a draw
    (``train.py:229-234``).

The game loop advances a PAIR of plies per iteration (P2's move then P1's
move), so each MCTS call uses one fixed parameter set — no per-ply parameter
select.  Finished games freeze via ``step_safe``.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.search.tree import EvalFn, MCTSConfig, run_mcts

OPENING_RADIUS = 4  # centre 9x9, reference train.py:196


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def arena_half(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    params_p1,
    params_p2,
    n_games: int,
    rng: jax.Array,
) -> jax.Array:
    """Play ``n_games`` lockstep games; P1 uses params_p1, P2 params_p2.

    Returns winners [n_games] (0 draw / 1 / 2).
    """
    size = env.size
    center = size // 2
    rng, k_r, k_c = jax.random.split(rng, 3)
    r0 = jax.random.randint(k_r, (n_games,), center - OPENING_RADIUS,
                            center + OPENING_RADIUS + 1)
    c0 = jax.random.randint(k_c, (n_games,), center - OPENING_RADIUS,
                            center + OPENING_RADIUS + 1)
    states = env.init_batch(n_games)
    states = jax.vmap(env.step)(states, (r0 * size + c0).astype(jnp.int32))

    zeros = jnp.zeros((n_games,), jnp.int32)

    def half_move(states, params, key):
        pi = run_mcts(env, cfg, eval_fn, params, states, zeros, key)
        actions = jnp.argmax(pi, axis=-1).astype(jnp.int32)
        return jax.vmap(env.step_safe)(states, actions)

    max_pairs = (env.num_actions + 1) // 2

    def cond(carry):
        states, _, t = carry
        return (t < max_pairs) & ~jnp.all(states.done)

    def body(carry):
        states, rng, t = carry
        rng, k2, k1 = jax.random.split(rng, 3)
        states = half_move(states, params_p2, k2)  # P2 to move first
        states = half_move(states, params_p1, k1)
        return (states, rng, t + 1)

    states, _, _ = jax.lax.while_loop(cond, body, (states, rng, jnp.int32(0)))
    return states.winner


def wilson_ci(wins: int, n: int, z: float = 1.96) -> Tuple[float, float]:
    """Wilson score interval for a binomial proportion (95% by default).

    Preferred over the normal approximation at arena sample sizes (n of
    16-64), where the latter routinely produces intervals outside [0, 1].
    """
    if n == 0:
        return (0.0, 1.0)
    p = wins / n
    z2 = z * z
    denom = 1.0 + z2 / n
    centre = (p + z2 / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / denom
    return (max(0.0, centre - half), min(1.0, centre + half))


def evaluate_params_detailed(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    params_new,
    params_best,
    n_games: int,
    rng: jax.Array,
    arena_half_fn=None,
) -> Dict[str, object]:
    """Candidate-vs-best arena with mirrored openings and honest statistics.

    Design (response to the gate-noise analysis, DECISIONS.md round-3):
    play is deterministic argmax with noise off, so game outcomes cluster
    by opening and the effective sample size of an independent-openings
    arena is far below its game count.  Both seat halves here use the SAME
    rng, hence the SAME random centre-9x9 opening sequence: game ``i`` of
    the candidate-as-P1 half and game ``i`` of the candidate-as-P2 half
    start from the identical position with seats swapped (mirrored pairs —
    the variance of the seat-advantage component cancels within a pair at
    no extra game cost).

    Returns a dict: ``wins / played / draws / win_rate`` (the reference's
    gate statistic: wins/played, draws count against), ``ci95`` — a Wilson
    95% interval on the win rate — and ``pairs`` with the per-opening
    mirrored outcomes (``win_both / split / loss_both / n``; a candidate
    that wins BOTH games of an opening beat the opponent from each seat of
    the same position — much stronger evidence than two wins from
    different openings).

    The candidate takes P1 in even-indexed games (reference seat
    alternation), so it plays P1 in ceil(n/2) games and P2 in the rest.
    ``arena_half_fn(p1, p2, n, rng) -> winners`` overrides the single-chip
    kernel (the mesh-sharded arena from ``parallel.make_sharded_arena``;
    it may round the per-half game count up so every chip plays equally —
    the win rate uses the games actually played).
    """
    n_as_p1 = (n_games + 1) // 2
    n_as_p2 = n_games // 2
    if arena_half_fn is None:
        def arena_half_fn(p1, p2, n, key):
            return arena_half(env, cfg, eval_fn, p1, p2, n, key)

    new_wins = 0
    draws = 0
    played = 0
    w_a = w_b = None
    if n_as_p1 > 0:
        # same rng for both halves => identical opening sequences (pairing)
        w_a = jax.device_get(arena_half_fn(params_new, params_best,
                                           n_as_p1, rng))
        new_wins += int((w_a == 1).sum())
        draws += int((w_a == 0).sum())
        played += int(w_a.shape[0])
    if n_as_p2 > 0:
        w_b = jax.device_get(arena_half_fn(params_best, params_new,
                                           n_as_p2, rng))
        new_wins += int((w_b == 2).sum())
        draws += int((w_b == 0).sum())
        played += int(w_b.shape[0])

    pairs = {"win_both": 0, "split": 0, "loss_both": 0, "n": 0}
    # openings only align index-for-index when both halves drew the same
    # shape from the same key (even n_games); an odd trailing game still
    # counts in the win rate but has no mirror partner
    if (w_a is not None and w_b is not None
            and w_a.shape[0] == w_b.shape[0]):
        n_pairs = w_a.shape[0]
        cand_won_a = w_a[:n_pairs] == 1
        cand_won_b = w_b[:n_pairs] == 2
        pairs["win_both"] = int((cand_won_a & cand_won_b).sum())
        pairs["loss_both"] = int((~cand_won_a & ~cand_won_b).sum())
        pairs["n"] = n_pairs
        pairs["split"] = n_pairs - pairs["win_both"] - pairs["loss_both"]

    win_rate = new_wins / float(played) if played else 0.0
    return {
        "wins": new_wins,
        "played": played,
        "draws": draws,
        "win_rate": win_rate,
        "ci95": wilson_ci(new_wins, played),
        "pairs": pairs,
    }


def evaluate_params(
    env,
    cfg: MCTSConfig,
    eval_fn: EvalFn,
    params_new,
    params_best,
    n_games: int,
    rng: jax.Array,
    arena_half_fn=None,
) -> Tuple[int, float, int]:
    """Compatibility wrapper: returns (new_wins, win_rate, draws)."""
    r = evaluate_params_detailed(env, cfg, eval_fn, params_new, params_best,
                                 n_games, rng, arena_half_fn=arena_half_fn)
    return r["wins"], r["win_rate"], r["draws"]
