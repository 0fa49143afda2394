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
from typing import Tuple

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
    """Candidate-vs-best arena. Returns (new_wins, win_rate, draws).

    The candidate takes P1 in even-indexed games (reference seat
    alternation), so it plays P1 in ceil(n/2) games and P2 in the rest.
    ``arena_half_fn(p1, p2, n, rng) -> winners`` overrides the single-chip
    kernel (the mesh-sharded arena from ``parallel.make_sharded_arena``;
    it may round the per-half game count up so every chip plays equally —
    the win rate uses the games actually played).
    """
    n_as_p1 = (n_games + 1) // 2
    n_as_p2 = n_games // 2
    rng_a, rng_b = jax.random.split(rng)
    if arena_half_fn is None:
        def arena_half_fn(p1, p2, n, key):
            return arena_half(env, cfg, eval_fn, p1, p2, n, key)

    new_wins = 0
    draws = 0
    played = 0
    if n_as_p1 > 0:
        w = jax.device_get(arena_half_fn(params_new, params_best,
                                         n_as_p1, rng_a))
        new_wins += int((w == 1).sum())
        draws += int((w == 0).sum())
        played += int(w.shape[0])
    if n_as_p2 > 0:
        w = jax.device_get(arena_half_fn(params_best, params_new,
                                         n_as_p2, rng_b))
        new_wins += int((w == 2).sum())
        draws += int((w == 0).sum())
        played += int(w.shape[0])

    win_rate = new_wins / float(played) if played else 0.0
    return new_wins, win_rate, draws
