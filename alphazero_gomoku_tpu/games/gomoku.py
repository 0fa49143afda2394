"""Pure-functional JAX Gomoku engine.

Re-design of the reference's per-object engine (``/root/reference/games/gomoku.py``)
as a stateless transition kernel on a pytree state: every operation is a pure
function of ``(state, action)`` with static shapes, so the whole game — and the
whole MCTS over it — jits, vmaps and shards over a device mesh.

Semantics matched to the reference:
  - board int8, 0 empty / 1 / 2; actions are flat ``r * size + c``
    (``gomoku.py:46-55``).
  - win = 5-in-a-row through the last move (``gomoku.py:155-193``).
  - draw = board full with no winner (``gomoku.py:195-197``).
  - encoded observation planes: (stones of side to move, stones of opponent,
    constant ones) — plane 2 is deliberately constant 1.0, matching
    ``gomoku.py:148``.  Layout here is NHWC (TPU-native); the host layer
    transposes to the reference's CHW at API boundaries.

There is no ``undo_move``: functional states make undo free (keep the old
state).  ``clone`` is likewise free.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.ops.lines import full_board_winner, wins_at


class GomokuState(NamedTuple):
    """Single-game state pytree. Batched variants add leading axes via vmap."""

    board: jax.Array       # int8 [size, size]; 0 empty, 1, 2
    to_move: jax.Array     # int32 scalar; 1 or 2
    last_action: jax.Array  # int32 scalar; flat action of last move, -1 if none
    move_count: jax.Array  # int32 scalar
    winner: jax.Array      # int32 scalar; 0 none, 1, 2
    done: jax.Array        # bool scalar


@dataclasses.dataclass(frozen=True)
class GomokuEnv:
    """Functional Gomoku environment. Frozen (hashable) => safe as jit static."""

    size: int = 15

    # ------------------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return self.size * self.size

    @property
    def obs_channels(self) -> int:
        return 3

    @property
    def obs_plane_scales(self):
        """Per-plane integer scales for exact uint8 replay storage
        (selfplay.buffer): all planes are binary -> scale 1."""
        return (1.0, 1.0, 1.0)

    @property
    def name(self) -> str:
        return "gomoku"

    # ------------------------------------------------------------------
    def init(self) -> GomokuState:
        return GomokuState(
            board=jnp.zeros((self.size, self.size), dtype=jnp.int8),
            to_move=jnp.int32(1),
            last_action=jnp.int32(-1),
            move_count=jnp.int32(0),
            winner=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def init_batch(self, batch: int) -> GomokuState:
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), self.init()
        )

    def from_board(self, board, to_move, move_count=None) -> GomokuState:
        """Reconstruct a state from a raw board (no history available).

        Winner is recovered by full-board line scan; ``last_action`` is
        unknown (-1).  This is the device analogue of the reference players
        rebuilding a game from the passed board (``players/player.py:59-71``).
        """
        board = jnp.asarray(board, jnp.int8)
        to_move = jnp.asarray(to_move, jnp.int32)
        stones = jnp.sum((board != 0).astype(jnp.int32))
        move_count = (
            stones if move_count is None else jnp.asarray(move_count, jnp.int32)
        )
        winner = full_board_winner(board)
        done = (winner != 0) | (stones >= self.num_actions)
        return GomokuState(
            board=board,
            to_move=to_move,
            last_action=jnp.int32(-1),
            move_count=move_count,
            winner=winner,
            done=done,
        )

    # ------------------------------------------------------------------
    def legal_mask(self, state: GomokuState) -> jax.Array:
        """bool [A]: playable iff the square is empty and game not over."""
        empty = (state.board == 0).reshape(-1)
        return empty & ~state.done

    def step(self, state: GomokuState, action) -> GomokuState:
        """Apply a move (assumed legal; see ``step_safe`` for masking).

        Computes the winner incrementally from the placed stone, the TPU
        analogue of the reference's last-move-local ``check_winner``.
        """
        action = jnp.asarray(action, jnp.int32)
        r, c = action // self.size, action % self.size
        me = state.to_move
        board = state.board.at[r, c].set(me.astype(jnp.int8))
        won = wins_at(board, r, c, me.astype(jnp.int8))
        winner = jnp.where(won, me, 0).astype(jnp.int32)
        move_count = state.move_count + 1
        done = won | (move_count >= self.num_actions)
        return GomokuState(
            board=board,
            to_move=(3 - me).astype(jnp.int32),
            last_action=action,
            move_count=move_count,
            winner=winner,
            done=done,
        )

    def step_safe(self, state: GomokuState, action) -> GomokuState:
        """Like ``step`` but a no-op on finished games (for lockstep batches)."""
        nxt = self.step(state, action)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(state.done, a, b), state, nxt
        )

    # ------------------------------------------------------------------
    def encode(self, state: GomokuState) -> jax.Array:
        """float32 [size, size, 3] NHWC observation for the network."""
        me = state.to_move.astype(jnp.int8)
        return jnp.stack(
            [
                (state.board == me).astype(jnp.float32),
                (state.board == 3 - me).astype(jnp.float32),
                jnp.ones((self.size, self.size), jnp.float32),
            ],
            axis=-1,
        )

    # ------------------------------------------------------------------
    def terminal_value(self, state: GomokuState) -> jax.Array:
        """Value of a terminal state for the side to move.

        Matches the reference MCTS convention (``new_mcts_alpha.py:106-112``):
        any non-draw terminal is a loss (-1) for the player to move, since the
        opponent just completed a win; draws are 0.
        """
        return jnp.where(state.winner == 0, 0.0, -1.0).astype(jnp.float32)
