"""Pure-functional JAX Pente engine.

Pente = Gomoku + custodial captures: playing ``mine`` so that the pattern
``mine-opp-opp-mine`` appears along any of 8 rays removes the opponent pair
and scores one captured pair; 5 captured pairs win, as does 5-in-a-row
(reference ``/root/reference/games/pente.py:114-152,199-233``).

Capture detection here evaluates all 8 rays in parallel with clipped gathers
and predicated scatters.  This is bit-exact with the reference's sequential
per-direction loop because the removable cells (opponent stones at distance
1 and 2 along each ray) are disjoint across rays, and the anchor cell at
distance 3 must hold one of the mover's stones, which captures never remove —
so no direction's capture can enable or disable another's.

Multi-direction simultaneous captures therefore score one pair per matching
ray, exactly like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alphazero_gomoku_tpu.ops.lines import full_board_winner, wins_at

# All 8 rays used for capture detection.
CAPTURE_DIRS = (
    (1, 0), (-1, 0), (0, 1), (0, -1),
    (1, 1), (-1, -1), (1, -1), (-1, 1),
)


class PenteState(NamedTuple):
    board: jax.Array        # int8 [size, size]
    to_move: jax.Array      # int32 scalar; 1 or 2
    last_action: jax.Array  # int32 scalar; -1 if none
    move_count: jax.Array   # int32 scalar
    winner: jax.Array       # int32 scalar
    done: jax.Array         # bool scalar
    captures: jax.Array     # int32 [2]; captured pairs for player 1, player 2


@dataclasses.dataclass(frozen=True)
class PenteEnv:
    """Functional Pente environment (hashable => safe as jit static)."""

    size: int = 15
    pairs_to_win: int = 5
    # Opt-in observation extension: two constant planes carrying each
    # side's captured-pair count (normalized by ``pairs_to_win``).  The
    # default 3-plane encoding matches the reference and is capture-blind
    # (`/root/reference/games/pente.py` exposes captures only through the
    # win check); nets trained with one setting are incompatible with the
    # other (``in_channels`` is recorded in checkpoint metadata).
    capture_planes: bool = False

    # ------------------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return self.size * self.size

    @property
    def obs_channels(self) -> int:
        return 5 if self.capture_planes else 3

    @property
    def obs_plane_scales(self):
        """Per-plane integer scales for exact uint8 replay storage
        (selfplay.buffer): binary planes scale 1; the captured-pair
        planes hold k/pairs_to_win (k <= 4 in any recorded position,
        the game ends at 5) -> scale 5 stores k itself."""
        if self.capture_planes:
            return (1.0, 1.0, 1.0, 5.0, 5.0)
        return (1.0, 1.0, 1.0)

    @property
    def name(self) -> str:
        return "pente"

    # ------------------------------------------------------------------
    def init(self) -> PenteState:
        return PenteState(
            board=jnp.zeros((self.size, self.size), dtype=jnp.int8),
            to_move=jnp.int32(1),
            last_action=jnp.int32(-1),
            move_count=jnp.int32(0),
            winner=jnp.int32(0),
            done=jnp.bool_(False),
            captures=jnp.zeros((2,), dtype=jnp.int32),
        )

    def init_batch(self, batch: int) -> PenteState:
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), self.init()
        )

    def from_board(self, board, to_move, captures=(0, 0),
                   move_count=None) -> PenteState:
        """Reconstruct a state from a raw board + capture counts.

        Winner recovery checks capture thresholds for both players and falls
        back to a full-board line scan (no last-move hint available).
        """
        board = jnp.asarray(board, jnp.int8)
        to_move = jnp.asarray(to_move, jnp.int32)
        captures = jnp.asarray(captures, jnp.int32)
        stones = jnp.sum((board != 0).astype(jnp.int32))
        move_count = (
            stones if move_count is None else jnp.asarray(move_count, jnp.int32)
        )
        line_winner = full_board_winner(board)
        cap1 = captures[0] >= self.pairs_to_win
        cap2 = captures[1] >= self.pairs_to_win
        winner = jnp.where(
            cap1, 1, jnp.where(cap2, 2, line_winner)
        ).astype(jnp.int32)
        done = (winner != 0) | jnp.all(board != 0)
        return PenteState(
            board=board,
            to_move=to_move,
            last_action=jnp.int32(-1),
            move_count=move_count,
            winner=winner,
            done=done,
            captures=captures,
        )

    # ------------------------------------------------------------------
    def legal_mask(self, state: PenteState) -> jax.Array:
        empty = (state.board == 0).reshape(-1)
        return empty & ~state.done

    def step(self, state: PenteState, action) -> PenteState:
        action = jnp.asarray(action, jnp.int32)
        size = self.size
        r, c = action // size, action % size
        me = state.to_move
        me8 = me.astype(jnp.int8)
        opp8 = (3 - me).astype(jnp.int8)

        board = state.board.at[r, c].set(me8)

        # -- custodial captures along all 8 rays (parallel; see module doc) --
        pairs_taken = jnp.int32(0)
        for dr, dc in CAPTURE_DIRS:
            r1, c1 = r + dr, c + dc
            r2, c2 = r + 2 * dr, c + 2 * dc
            r3, c3 = r + 3 * dr, c + 3 * dc
            inb = (r3 >= 0) & (r3 < size) & (c3 >= 0) & (c3 < size)
            r1c = jnp.clip(r1, 0, size - 1)
            c1c = jnp.clip(c1, 0, size - 1)
            r2c = jnp.clip(r2, 0, size - 1)
            c2c = jnp.clip(c2, 0, size - 1)
            r3c = jnp.clip(r3, 0, size - 1)
            c3c = jnp.clip(c3, 0, size - 1)
            hit = (
                inb
                & (board[r1c, c1c] == opp8)
                & (board[r2c, c2c] == opp8)
                & (board[r3c, c3c] == me8)
            )
            # Predicated removal: writes back the existing value when no hit,
            # so clipped out-of-bounds indices are harmless no-ops.
            board = board.at[r1c, c1c].set(
                jnp.where(hit, jnp.int8(0), board[r1c, c1c])
            )
            board = board.at[r2c, c2c].set(
                jnp.where(hit, jnp.int8(0), board[r2c, c2c])
            )
            pairs_taken = pairs_taken + hit.astype(jnp.int32)

        captures = state.captures.at[me - 1].add(pairs_taken)

        # -- win: enough captured pairs, else 5-in-a-row through the stone --
        won_caps = captures[me - 1] >= self.pairs_to_win
        won_line = wins_at(board, r, c, me8)
        winner = jnp.where(won_caps | won_line, me, 0).astype(jnp.int32)

        # Draw when the post-capture board is full (captures free squares,
        # so move_count alone is not a full-board test in Pente).
        board_full = jnp.all(board != 0)
        done = (winner != 0) | board_full

        return PenteState(
            board=board,
            to_move=(3 - me).astype(jnp.int32),
            last_action=action,
            move_count=state.move_count + 1,
            winner=winner,
            done=done,
            captures=captures,
        )

    def step_safe(self, state: PenteState, action) -> PenteState:
        nxt = self.step(state, action)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(state.done, a, b), state, nxt
        )

    # ------------------------------------------------------------------
    def encode(self, state: PenteState) -> jax.Array:
        """float32 [size, size, 3|5] NHWC observation.

        Base planes match Gomoku; with ``capture_planes`` two constant
        planes append the side-to-move's and opponent's captured-pair
        counts scaled to [0, 1] by ``pairs_to_win``.
        """
        me = state.to_move.astype(jnp.int8)
        planes = [
            (state.board == me).astype(jnp.float32),
            (state.board == 3 - me).astype(jnp.float32),
            jnp.ones((self.size, self.size), jnp.float32),
        ]
        if self.capture_planes:
            caps = state.captures.astype(jnp.float32) / float(self.pairs_to_win)
            mine = caps[state.to_move - 1]
            theirs = caps[2 - state.to_move]
            ones = jnp.ones((self.size, self.size), jnp.float32)
            planes += [ones * mine, ones * theirs]
        return jnp.stack(planes, axis=-1)

    # ------------------------------------------------------------------
    def terminal_value(self, state: PenteState) -> jax.Array:
        """-1 for the side to move on any decided terminal, 0 on draws
        (reference convention, ``new_mcts_alpha.py:106-112``)."""
        return jnp.where(state.winner == 0, 0.0, -1.0).astype(jnp.float32)
