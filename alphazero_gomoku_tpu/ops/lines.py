"""Line-of-five detection kernels.

The reference checks a win by walking outward from the last move in the four
line directions with Python ``while`` loops (``/root/reference/games/gomoku.py:155-193``).
The TPU-native equivalent below reads the 9-cell window centred on the move
along each direction with a single clipped gather and computes the run length
through the centre with cumulative products — fully static shapes, no
data-dependent control flow, vmap-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Line axes for n-in-a-row checks: vertical, horizontal, two diagonals.
LINE_DIRS = ((1, 0), (0, 1), (1, 1), (1, -1))


def run_length_through(board: jnp.ndarray, r, c, player, need: int = 5):
    """Max same-colour run length through (r, c) over the 4 line axes.

    Args:
        board: int array ``[H, W]`` with 0 empty / 1 / 2.
        r, c: scalar int coordinates of the stone to check through.
        player: scalar int colour expected on the run.
        need: run-length window radius is ``need - 1`` (5-in-a-row -> 4).

    Returns:
        Scalar int32: the maximum run length through (r, c) across the 4 axes.
        (The centre cell is counted as belonging to ``player`` regardless of
        board contents, matching the caller placing the stone first.)
    """
    h, w = board.shape
    radius = need - 1
    ks = jnp.arange(1, radius + 1, dtype=jnp.int32)
    best = jnp.int32(1)
    for dr, dc in LINE_DIRS:
        total = jnp.int32(1)
        for sign in (1, -1):
            rr = r + sign * ks * dr
            cc = c + sign * ks * dc
            inb = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
            vals = board[jnp.clip(rr, 0, h - 1), jnp.clip(cc, 0, w - 1)]
            same = (inb & (vals == player)).astype(jnp.int32)
            # consecutive run starting at distance 1: sum of cumprod
            total = total + jnp.sum(jnp.cumprod(same))
        best = jnp.maximum(best, total)
    return best


def wins_at(board: jnp.ndarray, r, c, player, need: int = 5):
    """True iff placing/being at (r, c) gives ``player`` an n-in-a-row."""
    return run_length_through(board, r, c, player, need) >= need


def has_line(board: jnp.ndarray, player, need: int = 5):
    """Full-board n-in-a-row check for ``player`` (no last-move hint).

    Shift-and-AND over the 4 line axes: a run of ``need`` exists iff the AND
    of ``need`` progressively shifted copies of the player mask is nonempty.
    Used when reconstructing a state from a raw board (e.g. the player plugin
    protocol hands over boards without history).
    """
    h, w = board.shape
    mine = board == player
    found = jnp.bool_(False)
    pad = need - 1
    big = jnp.zeros((h + 2 * pad, w + 2 * pad), jnp.bool_).at[
        pad:pad + h, pad:pad + w].set(mine)
    for dr, dc in LINE_DIRS:
        acc = jnp.ones((h, w), jnp.bool_)
        for k in range(need):
            r0, c0 = pad + k * dr, pad + k * dc
            acc = acc & jax.lax.slice(big, (r0, c0), (r0 + h, c0 + w))
        found = found | jnp.any(acc)
    return found


def full_board_winner(board: jnp.ndarray, need: int = 5):
    """int32 winner (0/1/2) from a raw board by exhaustive line scan."""
    w1 = has_line(board, jnp.int8(1), need)
    w2 = has_line(board, jnp.int8(2), need)
    return jnp.where(w1, 1, jnp.where(w2, 2, 0)).astype(jnp.int32)
