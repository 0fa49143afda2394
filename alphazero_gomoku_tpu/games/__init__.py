"""Game rule engines.

Two complementary implementations of each game:

  - :mod:`alphazero_gomoku_tpu.games.gomoku` / ``.pente`` — pure-functional
    JAX transition kernels operating on pytree states.  These are the
    production engines: jit/vmap/shard_map-able, static shapes, no Python
    control flow per move.
  - :mod:`alphazero_gomoku_tpu.games.host` — small object-style NumPy engines
    exposing the reference project's duck-typed API (``do_move``,
    ``undo_move``, ``clone``, ``get_valid_moves``, ``get_encoded_state``,
    ``check_winner``, ``display``, ...; see reference ``games/gomoku.py:20-206``
    and ``games/pente.py:12-267``).  Used by CLIs, the GUI, host players and
    as the differential-test oracle for the JAX kernels.
"""

from alphazero_gomoku_tpu.games.host import Gomoku, Pente  # noqa: F401
from alphazero_gomoku_tpu.games import gomoku, pente  # noqa: F401
from alphazero_gomoku_tpu.games.gomoku import GomokuEnv  # noqa: F401
from alphazero_gomoku_tpu.games.pente import PenteEnv  # noqa: F401


def make_env(name: str, size: int = 15, capture_planes: bool = False):
    """Return the functional env singleton for a game name.

    ``capture_planes`` (Pente only) appends two captured-pair observation
    planes; ignored for Gomoku.
    """
    name = name.lower()
    if name == "gomoku":
        return GomokuEnv(size)
    if name == "pente":
        return PenteEnv(size, capture_planes=capture_planes)
    raise ValueError(f"unknown game: {name!r} (expected 'gomoku' or 'pente')")


def make_host_game(name: str, size: int = 15):
    """Return a host-side object engine for a game name."""
    name = name.lower()
    if name == "gomoku":
        return Gomoku(size)
    if name == "pente":
        return Pente(size)
    raise ValueError(f"unknown game: {name!r} (expected 'gomoku' or 'pente')")
