#!/usr/bin/env python
"""Root-level player shim (the reference keeps a duplicate ``player.py`` at
the repo root, byte-identical to ``players/player.py``; here it re-exports)."""

from alphazero_gomoku_tpu.players.player import Player  # noqa: F401
