#!/usr/bin/env python
"""Root shim: ``python play.py <player1> <player2>`` (reference-style)."""
import sys

from alphazero_gomoku_tpu.cli.play import main

if __name__ == "__main__":
    sys.exit(main())
