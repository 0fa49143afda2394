#!/usr/bin/env python
"""Root shim: ``python play_loop.py <p1> <p2> <n_games>`` (reference-style)."""
import sys

from alphazero_gomoku_tpu.cli.play_loop import main

if __name__ == "__main__":
    sys.exit(main())
