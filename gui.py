#!/usr/bin/env python
"""Root shim: terminal engine + pygame mirror (reference-style ``gui.py``)."""
import sys

from alphazero_gomoku_tpu.gui.engine import main

if __name__ == "__main__":
    sys.exit(main())
