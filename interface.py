#!/usr/bin/env python
"""Root shim: pygame GUI app / mirror (reference-style ``interface.py``)."""
from alphazero_gomoku_tpu.gui.interface import main

if __name__ == "__main__":
    main()
