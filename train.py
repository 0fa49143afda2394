#!/usr/bin/env python
"""Root shim: ``python train.py [flags]`` (reference-style trainer entry)."""
import sys

from alphazero_gomoku_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
