"""Search: array-tree PUCT MCTS (device) and a heuristic baseline (host)."""

from alphazero_gomoku_tpu.search.tree import MCTSConfig, run_mcts  # noqa: F401
