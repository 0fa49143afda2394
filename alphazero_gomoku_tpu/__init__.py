"""alphazero_gomoku_tpu — a TPU-native AlphaZero framework for Gomoku and Pente.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
AlphaZero-Gomoku project (pure-Python PyTorch+NumPy, see SURVEY.md):

  - ``games``    : vectorized pure-functional rule engines (Gomoku, Pente) as
                   jitted pytree transition kernels, plus host-side object
                   engines with the reference's duck-typed API for CLIs/GUIs
                   and differential testing.
  - ``models``   : AlphaZero residual policy/value network as an explicit
                   parameter pytree (NHWC, MXU-friendly), losses and the
                   optax training step matching the reference's optimizer
                   semantics (Adam + L2 + global-norm clip).
  - ``search``   : mctx-style array-tree PUCT MCTS living entirely in HBM —
                   jitted select/expand/evaluate/backup, batched across games.
  - ``selfplay`` : lockstep batched self-play, replay buffer, arena
                   evaluation with gating, and the full training loop.
  - ``parallel`` : device-mesh sharding (pjit/shard_map) for multi-chip
                   data-parallel self-play and psum gradient training.
  - ``players``  : the reference's ``Player(rules, size).play(...)`` plugin
                   protocol, backed by the jitted engine.
"""

__version__ = "0.1.0"
