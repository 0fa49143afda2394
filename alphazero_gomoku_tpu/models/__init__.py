"""AlphaZero policy/value network, losses, training step and checkpoints."""

from alphazero_gomoku_tpu.models.resnet import (  # noqa: F401
    NetConfig,
    init_variables,
    apply,
)
from alphazero_gomoku_tpu.models.model import AZModel  # noqa: F401
