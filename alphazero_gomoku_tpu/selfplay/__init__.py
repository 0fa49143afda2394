"""Self-play generation, replay buffer, arena evaluation and training loop."""

from alphazero_gomoku_tpu.selfplay.runner import (  # noqa: F401
    SelfPlayConfig,
    play_games,
    collect_examples,
)
from alphazero_gomoku_tpu.selfplay.buffer import (  # noqa: F401
    ReplayBuffer,
    save_replay_buffer,
    load_replay_buffer,
)
from alphazero_gomoku_tpu.selfplay.arena import (  # noqa: F401
    evaluate_params,
    evaluate_params_detailed,
    wilson_ci,
)
from alphazero_gomoku_tpu.selfplay.loop import train_alphazero  # noqa: F401
