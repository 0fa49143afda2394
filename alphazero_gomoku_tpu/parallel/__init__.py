"""Device-mesh parallelism: sharded self-play and psum-gradient training."""

from alphazero_gomoku_tpu.parallel.mesh import (  # noqa: F401
    form_global_batches,
    gather_trajectories,
    global_buffer_len,
    local_trajectory_shards,
    make_mesh,
    make_sharded_arena,
    make_sharded_gather_epoch,
    make_sharded_selfplay,
    make_sharded_selfplay_continuous,
    make_sharded_train_epoch,
    min_local_buffer_len,
)
from alphazero_gomoku_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
)
