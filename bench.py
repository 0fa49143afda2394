#!/usr/bin/env python
"""Benchmark: self-play throughput at 400 sims/move (BASELINE config #3).

Runs lockstep batched self-play of full 15x15 Gomoku games with the full
6-block/128-channel network and 400 MCTS simulations per move on the
available accelerator, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "moves/sec", "vs_baseline": N}

Baseline derivation (see BASELINE.md): the reference's balanced production
run reports 20-40 min per 70-game self-play iteration at 1600 sims on a
28-worker CPU box (`TRAINING_GUIDE.md:349-363`), i.e. ~70 games x ~55 moves
/ 1800 s ~= 2.1 moves/s at 1600 sims; scaled x4 to this benchmark's 400
sims => ~8.6 moves/s aggregate for the reference engine.  vs_baseline is
measured moves/s divided by that 8.6 moves/s.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MOVES_PER_SEC = 8.6  # reference CPU engine @ 400 sims (see header)


def run_bench(batch_games: int = 64, n_simulations: int = 400,
              board_size: int = 15, n_res_blocks: int = 6,
              channels: int = 128, warmup_moves: int = 8,
              measure_moves: int = 48, seed: int = 0,
              dtype: str = "float32", fused: bool = False,
              backend: str = "xla") -> dict:
    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    from alphazero_gomoku_tpu.selfplay.runner import play_games
    import dataclasses

    env = make_env("gomoku", board_size)
    model = AZModel(board_size=board_size, n_res_blocks=n_res_blocks,
                    channels=channels, seed=seed,
                    compute_dtype=jnp.dtype(dtype))
    if fused:
        from alphazero_gomoku_tpu.ops.fused_net import (
            fold_bn, make_fused_eval_fn,
        )
        eval_fn = make_fused_eval_fn(model.cfg)
    else:
        eval_fn = make_eval_fn(model.cfg)
    cfg = SelfPlayConfig(
        batch_games=batch_games,
        temp_threshold=10,
        mcts=MCTSConfig(n_simulations=n_simulations, cpuct=1.0,
                        add_noise=True, dirichlet_alpha=0.05,
                        dirichlet_epsilon=0.15, dirichlet_moves=10,
                        max_depth=56, backend=backend),
    )

    import functools
    del warmup_moves  # single compiled program; warmup = first invocation
    if fused:
        bundle = fold_bn(model.cfg, model.params, model.batch_stats)
    else:
        bundle = bundle_of(model)

    meas_cfg = dataclasses.replace(cfg, max_moves=measure_moves)
    meas = jax.jit(functools.partial(play_games, env, meas_cfg, eval_fn))
    # warm up with a TRUE sync: fetch a result value. (block_until_ready is
    # not a real barrier on tunneled devices; timing after it would include
    # the tail of the warm-up execution.)
    warm = meas(bundle, jax.random.PRNGKey(2))
    int(np.asarray(jnp.sum(warm.moves_played)))

    t0 = time.time()
    traj = meas(bundle, jax.random.PRNGKey(3))
    moves = int(np.asarray(jnp.sum(traj.moves_played)))
    dt = time.time() - t0

    value = moves / dt
    return {
        "metric": (
            f"self-play moves/sec @ {n_simulations} sims "
            f"(Gomoku {board_size}x{board_size}, {n_res_blocks}x{channels} "
            f"net, batch {batch_games}, 1 chip)"
        ),
        "value": round(value, 2),
        "unit": "moves/sec",
        "vs_baseline": round(value / BASELINE_MOVES_PER_SEC, 2),
        "detail": {
            "moves": moves,
            "seconds": round(dt, 3),
            "leaf_evals_per_sec": round(value * n_simulations, 0),
            "device": str(jax.devices()[0]),
        },
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
