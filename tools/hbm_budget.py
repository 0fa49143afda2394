#!/usr/bin/env python
"""HBM accounting for the lockstep self-play program (ROADMAP #3 close-out).

AOT-compiles ``play_games`` at a given (batch, sims, infer) WITHOUT
executing it and prints XLA's own memory analysis: argument / output /
temp / peak bytes.  This is the ground truth behind the documented
budget formula in ``selfplay/budget.py`` (the pre-flight guard), and the
tool that pinned the batch-512 f32 fault to HBM exhaustion.

Usage:
    python tools/hbm_budget.py 512 400 f32
    python tools/hbm_budget.py 512 400 int8 --moves 48
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, "/root/repo")


def analyze(batch: int, sims: int, infer: str, moves: int = 48,
            board_size: int = 15, blocks: int = 6, channels: int = 128,
            game: str = "gomoku") -> dict:
    import jax
    import jax.numpy as jnp

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    from alphazero_gomoku_tpu.selfplay.runner import play_games

    env = make_env(game, board_size)
    model = AZModel(board_size=board_size, n_res_blocks=blocks,
                    channels=channels, seed=0)
    if infer == "int8":
        from alphazero_gomoku_tpu.ops.int8_net import (make_int8_eval_fn,
                                                       quantize_int8,
                                                       random_calib_obs)
        cin = env.encode(env.init()).shape[-1]
        bundle = quantize_int8(model.cfg, model.params, model.batch_stats,
                               random_calib_obs(model.cfg, cin=cin))
        eval_fn = make_int8_eval_fn(model.cfg)
    else:
        bundle = bundle_of(model)
        eval_fn = make_eval_fn(model.cfg)
    cfg = SelfPlayConfig(
        batch_games=batch, temp_threshold=10, max_moves=moves,
        mcts=MCTSConfig(n_simulations=sims, cpuct=1.0, add_noise=True,
                        dirichlet_alpha=0.05, dirichlet_epsilon=0.15,
                        dirichlet_moves=10, max_depth=56, backend="pallas"),
    )
    fn = jax.jit(functools.partial(play_games, env, cfg, eval_fn))
    lowered = fn.lower(bundle, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    out = {
        "batch": batch, "sims": sims, "infer": infer, "moves": moves,
        "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
        "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
        "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
        "alias_mb": round(ma.alias_size_in_bytes / 2**20, 1),
        "peak_mb": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 2**20, 1),
        "generated_code_mb": round(
            ma.generated_code_size_in_bytes / 2**20, 1),
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", type=int)
    ap.add_argument("sims", type=int)
    ap.add_argument("infer", choices=["f32", "int8"])
    ap.add_argument("--moves", type=int, default=48)
    ap.add_argument("--game", default="gomoku")
    print(json.dumps(analyze(**vars(ap.parse_args()))), flush=True)
