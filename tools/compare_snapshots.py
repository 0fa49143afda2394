#!/usr/bin/env python
"""Head-to-head device arena between two checkpoints.

Loads two snapshots and runs the mirrored-opening arena
(``selfplay.arena.evaluate_params_detailed``) between them on device —
the fast way to pick which snapshot of a run to promote (16-64 games at
a few hundred sims complete in seconds on one chip, vs minutes per game
through the host-side tournament runner).

Usage:
    python tools/compare_snapshots.py A.ckpt B.ckpt [--games 32]
        [--sims 256] [--backend pallas] [--seed 0]

Prints one JSON line: A's win rate over B with CI and pair tally.
"""

from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_a")
    ap.add_argument("ckpt_b")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas"])
    ap.add_argument("--search", default="puct", choices=["puct", "gumbel"],
                    help="arena search mode for BOTH sides (gumbel uses "
                         "sequential halving at --sims with m=16)")
    ap.add_argument("--max-depth", type=int, default=56)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay import evaluate_params_detailed
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    ma = AZModel.from_checkpoint(args.ckpt_a, board_size=args.size)
    mb = AZModel.from_checkpoint(args.ckpt_b, board_size=args.size)
    env = make_env(args.game, args.size,
                   capture_planes=ma.cfg.in_channels == 5)
    if ma.cfg != mb.cfg:
        raise SystemExit(f"architecture mismatch: {ma.cfg} vs {mb.cfg}")
    cfg = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                     max_depth=args.max_depth, backend=args.backend,
                     search=args.search,
                     gumbel_round_parallel=args.search == "gumbel")
    r = evaluate_params_detailed(
        env, cfg, make_eval_fn(ma.cfg), bundle_of(ma), bundle_of(mb),
        args.games, jax.random.PRNGKey(args.seed))
    print(json.dumps({
        "a": args.ckpt_a, "b": args.ckpt_b, "sims": args.sims,
        "search": args.search,
        "a_wins": r["wins"], "played": r["played"], "draws": r["draws"],
        "a_win_rate": round(r["win_rate"], 4),
        "ci95": [round(x, 4) for x in r["ci95"]],
        "pairs": r["pairs"],
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
