#!/usr/bin/env python
"""Pick the strongest snapshot of a training run (TRAINING_GUIDE 7c).

Gateless runs drift past their peak (run 5 regressed from ~iter200 to
iter450); this tool automates the harvest: it brackets the run's
snapshots, plays mirrored-opening device arenas up a single-elimination
ladder (later snapshot seeded first), and prints the surviving
checkpoint plus every match result. Decisive-pair counts (win_both /
loss_both) break near-0.5 win rates.

Usage:
    python tools/harvest_run.py runs/models_run6 [--games 32] [--sims 256]
        [--every 50] [--game gomoku] [--baseline checkpoints/best_gomoku.ckpt]

``--baseline`` adds a final match of the ladder winner against an
external checkpoint (e.g. the currently shipped one).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import jax


def snapshots(model_dir: Path, every: int):
    """Snapshot paths at iteration spacing >= ``every``, plus the last."""
    snaps = {}
    for p in model_dir.glob("snapshot_iter*.ckpt"):
        m = re.search(r"iter(\d+)_", p.name)
        if m:
            snaps[int(m.group(1))] = p
    if not snaps:
        raise SystemExit(f"no snapshots under {model_dir}")
    iters = sorted(snaps)
    picked, last = [], None
    for it in iters:
        if last is None or it - last >= every:
            picked.append(it)
            last = it
    if iters[-1] not in picked:
        picked.append(iters[-1])
    return [(it, snaps[it]) for it in picked]


def duel(env, cfg, eval_fn, a, b, games, seed):
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.selfplay import evaluate_params_detailed
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of

    ma = AZModel.from_checkpoint(str(a), board_size=env.size)
    mb = AZModel.from_checkpoint(str(b), board_size=env.size)
    return evaluate_params_detailed(
        env, cfg, eval_fn, bundle_of(ma), bundle_of(mb), games,
        jax.random.PRNGKey(seed))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=256)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--game", default="gomoku", choices=["gomoku", "pente"])
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.selfplay.loop import make_eval_fn

    cands = snapshots(Path(args.model_dir), args.every)
    probe = AZModel.from_checkpoint(str(cands[-1][1]), board_size=args.size)
    env = make_env(args.game, args.size,
                   capture_planes=probe.cfg.in_channels == 5)
    cfg = MCTSConfig(n_simulations=args.sims, cpuct=1.0, add_noise=False,
                     max_depth=56, backend=args.backend)
    eval_fn = make_eval_fn(probe.cfg)

    # single-elim ladder from the latest snapshot downward: the champion
    # must beat (>= 0.5, decisive pairs as tie-break) each earlier pick
    order = list(reversed(cands))  # latest first
    champ_it, champ = order[0]
    results = []
    for it, path in order[1:]:
        r = duel(env, cfg, eval_fn, champ, path, args.games,
                 args.seed + it)
        decisive = r["pairs"]["win_both"] - r["pairs"]["loss_both"]
        keep = r["win_rate"] > 0.5 or (r["win_rate"] == 0.5 and decisive >= 0)
        results.append({"a": f"iter{champ_it}", "b": f"iter{it}",
                        "a_win_rate": round(r["win_rate"], 4),
                        "ci95": [round(x, 4) for x in r["ci95"]],
                        "pairs": r["pairs"], "kept": "a" if keep else "b"})
        print(json.dumps(results[-1]), flush=True)
        if not keep:
            champ_it, champ = it, path

    out = {"winner": f"iter{champ_it}", "path": str(champ),
           "matches": results}
    if args.baseline:
        r = duel(env, cfg, eval_fn, champ, Path(args.baseline), args.games,
                 args.seed + 7777)
        out["vs_baseline"] = {
            "baseline": args.baseline,
            "win_rate": round(r["win_rate"], 4),
            "ci95": [round(x, 4) for x in r["ci95"]],
            "pairs": r["pairs"],
        }
        print(json.dumps({"vs_baseline": out["vs_baseline"]}), flush=True)
    print(json.dumps({"winner": out["winner"], "path": out["path"]}))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
