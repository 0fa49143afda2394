#!/usr/bin/env python
"""Compare policy sharpness of two checkpoints on shared positions.

Diagnostic for the gen-2 training regression (run-15): the candidate
held ~0.5 vs its starting net under gumbel@64 arenas but lost 0.33
under f32 puct@400 — a CONFIG-DEPENDENT divergence.  One mechanism that
produces exactly this signature is progressive prior sharpening: the
gumbel policy target pi' = softmax(logits + sigma(completedQ)) applies a
sharpening transform to the net's own policy each generation; PUCT's
exploration term U = cpuct * P * sqrt(N)/(1+n) starves when most
actions' P ~= 0, while gumbel root sampling re-softens via top-m gumbel
noise, so an over-sharp net plays fine under gumbel and badly under
deep PUCT.

This tool measures that directly: mean policy entropy, top-1/top-8
prior mass, and the count of actions above 1e-3, for each checkpoint,
over positions drawn from a replay buffer (the distribution the nets
actually see).  Prints one JSON line per checkpoint plus a delta line.

Usage:
    python tools/policy_entropy_probe.py A.ckpt B.ckpt \
        --buffer runs/models_run15/replay_buffer_latest.npz [--n 512]

CPU-friendly (set JAX_PLATFORMS=cpu to keep the TPU free).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_positions(buffer_path: str, n: int, seed: int) -> np.ndarray:
    """Sample n encoded states [n, size, size, C] from a saved buffer.

    Schema matches ReplayBuffer.save: states (uint8 or f32), pis, zs,
    capacity, channel_scales (uint8 decode multipliers).  Rows with an
    all-zero pi are unfilled ring slots and are skipped.
    """
    data = np.load(buffer_path)
    states = data["states"]
    filled = np.flatnonzero(np.abs(data["pis"]).sum(axis=1) > 0)
    rng = np.random.default_rng(seed)
    idx = rng.choice(filled, size=min(n, len(filled)), replace=False)
    batch = states[idx].astype(np.float32)
    if states.dtype == np.uint8 and "channel_scales" in data:
        batch = batch * data["channel_scales"]
    return batch


def probe(ckpt: str, obs: np.ndarray, board_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn

    model = AZModel.from_checkpoint(ckpt, board_size=board_size)
    eval_fn = make_eval_fn(model.cfg)

    @jax.jit
    def forward(bundle, x):
        p, v = eval_fn(bundle, x)
        logp = jnp.log(jnp.maximum(p, 1e-12))
        ent = -jnp.sum(p * logp, axis=-1)
        top1 = jnp.max(p, axis=-1)
        top8 = jnp.sum(jnp.sort(p, axis=-1)[:, -8:], axis=-1)
        alive = jnp.sum(p > 1e-3, axis=-1)
        return ent, top1, top8, alive, v

    ent, top1, top8, alive, v = forward(bundle_of(model), jnp.asarray(obs))
    return {
        "ckpt": ckpt,
        "positions": int(obs.shape[0]),
        "mean_entropy_nats": round(float(np.mean(ent)), 4),
        "median_entropy_nats": round(float(np.median(ent)), 4),
        "mean_top1_mass": round(float(np.mean(top1)), 4),
        "mean_top8_mass": round(float(np.mean(top8)), 4),
        "mean_actions_above_1e-3": round(float(np.mean(alive)), 2),
        "mean_abs_value": round(float(np.mean(np.abs(v))), 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_a")
    ap.add_argument("ckpt_b")
    ap.add_argument("--buffer", required=True,
                    help="replay_buffer .npz to sample positions from")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    obs = load_positions(args.buffer, args.n, args.seed)
    a = probe(args.ckpt_a, obs, args.size)
    b = probe(args.ckpt_b, obs, args.size)
    print(json.dumps(a))
    print(json.dumps(b))
    print(json.dumps({
        "entropy_delta_nats": round(
            a["mean_entropy_nats"] - b["mean_entropy_nats"], 4),
        "note": "negative delta = A sharper than B",
    }))


if __name__ == "__main__":
    main()
