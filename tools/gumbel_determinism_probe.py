#!/usr/bin/env python
"""Device probe: is the gumbel packed-vs-XLA mismatch a race or math?

device_parity.py (round 4) found the packed gumbel search diverging
from the XLA driver ON DEVICE ONLY (bit-exact on CPU, puct paths
bit-exact everywhere).  Two hypotheses:

  (a) deterministic fused-math divergence: the two programs associate
      the completed-Q / argmax arithmetic differently under XLA:TPU
      fusion, a last-ulp difference flips a tie, and the searches
      legitimately part ways — benign for training (both are valid
      gumbel searches);
  (b) a memory race in the triple-buffered backup pipeline that only
      the gumbel walk's access pattern exposes — NOT benign.

Discriminator: run the SAME packed program on the SAME inputs N times.
A race gives run-to-run variance; deterministic math divergence gives
bit-identical repeats.  Also repeats the XLA driver as a control.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    n_rep = int(argv[0]) if argv else 4
    from alphazero_gomoku_tpu.games import make_env
    from alphazero_gomoku_tpu.models import AZModel
    from alphazero_gomoku_tpu.search import MCTSConfig
    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
    from alphazero_gomoku_tpu.search.tree_pallas import run_mcts_packed
    from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
    sys.path.insert(0, "tools")
    from device_parity import random_states

    env = make_env("gomoku", 15)
    model = AZModel(board_size=15, n_res_blocks=2, channels=64, seed=11)
    eval_fn = make_eval_fn(model.cfg)
    bundle = bundle_of(model)
    cfg = MCTSConfig(n_simulations=96, add_noise=False, max_depth=56,
                     backend="pallas", search="gumbel")
    states = random_states(env, 64, 6, seed=6)
    moves = jnp.full((64,), 6, jnp.int32)
    key = jax.random.PRNGKey(7)

    # ROUND-5 FIX: run_mcts_packed hard-codes the PUCT walk (ignores
    # cfg.search), and run_mcts_with_q with backend="pallas" dispatches
    # to the packed GUMBEL walk — so the round-4 version of this probe
    # compared two different ALGORITHMS and its 0.22 "cross-backend"
    # delta was expected, not a divergence.  The correct pair: the same
    # dispatcher with backend flipped.
    import dataclasses
    cfg_xla = dataclasses.replace(cfg, backend="xla")
    packed = jax.jit(lambda s, k: run_mcts_with_q(
        env, cfg, eval_fn, bundle, s, moves, k))
    xla = jax.jit(lambda s, k: run_mcts_with_q(
        env, cfg_xla, eval_fn, bundle, s, moves, k))
    del run_mcts_packed

    outs = []
    for r in range(n_rep):
        t0 = time.time()
        pi, q = packed(states, key)
        outs.append((np.asarray(pi), np.asarray(q)))
        print(f"packed rep {r}: {time.time() - t0:.2f}s", flush=True)
    xouts = []
    for r in range(2):
        pi, q = xla(states, key)
        xouts.append((np.asarray(pi), np.asarray(q)))

    packed_stable = all(
        (outs[0][0] == o[0]).all() and (outs[0][1] == o[1]).all()
        for o in outs[1:])
    xla_stable = all(
        (xouts[0][0] == o[0]).all() and (xouts[0][1] == o[1]).all()
        for o in xouts[1:])
    cross = float(np.abs(outs[0][0] - xouts[0][0]).max())
    print(json.dumps({
        "packed_deterministic": bool(packed_stable),
        "xla_deterministic": bool(xla_stable),
        "cross_backend_pi_max_diff": cross,
        "verdict": ("math-divergence (benign)" if packed_stable and xla_stable
                    else "NONDETERMINISM — suspect a pipeline race"),
    }))
    return 0 if packed_stable else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
