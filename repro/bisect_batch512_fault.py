#!/usr/bin/env python
"""Bisect the batch-512 TPU worker fault (round-2 envelope edge).

Known envelope (ROADMAP #3, DECISIONS round-2):
  OK:    256 games x 400 sims, 48-move probe, f32 AND int8 (bench #3)
  CRASH: 512 x 400, 48-move probe, f32 AND int8 (hard worker fault)
  CRASH: 1024 x 400 f32 (round-2, pre-int8)

Round-2 bisect verdict (runs/bisect512.log, bisect512_contended.log):
the crash is f32-selfplay-512x400 SPECIFIC — int8 512x400 passes,
f32 512x192 passes, kernels-only 512x400 passes, f32 384x400 passes.

Round-3 verdict: two hypotheses TESTED and REFUTED.
  1. HBM pressure: XLA's own ``memory_analysis`` on the AOT-compiled
     program reports peak 2.81 GB (f32) / 2.80 GB (int8) at 512x400
     against 16 GB of HBM — allocation size is ruled out (and the twin
     peaks cannot explain the f32/int8 split).  The useful residue is
     ``selfplay/budget.py``: every big jitted program is now
     pre-flight-checked so a config that GENUINELY exceeds HBM raises
     a host-side error instead of faulting the worker.
  2. Unclamped node-index DMA: every row-group DMA in
     ``ops/tree_kernels.py`` now clamps its node index to
     [0, n_nodes-1] before the GROUP rounding (``_group_base``) — the
     fault still reproduces with all sites guarded, so it is not a
     wild DMA from corrupt tree data (or the corruption lands
     in-range).  The clamp stays as defense in depth.

Remaining axes to walk (see __main__ grid): backend=xla at 512x400 f32
(kernels vs glue+NN), bf16 inference (precision midpoint), node
capacity between 192 and 400.  This script walks the axes one at a
time in subprocesses (a worker crash kills only that probe):

  - batch between 256 and 512 (320/384/448): where exactly is the edge?
  - batch 512 with AZG_LANE_TILE=256 and =64: does the grid-step count
    (2/8 tiles instead of 4) move the fault?
  - batch 512 with node capacity halved via sims=192 (smaller packed
    tree, same lane count): HBM pressure vs lane count.
  - tree kernels only at 512 (random walks, no NN): isolates the
    Pallas kernels from the XLA glue + forward.

WARNING: this WILL crash the TPU worker (it restarts within ~1 min; the
chip stays flaky for a minute or two after — probes sleep between
configs).  Run only on an idle chip.

Usage: python repro/bisect_batch512_fault.py            # walk the grid
       python repro/bisect_batch512_fault.py selfplay 384 400 48 f32 128
       python repro/bisect_batch512_fault.py kernels 512 400 128
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SELFPLAY = r"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
import functools
sys.path.insert(0, "/root/repo")
from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.search import MCTSConfig
from alphazero_gomoku_tpu.selfplay import SelfPlayConfig
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn
from alphazero_gomoku_tpu.selfplay.runner import play_games

b, sims, moves, infer = (int(sys.argv[1]), int(sys.argv[2]),
                         int(sys.argv[3]), sys.argv[4])
backend = sys.argv[5] if len(sys.argv) > 5 else "pallas"
env = make_env("gomoku", 15)
model = AZModel(board_size=15, n_res_blocks=6, channels=128, seed=0)
cfg = SelfPlayConfig(
    batch_games=b, temp_threshold=10, max_moves=moves,
    mcts=MCTSConfig(n_simulations=sims, cpuct=1.0, add_noise=True,
                    dirichlet_alpha=0.05, dirichlet_epsilon=0.15,
                    dirichlet_moves=10, max_depth=56, backend=backend),
)
if infer == "int8":
    from alphazero_gomoku_tpu.ops.int8_net import (
        make_int8_eval_fn, quantize_int8, random_calib_obs)
    cin = env.encode(env.init()).shape[-1]
    params = quantize_int8(model.cfg, model.params, model.batch_stats,
                           random_calib_obs(model.cfg, cin=cin))
    eval_fn = make_int8_eval_fn(model.cfg)
else:
    eval_fn, params = make_eval_fn(model.cfg), bundle_of(model)
fn = jax.jit(functools.partial(play_games, env, cfg, eval_fn))
t0 = time.time()
traj = fn(params, jax.random.PRNGKey(5))
n = int(np.asarray(jnp.sum(traj.moves_played)))   # true sync
print(json.dumps({"probe": "selfplay", "batch": b, "sims": sims,
                  "max_moves": moves, "infer": infer, "backend": backend,
                  "lane_tile": int(__import__("os").environ.get(
                      "AZG_LANE_TILE", "128")),
                  "lane_moves": n, "seconds": round(time.time() - t0, 1),
                  "ok": True}), flush=True)
"""

KERNELS = r"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from alphazero_gomoku_tpu.ops.tree_kernels import (
    backup_paths, packed_layout, select_walk)

b, sims, nodes = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
a = 225
interp = jax.default_backend() == "cpu"   # CPU smoke-test mode
layout = packed_layout(a, nodes)
key = jax.random.PRNGKey(0)
# node-as-group layout (round 3): [B, n_nodes * 8, seg], sublanes
# N=0 W=1 P=2 C=3 meta=4 per node tile
packed = jnp.zeros((b, layout.n_nodes * 8, layout.seg), jnp.float32)
packed = packed.at[:, 3::8, :].set(-1.0)          # children -1
pri = jax.nn.softmax(jax.random.normal(key, (b, a)))
packed = packed.at[:, 2, :a].set(pri)             # root priors


@jax.jit
def sim_loop(packed, rng):
    def one(carry, slot):
        packed, rng = carry
        leaf, action, pn, pa, plen = select_walk(packed, layout, 1.0, 56,
                                                 interpret=interp)
        rng, k = jax.random.split(rng)
        vals = jax.random.uniform(k, (b,), minval=-1.0, maxval=1.0)
        pri = jax.nn.softmax(jax.random.normal(k, (b, a)))
        packed = backup_paths(
            packed, pn, pa, plen, vals, (action >= 0).astype(jnp.int32),
            slot, layout, signed_priors=pri,
            done=jnp.zeros((b,), jnp.float32), interpret=interp)
        return (packed, rng), None
    (packed, _), _ = jax.lax.scan(
        one, (packed, rng), jnp.arange(1, sims + 1, dtype=jnp.int32))
    return packed

t0 = time.time()
out = sim_loop(packed, key)
root_n = float(np.asarray(jnp.sum(out[:, 0, 0:a])))   # true sync
print(json.dumps({"probe": "kernels", "batch": b, "sims": sims,
                  "nodes": nodes, "root_visits": root_n,
                  "seconds": round(time.time() - t0, 1), "ok": True}),
      flush=True)
"""

GRID = [
    # (probe, argv, extra_env) — cheapest-information-first.
    # Batches must be multiples of the 128 lane tile (the tree kernels'
    # grid constraint); AZG_LANE_TILE=256 dies at the scoped-VMEM compile
    # limit and =64 violates the output BlockSpec lane tiling, so the
    # tile axis is NOT probeable this way (session-6 run).
    ("kernels", ["512", "400", "408"], {}),      # kernels alone at the
    ("selfplay", ["512", "192", "48", "f32"], {}),   # crash point's axes
    ("selfplay", ["384", "400", "48", "f32"], {}),
    ("selfplay", ["512", "400", "48", "f32"], {}),   # THE failing config
    ("selfplay", ["512", "400", "48", "int8"], {}),
]


def run_one(probe, argv, extra_env, timeout=2400):
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/jax_cache",
               **extra_env)
    src = SELFPLAY if probe == "selfplay" else KERNELS
    p = subprocess.run([sys.executable, "-c", src, *argv],
                       capture_output=True, text=True, timeout=timeout,
                       env=env)
    ok_lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode == 0 and ok_lines:
        print(ok_lines[-1], flush=True)
        return True
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(json.dumps({"probe": probe, "argv": argv, "env": extra_env,
                      "ok": False, "rc": p.returncode, "tail": tail}),
          flush=True)
    return False


if __name__ == "__main__":
    if len(sys.argv) > 1:
        probe = sys.argv[1]
        run_one(probe, sys.argv[2:], {})
    else:
        for probe, argv, extra_env in GRID:
            ok = run_one(probe, argv, extra_env)
            if not ok:
                time.sleep(90)   # the chip is flaky right after a crash
