"""True multi-process (2-host-style) training-loop integration test.

Spawns two fresh Python processes, each owning 4 virtual CPU devices,
joined into one 8-device JAX runtime via ``jax.distributed`` over a
localhost coordinator — the CPU stand-in for a two-host pod slice.  The
full training loop (sharded self-play -> trajectory all-gather ->
replay collection -> sharded gather epoch -> sharded arena -> gate ->
artifacts) runs in BOTH processes; the test checks that

  - both processes complete and report identical losses/win rates
    (every process holds replicated state, so host-side results must
    agree bit-for-bit),
  - only the primary (process 0) writes snapshot/buffer artifacts.

Replaces what the reference cannot test at all (its process pool is
driven by a master that IS the test harness, ``train.py:710-742``).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
replay = sys.argv[4] if len(sys.argv) > 4 else "replicated"
import jax
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8
from alphazero_gomoku_tpu.selfplay import train_alphazero
hist = train_alphazero(
    game_name="gomoku", board_size=7, num_iterations=1,
    games_per_iteration=8, n_simulations=8, buffer_size=512,
    batch_size=16, epochs_per_iter=1, temp_threshold=4,
    eval_games=8, eval_mcts_simulations=8,
    n_res_blocks=1, channels=8, model_dir=f"{outdir}/proc{pid}",
    seed=3, verbose=False, mesh="auto", replay_sharding=replay,
)
it = hist[0]
with open(f"{outdir}/result_{pid}.json", "w") as f:
    json.dump({"loss": it["loss"], "win_rate": it["win_rate"],
               "moves": it["moves"], "buffer": it["buffer_size"]}, f)
print("WORKER_OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, replay="replicated"):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",  # disable the axon TPU plugin hook
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": f"{REPO}{os.pathsep}"
                      + os.environ.get("PYTHONPATH", ""),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port),
             str(tmp_path), replay],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out
    return (json.loads((tmp_path / "result_0.json").read_text()),
            json.loads((tmp_path / "result_1.json").read_text()))


@pytest.mark.slow
def test_two_process_training_loop(tmp_path):
    r0, r1 = _run_two_process(tmp_path)
    assert r0 == r1, f"process results diverged: {r0} vs {r1}"
    assert r0["moves"] > 0 and r0["buffer"] > 0

    # only the primary writes artifacts (separate model dirs per process
    # stand in for "who would have written to the shared filesystem")
    assert (tmp_path / "proc0" / "best_latest.ckpt").exists()
    assert (tmp_path / "proc0" / "replay_buffer_latest.npz").exists()
    assert not (tmp_path / "proc1" / "best_latest.ckpt").exists()
    assert not (tmp_path / "proc1" / "replay_buffer_latest.npz").exists()


@pytest.mark.slow
def test_two_process_per_host_replay(tmp_path):
    """replay_sharding='per_host': no trajectory all-gather — each host
    collects only its own devices' games (so the per-host buffers are
    strictly smaller than the global sample count and buffer_size is
    split), while the REPLICATED training state stays bit-identical
    across processes (losses and win rates must agree exactly; each
    host's gradient contribution rides the psum)."""
    r0, r1 = _run_two_process(tmp_path, replay="per_host")
    assert r0["loss"] == r1["loss"], (r0, r1)
    assert r0["win_rate"] == r1["win_rate"], (r0, r1)
    # self-play move counts are per-host shards; both hosts played
    assert r0["moves"] > 0 and r1["moves"] > 0
    # each buffer holds only a local share (4 of 8 games' samples) and
    # is capped at buffer_size / process_count = 256
    assert 0 < r0["buffer"] <= 256 and 0 < r1["buffer"] <= 256
