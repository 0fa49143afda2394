"""Multi-host (pod-slice) bring-up on top of the single-controller mesh.

A v5e-8 fits in one host, so the default path never touches this module;
for pod slices (multi-host ICI) or multi-slice (DCN) runs, JAX requires
every host process to call ``jax.distributed.initialize`` before any
backend touch, after which ``jax.devices()`` is the GLOBAL device list and
the existing ``make_mesh()`` / shard_map programs span hosts unchanged
(the runtime routes collectives over ICI within a slice and DCN across
slices).

The reference has no analogue — its scaling story is a process pool on one
box (``/root/reference/train.py:710-742``); this is the TPU-native
replacement's growth path.  Design note: everything in
``parallel/mesh.py`` is data-parallel with replicated parameters, so
multi-host adds no new communication patterns — the gradient ``psum``
simply spans more chips.

Host-side phases are multi-host-clean too: after sharded self-play the
trainer all-gathers the trajectory shards (``mesh.gather_trajectories``
— a jitted identity resharded to replicated, i.e. one ICI/DCN
all-gather) so every process runs the identical replay-buffer collection,
and artifact writes (snapshots, buffer persistence) are gated on
``jax.process_index() == 0``.  Every process holds identical model/buffer
state, so the primary's artifacts fully describe the run
(tests/test_multiprocess.py runs the loop under a real 2-process CPU
``jax.distributed`` runtime and checks cross-process parity).

Usage (one process per host, e.g. under ``gcloud compute tpus tpu-vm ssh
--worker=all``)::

    from alphazero_gomoku_tpu.parallel import initialize_distributed
    initialize_distributed()          # TPU pod: auto-discovers peers
    train_alphazero(..., mesh="auto")  # mesh now spans all hosts

or explicitly::

    initialize_distributed(coordinator_address="10.0.0.2:8476",
                           num_processes=4, process_id=int(sys.argv[1]))
"""

from __future__ import annotations

from typing import Optional

import jax

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
    auto: bool = False,
) -> bool:
    """Initialize JAX's multi-process runtime (idempotent).

    ``auto=True`` calls ``jax.distributed.initialize()`` with no arguments
    — on TPU pod hardware peers are auto-discovered from the TPU metadata
    (this HANGS off-pod waiting for a coordinator, so it is never implied).
    Returns True when a multi-process runtime was (or already is) active,
    False when running single-process (a no-op; the single-host path
    proceeds unchanged).
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return True
    if not auto and coordinator_address is None and num_processes in (None, 1):
        return False
    if auto and coordinator_address is None:
        # keep explicitly passed process args even in auto mode — silently
        # dropping them can misconfigure non-pod multi-host setups
        kw = {}
        if num_processes is not None:
            kw["num_processes"] = num_processes
        if process_id is not None:
            kw["process_id"] = process_id
        if local_device_ids is not None:
            kw["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kw)
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint writes."""
    return jax.process_index() == 0
