"""Multi-chip parallelism over a JAX device mesh.

The reference scales by process pools + checkpoint-file parameter broadcast
(``/root/reference/train.py:710-742``; SURVEY.md §2 P1/P2).  The TPU-native
replacement is a single-controller program over a 1-D ``('data',)`` mesh:

  - **self-play / arena**: the game batch shards across chips with
    ``shard_map`` — each chip runs the identical jitted lockstep program on
    its slice of games with replicated parameters; there is no cross-chip
    communication during search (games are independent), so scaling is
    embarrassingly linear over ICI-connected chips.
  - **training**: the gradient batch shards across chips under ``jit`` with
    sharding annotations; XLA inserts the gradient ``psum`` over ICI
    automatically (GSPMD), and batch-norm statistics remain *global* batch
    statistics because reductions over sharded axes are global reductions.

Why only data parallelism: the model is a small CNN over a fixed 15x15 board
— there is no sequence axis and the weights fit trivially in one chip's HBM,
so tensor/pipeline/sequence/expert parallelism would add communication for
zero benefit (SURVEY.md §2 parallelism checklist: all ABSENT in the
reference workload).  The scaling axes that matter are batch-of-games and
batch-of-leaves, both mapped to the ``data`` axis here.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alphazero_gomoku_tpu.models.model import train_step_fn
from alphazero_gomoku_tpu.selfplay.arena import arena_half
from alphazero_gomoku_tpu.selfplay.runner import (
    ContinuousRecords,
    SelfPlayConfig,
    Trajectories,
    play_games,
    play_games_continuous,
)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_sharded_selfplay(env, cfg: SelfPlayConfig, eval_fn, mesh: Mesh,
                          axis: str = "data"):
    """Data-parallel self-play: each chip plays ``batch_games/n`` games.

    Returns ``fn(net_params, rng) -> Trajectories`` with batch axes sharded
    over the mesh.  ``net_params`` is replicated; per-chip PRNG streams are
    derived inside each shard with ``jax.random.fold_in``.
    """
    n = mesh.devices.size
    if cfg.batch_games % n:
        raise ValueError(
            f"batch_games={cfg.batch_games} not divisible by mesh size {n}"
        )
    local_cfg = dataclasses.replace(cfg, batch_games=cfg.batch_games // n)

    def shard_fn(net_params, rng):
        shard_idx = jax.lax.axis_index(axis)
        local_rng = jax.random.fold_in(rng, shard_idx)
        return play_games(env, local_cfg, eval_fn, net_params, local_rng)

    traj_specs = Trajectories(
        boards=P(None, axis),        # [T, B, H, W]
        players=P(None, axis),
        pis=P(None, axis),
        root_qs=P(None, axis),
        active=P(None, axis),
        winners=P(axis),             # [B]
        moves_played=P(axis),
        captures=P(None, axis),      # [T, B, 2]
    )
    # check_vma off: the per-shard MCTS while_loops mix replicated constants
    # into shard-varying carries, which the VMA checker rejects; there is no
    # cross-shard communication here, so the check buys nothing.
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=traj_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_selfplay_continuous(env, cfg: SelfPlayConfig, eval_fn,
                                     mesh: Mesh, total_steps: int,
                                     axis: str = "data"):
    """Data-parallel continuous (auto-reset) self-play.

    Same fan-out as :func:`make_sharded_selfplay` for the auto-reset
    stream (``runner.play_games_continuous``): each chip advances
    ``batch_games/n`` independent lanes for ``total_steps`` plies; lanes
    never communicate, so the ply axis stays replicated and the lane axis
    shards.  Returns ``fn(net_params, rng) -> ContinuousRecords`` with
    every ``[T, B, ...]`` record sharded on the lane axis.
    """
    n = mesh.devices.size
    if cfg.batch_games % n:
        raise ValueError(
            f"batch_games={cfg.batch_games} not divisible by mesh size {n}"
        )
    local_cfg = dataclasses.replace(cfg, batch_games=cfg.batch_games // n)

    def shard_fn(net_params, rng):
        shard_idx = jax.lax.axis_index(axis)
        local_rng = jax.random.fold_in(rng, shard_idx)
        return play_games_continuous(env, local_cfg, eval_fn, net_params,
                                     local_rng, total_steps)

    rec_specs = ContinuousRecords(
        boards=P(None, axis),        # [T, B, H, W]
        players=P(None, axis),
        pis=P(None, axis),
        root_qs=P(None, axis),
        recorded=P(None, axis),
        ended=P(None, axis),
        winners=P(None, axis),
        captures=P(None, axis),      # [T, B, 2]
    )
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=rec_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_arena(env, cfg, eval_fn, mesh: Mesh, axis: str = "data"):
    """Data-parallel arena: games split across chips, both parameter sets
    replicated (the TPU replacement for reference P2,
    ``/root/reference/train.py:492-569``).

    Returns ``fn(params_p1, params_p2, n_games, rng) -> winners`` where
    ``n_games`` is rounded UP to a multiple of the mesh size (callers read
    the actually-played count from the result length).
    """
    n = mesh.devices.size

    @functools.lru_cache(maxsize=None)
    def build(local_games: int):
        def shard_fn(p1, p2, rng):
            shard_idx = jax.lax.axis_index(axis)
            local_rng = jax.random.fold_in(rng, shard_idx)
            return arena_half(env, cfg, eval_fn, p1, p2, local_games,
                              local_rng)

        return jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(axis),
            check_vma=False,
        ))

    def fn(params_p1, params_p2, n_games: int, rng):
        local_games = -(-n_games // n)  # ceil: every chip plays equally
        return build(local_games)(params_p1, params_p2, rng)

    return fn


def gather_trajectories(traj, mesh: Mesh):
    """Reshard a mesh-sharded :class:`Trajectories` pytree to fully
    replicated, making every leaf process-addressable on every host.

    This is the multi-host collection path (the TPU-native replacement for
    the reference's worker->master pickle returns,
    ``/root/reference/train.py:737-742``): after sharded self-play each
    host holds only its local game shard; a jitted identity with
    replicated output shardings lowers to an all-gather over ICI/DCN, and
    ``np.asarray`` on the result works on every process so the host-side
    replay-buffer collection (``collect_examples``) is unchanged.  On a
    single-host mesh the same program is a cheap local reshard — the
    trainer always routes through it so the multi-host path is exercised
    by every mesh run (incl. ``dryrun_multichip``).
    """
    return _gather_fn(mesh)(traj)


@functools.lru_cache(maxsize=None)
def _gather_fn(mesh: Mesh):
    # cache the jitted identity per mesh: a fresh lambda per call would
    # defeat the jit cache and recompile the all-gather every iteration
    return jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))


def make_sharded_gather_epoch(net_cfg, tx, mesh: Mesh, axis: str = "data",
                              value_loss_weight: float = 1.0):
    """Gradient-data-parallel epoch over DEVICE-RESIDENT ring arrays.

    The mesh analogue of ``loop.train_epoch_gather_fn`` (the
    DeviceBufferMirror path): the replay ring stays replicated in HBM
    (~430 MB at the production capacity — it fits every chip easily) and
    only the [n_batches, batch] i32 index array crosses the link each
    epoch, sharded over the mesh on the batch axis so each chip gathers
    and trains on its batch slice; XLA inserts the gradient all-reduce.
    Replaces shipping steps*batch pre-sampled samples (~1 GB/iteration)
    through the host link, which made the sharded train phase link-bound.

    Returns ``fn(params, batch_stats, opt_state, states, pis, zs, idx,
    inv_scales)`` (``inv_scales`` = the ring's per-channel uint8 decode
    multipliers, ``DeviceBufferMirror.inv_scales``);
    the ring arrays must already carry the mesh's replicated sharding
    (DeviceBufferMirror(sharding=...)), otherwise every call re-broadcasts
    them.
    """
    repl = NamedSharding(mesh, P())
    idx_shard = NamedSharding(mesh, P(None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, repl, repl, repl, idx_shard, repl),
        out_shardings=repl,
    )
    def epoch_fn(params, batch_stats, opt_state, dev_states, dev_pis,
                 dev_zs, idx, inv_scales):
        def step(carry, ib):
            params, stats, opt = carry
            x = dev_states[ib]
            if x.dtype == jnp.uint8:  # ring stores encoded planes
                x = x.astype(jnp.float32) * inv_scales
            pi = dev_pis[ib]
            z = dev_zs[ib].reshape(-1, 1)
            params, stats, opt, metrics = train_step_fn(
                net_cfg, tx, params, stats, opt, x, pi, z, value_loss_weight
            )
            return (params, stats, opt), metrics

        (params, batch_stats, opt_state), metrics = jax.lax.scan(
            step, (params, batch_stats, opt_state), idx
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return params, batch_stats, opt_state, last

    return epoch_fn


def make_sharded_train_epoch(net_cfg, tx, mesh: Mesh, axis: str = "data",
                             value_loss_weight: float = 1.0):
    """Gradient-data-parallel epoch: batches shard over chips, psum by XLA.

    Returns ``fn(params, batch_stats, opt_state, xs, pis, zs)`` where the
    minibatch arrays are ``[n_batches, batch, ...]`` with the per-step batch
    axis (axis 1) sharded across the mesh.  Parameters/optimizer state are
    replicated; XLA's partitioner turns the global-mean loss gradient into an
    ICI all-reduce.
    """
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, batch_shard, batch_shard, batch_shard),
        out_shardings=repl,
    )
    def epoch_fn(params, batch_stats, opt_state, xs, pis, zs):
        def step(carry, batch):
            params, stats, opt = carry
            x, pi, z = batch
            params, stats, opt, metrics = train_step_fn(
                net_cfg, tx, params, stats, opt, x, pi, z, value_loss_weight
            )
            return (params, stats, opt), metrics

        (params, batch_stats, opt_state), metrics = jax.lax.scan(
            step, (params, batch_stats, opt_state), (xs, pis, zs)
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return params, batch_stats, opt_state, last

    return epoch_fn


# ----------------------------------------------------------------------
# per-host sharded replay (ROADMAP #7, round 4)
# ----------------------------------------------------------------------
def local_trajectory_shards(traj):
    """Extract THIS process's game shard of a sharded trajectory pytree.

    The per-host replay path (``train_alphazero(replay_sharding=
    "per_host")``): instead of all-gathering every host's games so each
    host can hold a full-replica buffer (:func:`gather_trajectories` —
    the reference-equivalent semantics, ``/root/reference/train.py:
    737-742``), each process keeps only the games its own devices
    played.  Game lanes shard on axis 0 of every trajectory leaf, so a
    whole game lives on one device and the local shard is
    self-contained; the result is a host-numpy pytree with the same
    structure and ``games_per_iteration / process_count`` lanes.  No
    cross-host communication happens at all — this trades the DCN
    all-gather and the full-replica host RAM for per-host-uniform
    (instead of globally-uniform) replay sampling, the standard
    distributed-replay tradeoff.
    """
    def extract(x):
        if not hasattr(x, "addressable_shards") or x.ndim == 0:
            return np.asarray(x)
        # the game-lane axis is wherever the spec carries the mesh axis:
        # per-game leaves are [B, ...] = P('data', ...), per-move leaves
        # are [T, B, ...] = P(None, 'data', ...)
        spec = getattr(x.sharding, "spec", None)
        axis = None
        if spec is not None:
            for d, p in enumerate(spec):
                if p is not None:
                    axis = d
                    break
        if axis is None:  # replicated (or single-device) leaf
            return np.asarray(x)
        uniq = {}
        for s in x.addressable_shards:
            start = s.index[axis].start or 0
            uniq.setdefault(int(start), s.data)
        return np.concatenate(
            [np.asarray(uniq[k]) for k in sorted(uniq)], axis=axis)

    return jax.tree_util.tree_map(extract, traj)


def form_global_batches(mesh: Mesh, xs, pis, zs, axis: str = "data"):
    """Assemble per-process minibatch samples into global sharded arrays.

    Each process passes ITS locally sampled ``[n_batches,
    batch/process_count, ...]`` arrays; the result is a global
    ``[n_batches, batch, ...]`` jax.Array sharded on the per-step batch
    axis, ready for :func:`make_sharded_train_epoch` — the per-host
    replay path's train-input pipeline.  On a single-host mesh this is
    just a local device_put with the batch sharding.
    """
    sh = NamedSharding(mesh, P(None, axis))
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in (xs, pis, zs))


def global_buffer_len(local_len: int) -> int:
    """Sum of every process's local replay-buffer length.

    Keeps collective-issuing control flow (train-phase gating, steps per
    epoch) consistent across hosts in the per-host replay mode — hosts
    whose games ran longer hold more samples, and diverging on
    ``len(buffer)`` would deadlock the sharded epoch.
    """
    if jax.process_count() == 1:
        return local_len
    from jax.experimental import multihost_utils

    return int(np.sum(multihost_utils.process_allgather(
        np.int64(local_len))))


def min_local_buffer_len(local_len: int) -> int:
    """Minimum of every process's local replay-buffer length.

    Per-host training must also gate on the SHORTEST shard: a host whose
    games contributed no samples yet cannot draw its share of the global
    batch (``ReplayBuffer.sample`` on an empty shard is an error), and —
    as with :func:`global_buffer_len` — the decision must be identical
    on every host or the sharded epoch deadlocks.
    """
    if jax.process_count() == 1:
        return local_len
    from jax.experimental import multihost_utils

    return int(np.min(multihost_utils.process_allgather(
        np.int64(local_len))))
