"""The full AlphaZero training loop: self-play -> train -> arena -> gate.

Mirrors the reference's ``train_alphazero`` orchestration and parameter
surface (``/root/reference/train.py:575-842``) re-designed single-controller:
the candidate's parameters stay resident in HBM and are used directly by the
batched self-play and arena kernels — there is no checkpoint-file parameter
broadcast and no worker pool (reference P1/P2).  Parallelism is the game
batch (and, multi-chip, the device mesh; see
:mod:`alphazero_gomoku_tpu.parallel`).

Phase parity per iteration (reference ``train.py:650-840``):
  1. self-play with the candidate + Dirichlet noise -> replay buffer
  2. if buffer >= batch_size: ``epochs_per_iter`` epochs of
     ``len(buffer)//batch_size`` optimizer steps on uniform samples
  3. arena candidate-vs-best (noise off, argmax, random centre opening,
     alternating seats); failures score 0 so training continues
  4. gate: accept (best <- candidate incl. optimizer state) at
     ``win_rate >= threshold`` else reset candidate <- best
  5. snapshot best every ``save_every`` iters; persist the buffer
"""

from __future__ import annotations

import functools
import os
import time
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.models.model import AZModel, train_step_fn
from alphazero_gomoku_tpu.models.resnet import apply
from alphazero_gomoku_tpu.search.tree import MCTSConfig
from alphazero_gomoku_tpu.selfplay.arena import evaluate_params_detailed
from alphazero_gomoku_tpu.selfplay.buffer import (
    DeviceBufferMirror,
    ReplayBuffer,
    load_replay_buffer,
    save_replay_buffer,
)
from alphazero_gomoku_tpu.selfplay.runner import (
    SelfPlayConfig,
    collect_examples,
    collect_examples_continuous,
    play_games,
    play_games_continuous,
)
from alphazero_gomoku_tpu.utils.profiling import (
    PhaseTimer,
    start_profiler_trace,
    stop_profiler_trace,
    trace_annotation,
)


def make_eval_fn(net_cfg):
    """Network forward for MCTS: bundle {'params','batch_stats'} -> (probs, v)."""

    def eval_fn(bundle, obs):
        (logits, value), _ = apply(
            net_cfg, bundle["params"], bundle["batch_stats"], obs, train=False
        )
        return jax.nn.softmax(logits, axis=-1), value

    return eval_fn


def bundle_of(model: AZModel):
    return {"params": model.params, "batch_stats": model.batch_stats}


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def train_epoch_fn(net_cfg, tx, params, batch_stats, opt_state, xs, pis, zs,
                   value_loss_weight: float = 1.0):
    """Scan optimizer steps over pre-sampled batches ([n_batches, b, ...])."""

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


@functools.partial(jax.jit, static_argnums=(0, 1, 10))
def train_epoch_gather_fn(net_cfg, tx, params, batch_stats, opt_state,
                          dev_states, dev_pis, dev_zs, idx, inv_scales,
                          value_loss_weight: float = 1.0):
    """Epoch over device-resident ring arrays, gathering per-step batches.

    ``idx`` is the [n_batches, batch] i32 sample-index array (same numpy
    without-replacement draws as the host path — the only thing shipped
    to the device besides new samples).  ``inv_scales`` ([C] f32) are the
    ring's per-channel decode multipliers (buffer.py: uint8 storage).
    Bit-identical to :func:`train_epoch_fn` on host-gathered batches
    (one correctly-rounded multiply on both paths)."""

    def step(carry, ib):
        params, stats, opt = carry
        x = dev_states[ib]
        if x.dtype == jnp.uint8:   # ring stores encoded planes (buffer.py)
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


def gate_decision(gate_stat: str, win_rate, ci95, threshold: float,
                  run_arena: bool = True):
    """(accepted, reset_worthy) for one arena result — the promotion gate.

    ``gate_stat`` semantics (see the ``train_alphazero`` parameter doc):
      - "ci_low": promote only when the Wilson 95% LOWER bound clears the
        threshold; reset-worthy only when the UPPER bound falls below it
        (statistically supported inferiority).  Inconclusive arenas do
        neither.
      - "win_rate": reference parity (/root/reference/train.py:813-827) —
        point estimate vs threshold, reset on any miss.
    With ``run_arena`` False (an ``eval_every``-skipped iteration) both
    outputs are False: best unchanged, candidate un-reset.
    """
    if not run_arena:
        return False, False
    if gate_stat == "ci_low":
        lo, hi = ci95
        return lo >= threshold, hi < threshold
    if gate_stat == "win_rate":
        return win_rate >= threshold, win_rate < threshold
    raise ValueError(f"unknown gate_stat: {gate_stat!r}")


def train_alphazero(
    game_name: str = "gomoku",
    board_size: int = 15,
    num_iterations: int = 5,
    games_per_iteration: int = 8,
    n_simulations: int = 50,
    buffer_size: int = 10000,
    batch_size: int = 128,
    epochs_per_iter: int = 2,
    temp_threshold: int = 8,
    eval_games: int = 12,
    eval_mcts_simulations: int = 200,
    # run the candidate-vs-best arena only every N iterations (1 =
    # reference parity: every iteration).  At gumbel self-play speeds the
    # 64-game arena is ~1/3 of iteration wall time (run-14: selfplay 8 s,
    # train 3 s, arena 10.5 s), and in "track" gate mode the arena only
    # decides when `best` advances — spacing it out trades gate latency
    # for throughput.  Skipped iterations keep training (even in "reset"
    # mode: no arena, no reset) and record win_rate=None in the history.
    eval_every: int = 1,
    win_rate_threshold: float = 0.55,
    # gate statistic (round-3: the fixed-n point-estimate gate was
    # statistically meaningless at arena sizes — 9/16 "passes" a 0.55
    # threshold with a CI of [0.33, 0.78]):
    #   "ci_low" (default): promote only when the Wilson 95% LOWER bound
    #     of the mirrored-pair arena clears the threshold — a promotion
    #     is a statistically supported claim, not a coin flip.  In
    #     gate_mode="reset" the candidate is only reset when the UPPER
    #     bound falls below the threshold (statistically worse);
    #     inconclusive arenas keep the candidate training un-reset, so
    #     reset mode no longer discards progress on arena noise.
    #   "win_rate": reference parity (train.py:813-827) — point estimate
    #     vs threshold, reset on any miss.
    # With "ci_low" size the arena for the decision: 32+ games (CI-low
    # > 0.5 needs ~0.66 observed at 32, ~0.625 at 64).
    gate_stat: str = "ci_low",
    cpuct: float = 1.2,
    model_dir: str = "models",
    save_every: int = 1,
    # buffer persistence cadence. 1 = reference parity (train.py:836-837
    # pickles every iteration). At production sizes savez_compressed of a
    # 120k-sample ring costs ~11 s/iteration — the LARGEST phase of the
    # run-5 strength run (selfplay 9.2 s, train 2.4 s) — so long runs
    # should raise this; a crash loses at most the last N iterations of
    # samples, never the model.
    buffer_save_every: int = 1,
    pretrained_model_path: Optional[str] = None,
    candidate_model_path: Optional[str] = None,
    next_iteration_continuation: int = 1,
    # --- MCTS Dirichlet noise ---
    dirichlet_alpha: float = 0.03,
    dirichlet_epsilon: float = 0.25,
    dirichlet_n_moves: int = 30,
    mcts_max_depth: int = 64,          # select-walk cap (0 = unbounded)
    mcts_backend: str = "xla",         # "xla" | "pallas" (tree kernels)
    mcts_leaves_per_sim: int = 1,      # k leaves per NN call (virtual loss)
    mcts_fpu_mode: str = "zero",       # "zero" (reference) | "parent"
    mcts_reuse_budget: int = 0,        # self-play subtree reuse (pallas)
    mcts_search: str = "puct",         # "puct" (reference) | "gumbel"
                                       # (sequential halving, gumbel.py)
    gumbel_max_considered: int = 16,
    gumbel_round_parallel: bool = False,  # batch each halving round's
                                          # sims into one forward (see
                                          # MCTSConfig.gumbel_round_parallel)
    # hold-out anchor arena: every N iterations (0 = off) the candidate
    # also plays a FIXED anchor net — by default a frozen copy of the
    # starting weights, or the checkpoint at anchor_model_path. Unlike
    # the candidate-vs-best gate (which is relative and drifts with
    # best), the anchor win-rate trend is an ABSOLUTE strength signal:
    # run 5 regressed for 250 gateless iterations with the relative
    # arena pinned at 0.5 the whole time (DECISIONS.md round-2 notes).
    anchor_arena_every: int = 0,
    anchor_model_path: Optional[str] = None,
    # anchor arena SEARCH config (round-3, run-15 post-mortem): with the
    # anchor played at the training search config, run-15's gumbel@64
    # anchor track read 0.45-0.62 all run while the promotion metric
    # (f32 puct@400 mirrored arena) read a 0.33-0.41 REGRESSION from
    # iter 10 — the two search modes rank nets differently, so the gate
    # signal must be taken at the config promotions are decided under.
    # 0 / None = inherit eval_mcts_simulations / mcts_search.
    anchor_mcts_simulations: int = 0,
    anchor_search: Optional[str] = None,
    # gate semantics when the candidate fails the arena threshold:
    #   "reset" (reference parity, train.py:826-834): candidate <- best,
    #     discarding the iteration's optimizer progress;
    #   "track": candidate keeps training regardless — the gate only
    #     decides whether best (the net that gets snapshotted and defends
    #     the arena) advances.  This keeps the training continuity that
    #     made gateless runs learn fast while pinning `best` at the run's
    #     peak: run 5/6 drifted past their peak with no gate, while the
    #     reference-style reset gate stalls learning when the arena is
    #     noisy (DECISIONS.md round-2 notes).
    gate_mode: str = "reset",
    # --- network (reference trainer defaults: 3 blocks / 64 ch) ---
    n_res_blocks: int = 3,
    channels: int = 64,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    seed: int = 0,
    # --- accepted for reference API compatibility; inert on TPU ------
    # (process pools are replaced by the lockstep game batch + device mesh)
    selfplay_num_workers: int = 0,
    selfplay_device: str = "tpu",
    selfplay_games_per_task: int = 1,
    selfplay_base_seed: int = 12345,
    selfplay_torch_threads: int = 1,
    eval_num_workers: int = 0,
    eval_device: str = "tpu",
    eval_games_per_task: int = 1,
    eval_base_seed: int = 54321,
    eval_torch_threads: int = 1,
    # --- value-collapse mitigation (round-1 post-mortem, DECISIONS.md) ---
    value_loss_weight: float = 1.0,    # scales the MSE term in the loss
    value_target_mix: float = 0.0,     # z <- (1-mix)*z + mix*root_search_q
    opening_random_moves: int = 0,     # random centre plies (not recorded)
    # playout cap randomization (KataGo arXiv:1902.10565; see
    # SelfPlayConfig): cheap searches on most plies — value samples at a
    # fraction of the simulation cost; policy trains on full plies only
    pcr_cheap_sims: int = 0,
    pcr_full_prob: float = 0.25,
    selfplay_max_moves: int = 0,       # self-play move cap, 0 = board^2:
                                       # a LOWER cap is the draw-curriculum
                                       # lever — capped games score z=0,
                                       # feeding the value head non-
                                       # decisive lines (the blitz-
                                       # equilibrium antidote candidate
                                       # after run 8's opening diversity)
    # --- extras ---
    use_symmetries: bool = True,
    verbose: bool = True,
    profile_trace_dir: Optional[str] = None,  # capture a device trace of
                                              # the 2nd iteration (XProf)
    # device mesh: "auto" shards self-play, arena, and the gradient batch
    # over ALL local devices when more than one is present (the default
    # multi-chip path, replacing reference P1/P2 worker pools); pass an
    # explicit jax.sharding.Mesh to control it, or None to force
    # single-device execution
    mesh="auto",
    # replay placement across HOSTS (multi-process runs only):
    # "replicated" (default) all-gathers every host's games so each host
    # holds a full-replica buffer — reference-equivalent globally-uniform
    # sampling; "per_host" keeps each process's own games only (no
    # trajectory all-gather, buffer_size is split across hosts) and forms
    # each global training batch from per-host samples — the standard
    # distributed-replay scale-out once buffers outgrow one host's RAM
    replay_sharding: str = "replicated",
    use_fused_inference: bool = False,
    # search-time network forward: "f32" = the exact eval-mode apply();
    # "bf16" = folded-BN bfloat16 XLA forward (ops/fused_net.py:
    # folded_xla_apply — half the HBM traffic on the bandwidth-bound net);
    # "fused" = the whole-tower Pallas kernel.  Training steps always use
    # the exact f32 apply().
    inference: str = "f32",
    selfplay_mode: str = "lockstep",   # or "continuous" (auto-reset lanes)
    selfplay_steps: int = 0,           # continuous mode plies (0 = board^2)
    pente_capture_planes: bool = False,  # +2 captured-pair obs planes
                                         # (Pente only; net in_channels=5)
):
    """Run the training loop; returns a per-iteration history list."""
    del selfplay_num_workers, selfplay_device, selfplay_games_per_task
    del selfplay_base_seed, selfplay_torch_threads, eval_num_workers
    del eval_device, eval_games_per_task, eval_base_seed, eval_torch_threads

    def log(*args):
        if verbose:
            print(*args, flush=True)

    if gate_mode not in ("reset", "track"):
        raise ValueError(f"unknown gate_mode: {gate_mode!r}")
    if gate_stat not in ("win_rate", "ci_low"):
        raise ValueError(f"unknown gate_stat: {gate_stat!r}")
    if pente_capture_planes and game_name != "pente":
        # make_env ignores the flag for other games but collect_examples
        # would still build 5-channel states, surfacing later as an opaque
        # shape error at the first train step — fail clearly instead
        raise ValueError(
            f"pente_capture_planes=True requires game_name='pente' "
            f"(got {game_name!r})")
    os.makedirs(model_dir, exist_ok=True)
    env = make_env(game_name, board_size,
                   capture_planes=pente_capture_planes)
    action_size = env.num_actions

    if isinstance(mesh, str) and mesh == "auto":
        from alphazero_gomoku_tpu.parallel import make_mesh
        mesh = make_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None:
        n_chips = int(mesh.devices.size)
        if games_per_iteration % n_chips:  # both self-play modes shard
                                           # the game/lane batch
            rounded = -(-games_per_iteration // n_chips) * n_chips
            log(f"[mesh] rounding games_per_iteration "
                f"{games_per_iteration} -> {rounded} "
                f"(multiple of {n_chips} chips)")
            games_per_iteration = rounded
        log(f"[mesh] data-parallel over {n_chips} devices: "
            f"gradient batch sharded, arena games split")

    def new_model():
        return AZModel(
            board_size=board_size, action_size=action_size,
            n_res_blocks=n_res_blocks, channels=channels,
            lr=lr, weight_decay=weight_decay, seed=seed,
            in_channels=env.obs_channels,
        )

    if pretrained_model_path and os.path.exists(pretrained_model_path):
        log(f"loading pretrained model: {pretrained_model_path}")
        model_best = new_model()
        model_best.load(pretrained_model_path)
    else:
        log("no pretrained model found; initializing fresh weights")
        model_best = new_model()
    model_candidate = new_model()
    if candidate_model_path and os.path.exists(candidate_model_path):
        # track-mode resume: the candidate trains on past `best`, so a
        # restart must restore it from its own snapshot, not from best
        # (which would silently discard all gateless progress since the
        # last promotion)
        log(f"loading candidate model: {candidate_model_path}")
        model_candidate.load(candidate_model_path)
    else:
        model_candidate.copy_weights_from(model_best)

    model_anchor = None
    if anchor_arena_every > 0:
        model_anchor = new_model()
        if anchor_model_path:
            if not os.path.exists(anchor_model_path):
                # an explicitly requested anchor must never be silently
                # replaced — the whole point is an absolute baseline
                raise FileNotFoundError(
                    f"anchor_model_path {anchor_model_path!r} does not "
                    "exist")
            log(f"[anchor] loading fixed anchor: {anchor_model_path}")
            model_anchor.load(anchor_model_path)
        else:
            log("[anchor] anchoring to the starting weights")
            model_anchor.copy_weights_from(model_best)

    if replay_sharding not in ("replicated", "per_host"):
        raise ValueError(
            f"unknown replay_sharding: {replay_sharding!r} "
            "(expected 'replicated' or 'per_host')")
    per_host_replay = replay_sharding == "per_host"
    n_procs = jax.process_count()
    if per_host_replay:
        if mesh is None:
            raise ValueError("replay_sharding='per_host' requires a device "
                             "mesh (it is a multi-host scale-out mode)")
        if batch_size % n_procs or batch_size % mesh.devices.size:
            raise ValueError(
                f"replay_sharding='per_host' needs batch_size "
                f"({batch_size}) divisible by both process_count "
                f"({n_procs}) and mesh devices ({mesh.devices.size})")
        # buffer_size keeps its GLOBAL meaning: each host owns a slice
        buffer_size = max(batch_size // n_procs, buffer_size // n_procs)
        log(f"[replay] per-host sharded: {n_procs} process(es) x "
            f"{buffer_size} samples, no trajectory all-gather")

    # per-host sharded replay: each process owns a UNIQUE slice of the
    # replay distribution, so persistence must be per-process too — a
    # single shared file would either drop every non-primary shard on
    # resume or duplicate proc0's shard onto every host
    if per_host_replay and n_procs > 1:
        buffer_path = os.path.join(
            model_dir,
            f"replay_buffer_latest.proc{jax.process_index()}.npz")
    else:
        buffer_path = os.path.join(model_dir, "replay_buffer_latest.npz")
    plane_scales = getattr(env, "obs_plane_scales", None)
    buffer = load_replay_buffer(buffer_path, capacity=buffer_size,
                                board_size=board_size,
                                channel_scales=plane_scales)
    if buffer is not None and buffer.channels != env.obs_channels:
        log(f"[Buffer] saved buffer has {buffer.channels} obs channels but "
            f"this run encodes {env.obs_channels} (capture-planes toggled?); "
            "starting fresh")
        buffer = None
    if buffer is None:
        log("[Buffer] starting with an empty buffer")
        buffer = ReplayBuffer(capacity=buffer_size, board_size=board_size,
                              channels=env.obs_channels,
                              channel_scales=plane_scales)
    # device-resident ring mirror: single-device path only (the sharded
    # epoch keeps the host batch flow; see DeviceBufferMirror docstring)
    dev_mirror = DeviceBufferMirror(buffer) if mesh is None else None

    if use_fused_inference and inference == "f32":
        inference = "fused"  # back-compat alias for the old boolean flag
    if inference in ("bf16", "fused"):
        from alphazero_gomoku_tpu.ops import fused_net
        if inference == "fused":
            eval_fn = fused_net.make_fused_eval_fn(model_candidate.cfg)
            fold = fused_net.fold_bn
        else:
            eval_fn = fused_net.make_bf16_eval_fn(model_candidate.cfg)
            fold = fused_net.fold_bn_xla
        # cache holds a live reference to the keyed params object so the
        # identity comparison ('is') can never alias a recycled address
        _fold_cache: dict = {}

        def search_bundle(model):
            cached = _fold_cache.get(model)
            if cached is None or cached[0] is not model.params:
                with timer.phase("quantize"):
                    cached = (model.params, fold(
                        model.cfg, model.params, model.batch_stats
                    ))
                _fold_cache[model] = cached
            return cached[1]
    elif inference in ("int8", "int8t"):
        # bias-corrected per-channel int8 search forward (ops/int8_net):
        # strength-neutral by mirrored arena A/B (tools/int8_ab.py) and
        # ~1.3x self-play at production batches.  Re-quantized after
        # every parameter update, calibrated on REAL positions sampled
        # from the replay buffer (falls back to random-play boards while
        # the buffer is empty).  Applies to self-play AND the arenas
        # (symmetric for both sides); the optimizer step stays f32.
        # "int8t" routes the same quantized bundle through the fused
        # whole-tower Pallas kernel (ops/int8_tower) — identical numerics
        # (bit-exact logits), all inter-layer traffic VMEM-resident.
        from alphazero_gomoku_tpu.ops.int8_net import (
            make_int8_eval_fn, quantize_int8, random_play_calib_obs)
        if inference == "int8t":
            from alphazero_gomoku_tpu.ops.int8_tower import (
                make_int8_tower_eval_fn, pack_tower_bundle)
            eval_fn = make_int8_tower_eval_fn(model_candidate.cfg)
        else:
            eval_fn = make_int8_eval_fn(model_candidate.cfg)
        _q_cache: dict = {}
        _calib_rng = np.random.default_rng(seed)

        def _calib_states(cfg_net):
            n = 256
            if len(buffer) >= n:
                return buffer.sample(n, rng=_calib_rng)[0]
            obs = random_play_calib_obs(cfg_net, game=game_name, n=n)
            extra = env.obs_channels - obs.shape[-1]
            if extra > 0:  # e.g. Pente capture planes: zero at game start
                obs = np.concatenate(
                    [obs, np.zeros(obs.shape[:-1] + (extra,), obs.dtype)],
                    axis=-1)
            return obs

        def search_bundle(model):
            cached = _q_cache.get(model)
            if cached is None or cached[0] is not model.params:
                # timed as its own phase: requantization runs on every
                # params change (twice per iteration: post-train for the
                # arena, and for the next iteration's self-play)
                with timer.phase("quantize"):
                    bundle = quantize_int8(
                        model.cfg, model.params, model.batch_stats,
                        _calib_states(model.cfg))
                    if inference == "int8t":
                        bundle = pack_tower_bundle(model.cfg, bundle)
                    cached = (model.params, bundle)
                _q_cache[model] = cached
            return cached[1]
    elif inference == "f32":
        eval_fn = make_eval_fn(model_candidate.cfg)
        search_bundle = bundle_of
    else:
        raise ValueError(f"unknown inference mode: {inference!r}")
    sp_cfg = SelfPlayConfig(
        batch_games=games_per_iteration,
        temp_threshold=temp_threshold,
        use_symmetries=use_symmetries,
        opening_random_moves=opening_random_moves,
        max_moves=selfplay_max_moves,
        pcr_cheap_sims=pcr_cheap_sims,
        pcr_full_prob=pcr_full_prob,
        mcts=MCTSConfig(
            n_simulations=n_simulations,
            cpuct=cpuct,
            dirichlet_alpha=dirichlet_alpha,
            dirichlet_epsilon=dirichlet_epsilon,
            dirichlet_moves=dirichlet_n_moves,
            add_noise=True,
            max_depth=mcts_max_depth,
            backend=mcts_backend,
            leaves_per_sim=mcts_leaves_per_sim,
            fpu_mode=mcts_fpu_mode,
            reuse_budget=mcts_reuse_budget,
            search=mcts_search,
            gumbel_max_considered=gumbel_max_considered,
            gumbel_round_parallel=(gumbel_round_parallel
                                   and mcts_search == "gumbel"),
        ),
    )
    arena_cfg = MCTSConfig(
        n_simulations=eval_mcts_simulations, cpuct=cpuct, add_noise=False,
        max_depth=mcts_max_depth, backend=mcts_backend,
        leaves_per_sim=(mcts_leaves_per_sim
                        if eval_mcts_simulations % mcts_leaves_per_sim == 0
                        else 1),
        fpu_mode=mcts_fpu_mode,
        search=mcts_search,
        gumbel_max_considered=gumbel_max_considered,
        gumbel_round_parallel=(gumbel_round_parallel
                               and mcts_search == "gumbel"),
    )
    anchor_half_fn = None  # sharded anchor arena (set with the mesh below)
    anchor_sims = anchor_mcts_simulations or eval_mcts_simulations
    anchor_mode = anchor_search or mcts_search
    if anchor_mode not in ("puct", "gumbel"):
        raise ValueError(f"unknown anchor_search: {anchor_search!r}")
    anchor_cfg = MCTSConfig(
        n_simulations=anchor_sims, cpuct=cpuct, add_noise=False,
        max_depth=mcts_max_depth, backend=mcts_backend,
        leaves_per_sim=(mcts_leaves_per_sim
                        if anchor_sims % mcts_leaves_per_sim == 0
                        else 1),
        fpu_mode=mcts_fpu_mode,
        search=anchor_mode,
        gumbel_max_considered=gumbel_max_considered,
        gumbel_round_parallel=(gumbel_round_parallel
                               and anchor_mode == "gumbel"),
    )
    arena_half_fn = None
    if selfplay_mode == "continuous":
        steps = selfplay_steps or env.num_actions
        if mesh is not None:
            from alphazero_gomoku_tpu.parallel import (
                make_sharded_selfplay_continuous,
            )
            selfplay_jit = make_sharded_selfplay_continuous(
                env, sp_cfg, eval_fn, mesh, total_steps=steps)
        else:
            from alphazero_gomoku_tpu.selfplay.budget import with_preflight
            selfplay_jit = with_preflight(jax.jit(functools.partial(
                play_games_continuous, env, sp_cfg, eval_fn,
                total_steps=steps,
            )), label="continuous self-play")
        collect = collect_examples_continuous
    elif selfplay_mode == "lockstep":
        if mesh is not None:
            from alphazero_gomoku_tpu.parallel import make_sharded_selfplay
            selfplay_jit = make_sharded_selfplay(env, sp_cfg, eval_fn, mesh)
        else:
            from alphazero_gomoku_tpu.selfplay.budget import with_preflight
            selfplay_jit = with_preflight(jax.jit(
                functools.partial(play_games, env, sp_cfg, eval_fn)
            ), label="lockstep self-play")
        collect = collect_examples
    else:
        raise ValueError(f"unknown selfplay_mode: {selfplay_mode!r}")
    sharded_gather_fn = None
    per_host_epoch_fn = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from alphazero_gomoku_tpu.parallel import (
            make_sharded_arena, make_sharded_gather_epoch,
        )
        arena_half_fn = make_sharded_arena(env, arena_cfg, eval_fn, mesh)
        anchor_half_fn = (
            arena_half_fn if anchor_cfg == arena_cfg
            else make_sharded_arena(env, anchor_cfg, eval_fn, mesh))
        if per_host_replay:
            # per-host replay: no device ring mirror (each host ships its
            # LOCAL batch samples per epoch; the global batch is formed
            # with jax.make_array_from_process_local_data and sharded on
            # the batch axis — parallel/mesh.py form_global_batches)
            from alphazero_gomoku_tpu.parallel import (
                make_sharded_train_epoch,
            )
            per_host_epoch_fn = make_sharded_train_epoch(
                model_candidate.cfg, model_candidate.tx, mesh,
                value_loss_weight=value_loss_weight,
            )
        elif batch_size % mesh.devices.size == 0:
            # device-resident ring + sharded gather epoch: replay arrays
            # stay replicated in HBM; only the [steps, batch] index array
            # is shipped and sharded per iteration
            dev_mirror = DeviceBufferMirror(
                buffer, sharding=NamedSharding(mesh, PartitionSpec()))
            sharded_gather_fn = make_sharded_gather_epoch(
                model_candidate.cfg, model_candidate.tx, mesh,
                value_loss_weight=value_loss_weight,
            )
        else:
            log(f"[mesh] batch_size {batch_size} not divisible by "
                f"{mesh.devices.size} chips; training stays unsharded")

    if mcts_backend == "pallas":
        # fail fast on batches the lane-tiled kernels reject — a bad
        # eval_games would otherwise raise inside the arena phase, be
        # swallowed by its keep-training-alive except, and silently
        # zero the gate every iteration
        from alphazero_gomoku_tpu.ops.tree_kernels import LANE_TILE

        n_shards = mesh.devices.size if mesh is not None else 1
        checks = [
            ("games_per_iteration (per chip)",
             games_per_iteration // n_shards
             if mesh is not None else games_per_iteration),
            ("eval_games first half (per chip)",
             -(-((eval_games + 1) // 2) // n_shards)),
            ("eval_games second half (per chip)",
             -(-(eval_games // 2) // n_shards)),
        ]
        for what, n in checks:
            if n > LANE_TILE and n % LANE_TILE:
                raise ValueError(
                    f"{what}={n}: with mcts_backend='pallas', lockstep "
                    f"batches above {LANE_TILE} must be multiples of "
                    f"{LANE_TILE} (lane-tiled tree kernels)")

    eval_every = max(1, eval_every)
    rng_np = np.random.default_rng(seed)
    history = []
    timer = PhaseTimer()
    end_iter = next_iteration_continuation + num_iterations
    # trace the SECOND iteration: the first is dominated by compilation
    trace_iter = next_iteration_continuation + 1 if profile_trace_dir else -1

    for it in range(next_iteration_continuation, end_iter):
        t_iter = time.time()
        totals_at_iter_start = dict(timer.totals)
        if it == trace_iter:
            log(f"[profiler] capturing device trace of iteration {it} "
                f"-> {start_profiler_trace(profile_trace_dir)}")
        log(f"\n=== ITER {it}/{end_iter - 1}: self-play "
            f"(games={games_per_iteration}, sims={n_simulations}) "
            f"@ {datetime.now().strftime('%Y-%m-%d %H:%M:%S')} ===")

        # ---- phase 1: self-play --------------------------------------
        bundle_cand = search_bundle(model_candidate)  # quantize phase
        with timer.phase("selfplay"), trace_annotation("selfplay"):
            traj = selfplay_jit(bundle_cand,
                                jax.random.PRNGKey(seed * 100003 + it))
            if mesh is not None and per_host_replay:
                # per-host replay: each process keeps only the games its
                # own devices played — no cross-host communication at all
                from alphazero_gomoku_tpu.parallel import (
                    local_trajectory_shards,
                )
                traj = local_trajectory_shards(traj)
            elif mesh is not None:
                # multi-host collection: all-gather the trajectory shards
                # (lockstep Trajectories or ContinuousRecords alike) so
                # every process can run host-side collection (on one host
                # this is a cheap local reshard — always on, so the
                # multi-host path is exercised by every mesh run)
                from alphazero_gomoku_tpu.parallel import (
                    gather_trajectories,
                )
                traj = gather_trajectories(traj, mesh)
            # block here so the selfplay phase times the device work and
            # "collect" times only the host-side flattening
            traj = jax.block_until_ready(traj)
        with timer.phase("collect"):
            states, pis, zs, winners = collect(
                traj, use_symmetries=use_symmetries,
                value_target_mix=value_target_mix,
                capture_planes=pente_capture_planes,
            )
        with timer.phase("buffer"):
            written = buffer.add(states, pis, zs)
            if dev_mirror is not None:
                if len(written) == buffer.capacity:
                    dev_mirror = DeviceBufferMirror(   # full overwrite
                        buffer, sharding=dev_mirror.sharding)
                else:
                    dev_mirror.sync(states, pis, zs, written)
        if selfplay_mode == "continuous":
            n_moves = int(np.asarray(traj.ended).size)
            if len(zs) == 0:
                log("[selfplay] WARNING: no game finished within "
                    f"{selfplay_steps or env.num_actions} plies — all "
                    "records dropped; raise selfplay_steps")
        else:
            n_moves = int(np.asarray(traj.moves_played).sum())
        sp_dt = timer.last["selfplay"]
        pcr_note = ""
        if pcr_cheap_sims:
            # cheap (value-only) plies carry all-zero recorded pis
            traj_pis = np.asarray(traj.pis)
            valid = (np.asarray(traj.active) if selfplay_mode == "lockstep"
                     else np.asarray(traj.recorded))
            n_valid = max(int(valid.sum()), 1)
            full = int(((traj_pis.sum(axis=-1) > 0.5) & valid).sum())
            pcr_note = (f", pcr full plies {full}/{n_valid} "
                        f"({full / n_valid:.2f})")
        log(f"self-play done: {sp_dt:.1f}s, {n_moves} moves "
            f"({n_moves / max(sp_dt, 1e-9):.1f} moves/s), collect "
            f"{timer.last['collect']:.1f}s, winners={winners}, "
            f"buffer={len(buffer)}{pcr_note}")

        # ---- phase 2: train ------------------------------------------
        loss_info = None
        with timer.phase("train"), trace_annotation("train"):
            if per_host_epoch_fn is not None:
                # gate + steps/epoch from the GLOBAL sample count: hosts
                # hold different-length shards, and diverging on control
                # flow that issues collectives would deadlock the epoch
                from alphazero_gomoku_tpu.parallel import (
                    global_buffer_len,
                    min_local_buffer_len,
                )
                effective_len = global_buffer_len(len(buffer))
                # also require every host's shard to be non-empty: an
                # empty shard cannot draw its share of the global batch,
                # and the gate must agree on all hosts (deadlock otherwise)
                if min_local_buffer_len(len(buffer)) == 0:
                    effective_len = 0
            else:
                effective_len = len(buffer)
            if effective_len >= batch_size:
                n_batches = max(1, effective_len // batch_size)
                log(f"training candidate: buffer={len(buffer)}"
                    + (f" local / {effective_len} global"
                       if per_host_epoch_fn is not None else "")
                    + f", batch={batch_size}, epochs={epochs_per_iter}, "
                    f"steps/epoch={n_batches}")
                for epoch in range(epochs_per_iter):
                    t1 = time.time()
                    if per_host_epoch_fn is not None:
                        # per-host replay: sample this host's share of
                        # every step's batch locally, assemble the global
                        # sharded batch arrays, run the data-parallel
                        # epoch (XLA all-reduces the gradients)
                        from alphazero_gomoku_tpu.parallel import (
                            form_global_batches,
                        )
                        local_bs = batch_size // n_procs
                        xs, ps, zb = buffer.sample_many(n_batches,
                                                        local_bs, rng_np)
                        gx, gp, gz = form_global_batches(mesh, xs, ps, zb)
                        (model_candidate.params,
                         model_candidate.batch_stats,
                         model_candidate.opt_state,
                         metrics) = per_host_epoch_fn(
                            model_candidate.params,
                            model_candidate.batch_stats,
                            model_candidate.opt_state, gx, gp, gz)
                    elif sharded_gather_fn is not None:
                        # mesh path: replicated device ring + sharded
                        # per-step batch gather; only idx crosses the link
                        idx = np.stack([
                            rng_np.choice(len(buffer), size=batch_size,
                                          replace=False)
                            for _ in range(n_batches)
                        ]).astype(np.int32)
                        (model_candidate.params,
                         model_candidate.batch_stats,
                         model_candidate.opt_state,
                         metrics) = sharded_gather_fn(
                            model_candidate.params,
                            model_candidate.batch_stats,
                            model_candidate.opt_state,
                            dev_mirror.states, dev_mirror.pis,
                            dev_mirror.zs, jnp.asarray(idx),
                            dev_mirror.inv_scales)
                    elif dev_mirror is not None:
                        # same RNG draws as buffer.sample_many — only the
                        # [steps, batch] index array crosses the link
                        idx = np.stack([
                            rng_np.choice(len(buffer), size=batch_size,
                                          replace=False)
                            for _ in range(n_batches)
                        ]).astype(np.int32)
                        (model_candidate.params,
                         model_candidate.batch_stats,
                         model_candidate.opt_state,
                         metrics) = train_epoch_gather_fn(
                            model_candidate.cfg, model_candidate.tx,
                            model_candidate.params,
                            model_candidate.batch_stats,
                            model_candidate.opt_state,
                            dev_mirror.states, dev_mirror.pis,
                            dev_mirror.zs, jnp.asarray(idx),
                            dev_mirror.inv_scales,
                            value_loss_weight)
                    else:
                        xs, ps, zb = buffer.sample_many(n_batches, batch_size,
                                                        rng_np)
                        (model_candidate.params,
                         model_candidate.batch_stats,
                         model_candidate.opt_state,
                         metrics) = train_epoch_fn(
                            model_candidate.cfg, model_candidate.tx,
                            model_candidate.params,
                            model_candidate.batch_stats,
                            model_candidate.opt_state,
                            jnp.asarray(xs), jnp.asarray(ps),
                            jnp.asarray(zb), value_loss_weight)
                    loss_info = {k: float(v) for k, v in metrics.items()}
                    log(f"  epoch {epoch + 1}/{epochs_per_iter}: "
                        f"{time.time() - t1:.1f}s, last_loss={loss_info}")
            else:
                log(f"not enough samples (buffer={effective_len} < "
                    f"{batch_size}); skipping training this iteration")

        # ---- phase 3: arena ------------------------------------------
        run_arena = (it % eval_every == 0)
        arena_stats = None
        if run_arena:
            bundle_cand = search_bundle(model_candidate)  # quantize phase
            bundle_best = search_bundle(model_best)
            with timer.phase("arena"), trace_annotation("arena"):
                try:
                    arena_stats = evaluate_params_detailed(
                        env, arena_cfg, eval_fn,
                        bundle_cand,
                        bundle_best,
                        eval_games, jax.random.PRNGKey(seed * 7919 + it),
                        arena_half_fn=arena_half_fn,
                    )
                except Exception as e:  # keep training alive (ref behaviour)
                    log(f"evaluation failed: {e}")
                    arena_stats = {"wins": 0, "played": 0, "draws": 0,
                                   "win_rate": 0.0, "ci95": (0.0, 1.0),
                                   "pairs": {"win_both": 0, "split": 0,
                                             "loss_both": 0, "n": 0}}
        if arena_stats is not None:
            new_wins, win_rate = arena_stats["wins"], arena_stats["win_rate"]
            draws = arena_stats["draws"]
            ci_lo, ci_hi = arena_stats["ci95"]
            pairs = arena_stats["pairs"]
            eval_dt = timer.last["arena"]
            log(f"eval done: {eval_dt:.1f}s, win_rate={win_rate:.3f} "
                f"({new_wins}/{eval_games}), draws={draws}, "
                f"CI95=[{ci_lo:.2f},{ci_hi:.2f}], mirrored pairs "
                f"W/S/L={pairs['win_both']}/{pairs['split']}/"
                f"{pairs['loss_both']}")
        else:
            win_rate = None
            draws = None
            ci_lo = ci_hi = None
            pairs = None
            eval_dt = 0.0
            log(f"arena skipped (eval_every={eval_every})")

        # ---- phase 3b: hold-out anchor arena (absolute strength) -----
        anchor_stats = None
        if model_anchor is not None and it % anchor_arena_every == 0:
            with timer.phase("anchor"):
                try:
                    anchor_stats = evaluate_params_detailed(
                        env, anchor_cfg, eval_fn,
                        search_bundle(model_candidate),
                        search_bundle(model_anchor),
                        eval_games, jax.random.PRNGKey(seed * 104729 + it),
                        arena_half_fn=anchor_half_fn,
                    )
                    a_lo, a_hi = anchor_stats["ci95"]
                    ap = anchor_stats["pairs"]
                    log(f"anchor arena: "
                        f"win_rate={anchor_stats['win_rate']:.3f}"
                        f" ({anchor_stats['wins']}/{anchor_stats['played']}),"
                        f" CI95=[{a_lo:.2f},{a_hi:.2f}], pairs W/S/L="
                        f"{ap['win_both']}/{ap['split']}/{ap['loss_both']}")
                except Exception as e:
                    log(f"anchor arena failed: {e}")

        # ---- phase 4: gate (skipped along with the arena) --------------
        accepted, reset_worthy = gate_decision(
            gate_stat, win_rate, (ci_lo, ci_hi), win_rate_threshold,
            run_arena=run_arena)
        if not run_arena:
            pass  # no arena this iteration: best unchanged, no reset
        elif accepted:
            log(f" candidate ACCEPTED ({gate_stat}) -> promoted to best")
            model_best.copy_weights_from(model_candidate)
        elif gate_mode == "reset" and reset_worthy:
            log(" candidate rejected -> restored from best")
            model_candidate.copy_weights_from(model_best)
        elif gate_mode == "reset":  # ci_low inconclusive: no reset
            log(" arena inconclusive (CI straddles threshold) -> "
                "candidate keeps training, best unchanged")
        else:  # "track": best stays put; candidate trains on
            log(" candidate rejected -> best unchanged (track mode)")

        # ---- phase 5: snapshot + persist buffer ----------------------
        # multi-host: only the primary writes model artifacts (model and
        # optimizer state are replicated, so one writer fully describes
        # them).  The replay buffer is only replicated in the default
        # mode; under per_host sharding every process persists its own
        # unique shard to its own file (buffer_path is per-process).
        primary = jax.process_index() == 0
        snapshot_path = None
        with timer.phase("checkpoint"):
            if primary and it % save_every == 0:
                ts = datetime.now().strftime("%Y%m%d_%H%M%S")
                snapshot_path = os.path.join(
                    model_dir, f"snapshot_iter{it}_{ts}.ckpt"
                )
                # snapshots persist the CANDIDATE: in reset mode it equals
                # best after gating (identical behaviour), and in track
                # mode it is the evolving net — the thing the post-hoc
                # peak harvest (tools/harvest_run.py) needs; best-only
                # snapshots would all be the unchanged starting weights
                model_candidate.save(snapshot_path)
                # stable alias used by the player plugins' default model_path
                model_best.save(os.path.join(model_dir, "best_latest.ckpt"))
                log(f" saved snapshot: {snapshot_path}")
            if (primary or per_host_replay) and (
                    it % buffer_save_every == 0 or it == end_iter - 1):
                save_replay_buffer(buffer, buffer_path)
        if it == trace_iter:
            stop_profiler_trace()
            log(f"[profiler] trace written to {profile_trace_dir}")

        it_total = time.time() - t_iter
        phase_dt = {
            k: timer.totals[k] - totals_at_iter_start.get(k, 0.0)
            for k in timer.totals
            if timer.totals[k] - totals_at_iter_start.get(k, 0.0) >= 0.05
        }
        other_dt = it_total - sum(phase_dt.values())
        log(f"iteration {it} finished in {it_total:.1f}s ("
            + ", ".join(f"{k} {v:.1f}" for k, v in phase_dt.items())
            + f", other {other_dt:.1f}); winners={winners}")
        history.append({
            "iteration": it,
            "winners": winners,
            "moves": n_moves,
            "selfplay_seconds": round(sp_dt, 3),
            "eval_seconds": round(eval_dt, 3),
            "train_seconds": round(timer.last.get("train", 0.0), 3),
            "loss": loss_info,
            "win_rate": win_rate,
            "win_rate_ci95": ([round(ci_lo, 4), round(ci_hi, 4)]
                              if run_arena else None),
            "arena_pairs": pairs,
            "anchor": anchor_stats,
            "draws": draws,
            "accepted": accepted,
            "buffer_size": len(buffer),
            "snapshot": snapshot_path,
        })

    log("\n=== training complete ===")
    log(f"phase totals: {timer.summary()}")
    return history
