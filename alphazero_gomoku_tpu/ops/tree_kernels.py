"""Pallas TPU kernels for the MCTS array-tree walk (select + backup).

Round-1 profiling put ~63% of self-play move time in the tree phases of
``search/tree.py``: the select walk's per-lane row gathers and the backup
walk's per-lane scatter-adds, which XLA lowers to serialized dynamic-slice
loops with heavy per-op overhead (and which hard-fault the TPU worker
outright at larger ``games x sims`` products — see ROADMAP.md).  These
kernels replace that lowering with explicit row DMAs.

Node layout (round 3, "node-as-group"):  each tree node owns one ALIGNED
``[GROUP=8, seg]`` f32 tile of the packed array ``[B, n_nodes * 8, seg]``
(``seg`` = num_actions rounded up to 128 lanes), with one segment per
sublane:

  sublane 0  N   per-action visit counts
  sublane 1  W   per-action total values
  sublane 2  P   signed priors (illegal = -1; cols >= A padded -1)
  sublane 3  C   child node indices as small-int f32 (-1 = unexpanded)
  sublane 4  meta: col 0 = done flag, col 1 = node value estimate (the
             Gumbel completed-Q mix); other cols unused
  sublanes 5-7 padding (Mosaic's f32 HBM tiling moves sublanes in
             groups of 8, so a node cannot occupy fewer than 8)

Compared to the round-1/2 layout (one ``4*seg + 128``-wide row per node,
DMA'd as the enclosing 8-ROW group and reduced to the target row with an
8-way masked select), one hop now moves ``8 * seg * 4`` bytes instead of
``8 * (4*seg + 128) * 4`` — 4.5x less HBM traffic at the production shape
(8 KB vs 36.9 KB for A=225) — and the masked row-select disappears: the
DMA'd tile IS the node.  Measured A/B in runs/kernel_ab_r3.log.

  - :func:`select_walk` walks all B lanes in lockstep: per hop it issues B
    concurrent node-tile DMAs (HBM -> VMEM), computes the PUCT argmax
    vectorized over the [B, seg] segment slices, and advances each lane;
    lanes stop on a terminal node, an unexpanded edge, or the depth cap,
    and the walk's (node, action) path is recorded for the backup pass.
  - :func:`backup_paths` composes the freshly expanded node's tile as a
    PURE VMEM write (nothing shares the slot's group, so no read-modify
    cycle), then replays each lane's recorded path, read-modify-writing
    one node tile per hop per lane (N[a] += 1, W[a] += ±v with the
    per-hop perspective flip, and C[a] = slot on the expansion edge).

Semantics are bit-compatible with the XLA reference implementation in
``search/tree.py`` (same f32 PUCT formula, same first-max argmax
tie-breaking, same terminal/depth-cap handling); the differential test in
``tests/test_tree_kernels.py`` checks exact agreement of the visit-count
policies.  Reference search semantics:
``/root/reference/mcts/new_mcts_alpha.py:102-151``.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
GROUP = 8  # f32 sublane tile: DMA slices must move whole 8-row groups

# segment sublane indices within a node tile (see module docstring)
SL_N, SL_W, SL_P, SL_C, SL_META = 0, 1, 2, 3, 4

# lanes processed per grid step: the kernels' VMEM scratch is
# [tile, GROUP, seg] (~1 MB at 128 lanes x the production seg width)
# — larger game batches run as a sequential lane-tile grid (lanes are
# independent; results are identical).  Grid steps serialize, so a
# bigger tile = more concurrent node DMAs per hop and fewer serialized
# walks; the kernels request a scoped-VMEM budget sized to the tile
# (:func:`_vmem_limit`).  Measured (runs/tileprobe.log, round 2, old
# layout): tiles > 128 compile but buy no speed on v5e, so 128 stays
# the shipped default.  Overridable via AZG_LANE_TILE for probes.
LANE_TILE = int(os.environ.get("AZG_LANE_TILE", "128"))


def _lane_tiling(b: int):
    """(tile, n_tiles) for a batch of ``b`` independent lanes."""
    if b > LANE_TILE:
        if b % LANE_TILE:
            raise ValueError(
                f"batch {b} > {LANE_TILE} must be a multiple of {LANE_TILE}")
        return LANE_TILE, b // LANE_TILE
    return b, 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vmem_limit(tile: int, seg: int) -> int:
    """Scoped-VMEM budget for a lane tile: scratch + body temporaries.

    Mosaic's default scoped limit is 16 MiB — an occupancy heuristic for
    kernels that share the core.  These walk kernels run alone between
    network forwards, and a v5e core has 128 MiB of physical VMEM, so the
    budget is sized to the tile: the [tile, GROUP, seg] f32 scratch plus
    headroom for the hop body's [tile, GROUP, seg]-shaped temporaries
    (the backup delta masks), capped well under the physical limit.
    """
    scratch = tile * GROUP * seg * 4
    # x8: row + compose buffers in the backup kernel plus headroom for
    # the hop body's tile-shaped temporaries
    return min(int(scratch * 8) + 16 * 1024 * 1024, 112 * 1024 * 1024)


class PackedLayout(NamedTuple):
    """Shape constants of the packed node-tile array.

    The tree is ``[B, n_nodes * GROUP, seg]`` f32; node ``k`` owns sublane
    rows ``[k*GROUP, (k+1)*GROUP)`` with the segment map in the module
    docstring.  ``seg`` is ``num_actions`` rounded up to 128 lanes.
    """

    num_actions: int   # A
    seg: int           # S: minor width (A rounded to 128)
    n_nodes: int       # node capacity (exact; dim 1 is n_nodes * GROUP)


def packed_layout(num_actions: int, n_nodes: int) -> PackedLayout:
    return PackedLayout(
        num_actions=num_actions,
        seg=_round_up(num_actions, 128),
        n_nodes=int(n_nodes),
    )


def _group_base(node, node_max):
    """Clamped sublane-row base of a node's tile for a DMA.

    Every HBM node DMA in these kernels addresses
    ``packed[lane, g:g+GROUP, :]`` with ``g = node * GROUP`` derived from
    tree data (child indices stored as f32).  An out-of-range index here
    is not an XLA gather (which clamps) but a raw DMA descriptor — it
    hard-faults the TPU worker process.  Clamping the NODE to
    ``[0, n_nodes - 1]`` makes corrupt tree data (whatever its source)
    produce a wrong-but-bounded read/write instead of killing the worker;
    correct indices are unaffected.  The closing ``* GROUP`` is also what
    lets Mosaic prove the memref-slice index divisible by the sublane
    tile (8).  Added while chasing the batch-512 f32 fault
    (repro/bisect_batch512_fault.py).
    """
    node_c = jnp.minimum(jnp.maximum(node, 0), node_max)
    return node_c * GROUP


# ----------------------------------------------------------------------
# select kernel
# ----------------------------------------------------------------------
def _select_kernel(layout: PackedLayout, cpuct: float, depth_limit: int,
                   fpu_parent: bool,
                   packed_hbm,
                   leaf_ref, act_ref, pnodes_ref, pacts_ref, plen_ref,
                   rows_vmem, nodes_vmem, stopped_vmem, sems):
    a = layout.num_actions
    b = rows_vmem.shape[0]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (b, a), 1)

    nodes_vmem[:] = jnp.zeros((b, 1), jnp.int32)
    stopped_vmem[:] = jnp.zeros((b, 1), jnp.int32)
    plen_ref[:] = jnp.zeros((b, 1), jnp.int32)
    leaf_ref[:] = jnp.zeros((b, 1), jnp.int32)
    act_ref[:] = jnp.full((b, 1), -1, jnp.int32)
    pnodes_ref[:] = jnp.zeros_like(pnodes_ref)
    pacts_ref[:] = jnp.zeros_like(pacts_ref)

    lane0 = pl.program_id(0) * b  # absolute lane of this tile's first row
    n_max = layout.n_nodes - 1  # DMA guard: see _group_base

    def fetch_groups():
        # NOTE (round 4): predicating these DMAs per lane on
        # `stopped_vmem` (to skip stragglers' traffic) is a measured
        # dead end — Mosaic does not honor pl.when around DMA
        # start/wait (the "skipped" copy still executes; probed on
        # device, see DECISIONS round-4 notes), and the attempt hung
        # kernel compilation outright.  Fetches stay unconditional.
        def start(i, _):
            g = _group_base(nodes_vmem[i, 0], n_max)
            pltpu.make_async_copy(
                packed_hbm.at[lane0 + i, pl.ds(g, GROUP), :],
                rows_vmem.at[i], sems.at[i],
            ).start()
            return 0
        jax.lax.fori_loop(0, b, start, 0)

        def wait(i, _):
            g = _group_base(nodes_vmem[i, 0], n_max)
            pltpu.make_async_copy(
                packed_hbm.at[lane0 + i, pl.ds(g, GROUP), :],
                rows_vmem.at[i], sems.at[i],
            ).wait()
            return 0
        jax.lax.fori_loop(0, b, wait, 0)

    def cond(carry):
        h, all_stopped = carry
        return jnp.logical_and(h < depth_limit, jnp.logical_not(all_stopped))

    def body(carry):
        h, _ = carry
        fetch_groups()
        nodes = nodes_vmem[:]
        tiles = rows_vmem[:]                     # [B, GROUP, seg]
        active = stopped_vmem[:] == 0

        n = tiles[:, SL_N, :][:, 0:a]
        w = tiles[:, SL_W, :][:, 0:a]
        p = tiles[:, SL_P, :][:, 0:a]
        done = tiles[:, SL_META, :][:, 0:1] > 0.5

        # PUCT, formula-identical to tree._puct_scores (f32 throughout)
        pmax = jnp.maximum(p, 0.0)
        sum_n = jnp.sum(n, axis=1, keepdims=True)
        if fpu_parent:  # first-play urgency (tree.MCTSConfig.fpu_mode):
            # true-mean Q for visited edges + parent mean for unvisited
            parent_q = jnp.sum(w, axis=1, keepdims=True) \
                / jnp.maximum(sum_n, 1.0)
            q = jnp.where(n > 0.0, w / jnp.maximum(n, 1.0), parent_q)
        else:
            q = w / (1.0 + n)
        sqrt_sum = jnp.sqrt(sum_n)
        scores = q + cpuct * pmax * sqrt_sum / (1.0 + n)
        scores = jnp.where(p >= 0.0, scores, NEG_INF)
        # lowest-index-of-max, order-independently: Mosaic's argmax does not
        # guarantee numpy's first-occurrence tie-breaking, and fresh nodes
        # (all scores 0) tie across every legal action
        mx = jnp.max(scores, axis=1, keepdims=True)
        action = jnp.min(
            jnp.where(scores == mx, iota_a, jnp.int32(2 ** 30)),
            axis=1, keepdims=True,
        ).astype(jnp.int32)

        onehot = iota_a == action
        child = jnp.sum(
            jnp.where(onehot, tiles[:, SL_C, :][:, 0:a], 0.0),
            axis=1, keepdims=True,
        ).astype(jnp.int32)

        walking = jnp.logical_and(active, jnp.logical_not(done))
        expandable = child < 0
        # lanes taking an edge this hop (to a child or into an expansion)
        # record (node, action) at the lockstep column h
        rec = walking
        rec_row = jnp.reshape(jnp.where(rec, nodes, -1), (1, b))
        act_row = jnp.reshape(jnp.where(rec, action, -1), (1, b))
        pnodes_ref[pl.ds(h, 1), :] = rec_row
        pacts_ref[pl.ds(h, 1), :] = act_row
        plen_ref[:] = plen_ref[:] + rec.astype(jnp.int32)

        stop_done = jnp.logical_and(active, done)
        stop_expand = jnp.logical_and(walking, expandable)
        stop_now = jnp.logical_or(stop_done, stop_expand)

        act_ref[:] = jnp.where(stop_expand, action, act_ref[:])
        leaf_ref[:] = jnp.where(stop_now, nodes, leaf_ref[:])
        nodes_vmem[:] = jnp.where(
            jnp.logical_and(walking, jnp.logical_not(expandable)),
            child, nodes,
        )
        stopped_vmem[:] = jnp.maximum(
            stopped_vmem[:], stop_now.astype(jnp.int32)
        )
        all_stopped = jnp.all(stopped_vmem[:] == 1)
        return h + 1, all_stopped

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

    # lanes still walking hit the depth cap: leaf = current node, action -1
    # (matches tree._select_and_expand's `capped` stop)
    still = stopped_vmem[:] == 0
    leaf_ref[:] = jnp.where(still, nodes_vmem[:], leaf_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("layout", "cpuct", "depth_limit",
                                    "interpret", "fpu_parent"))
def select_walk(packed: jax.Array, layout: PackedLayout, cpuct: float,
                depth_limit: int, interpret: bool = False,
                fpu_parent: bool = False):
    """Lockstep PUCT select over B packed trees.

    Args:
        packed: f32 [B, n_nodes * GROUP, seg] packed node tiles (HBM).
    Returns:
        leaf [B] i32 node each lane stopped on; action [B] i32 (the edge to
        expand, -1 when the lane stopped on a terminal/depth-capped node);
        path_nodes/path_actions [depth, B] i32 and path_len [B] i32 for the
        backup pass.
    """
    b = packed.shape[0]
    d = depth_limit
    tile, n_tiles = _lane_tiling(b)
    kernel = functools.partial(_select_kernel, layout, cpuct, depth_limit,
                               fpu_parent)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # leaf
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # action
            jax.ShapeDtypeStruct((d, b), jnp.int32),   # path nodes
            jax.ShapeDtypeStruct((d, b), jnp.int32),   # path actions
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # path len
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, GROUP, layout.seg), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, layout.seg)),
        interpret=interpret,
    )(packed)
    leaf, action, pnodes, pacts, plen = out
    return leaf[:, 0], action[:, 0], pnodes, pacts, plen[:, 0]


# ----------------------------------------------------------------------
# gumbel select kernel (search/gumbel.py's walk on the packed layout)
# ----------------------------------------------------------------------
def _gumbel_select_kernel(layout: PackedLayout, depth_limit: int,
                          c_visit: float, c_scale: float, fan: int,
                          packed_hbm, rootact_in,
                          leaf_ref, act_ref, pnodes_ref, pacts_ref, plen_ref,
                          rows_vmem, nodes_vmem, stopped_vmem, sems):
    """Forced root hop + the deterministic Gumbel non-root rule.

    Per hop (all VPU over the [B, seg] segment slices): completed-Q per
    action (visited => W/N, else the node's mixed value from the meta
    sublane's col 1), pi' = softmax(log prior + (c_visit + max N) * c_scale
    * completedQ), action = argmax(pi' - N/(1+sum N)); the hop at depth 0
    takes the lane's forced ``root_action`` instead.  Stop/record/path
    semantics identical to :func:`_select_kernel`.

    ``fan`` > 1 runs ``fan`` read-only walk lanes PER TREE (lane ``l``
    walks tree ``l // fan``): the round-parallel gumbel driver batches
    one halving round's simulations — each forcing a distinct root
    action, hence walking a disjoint subtree — into one kernel launch.
    """
    a = layout.num_actions
    b = rows_vmem.shape[0]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (b, a), 1)

    nodes_vmem[:] = jnp.zeros((b, 1), jnp.int32)
    stopped_vmem[:] = jnp.zeros((b, 1), jnp.int32)
    plen_ref[:] = jnp.zeros((b, 1), jnp.int32)
    leaf_ref[:] = jnp.zeros((b, 1), jnp.int32)
    act_ref[:] = jnp.full((b, 1), -1, jnp.int32)
    pnodes_ref[:] = jnp.zeros_like(pnodes_ref)
    pacts_ref[:] = jnp.zeros_like(pacts_ref)

    lane0 = pl.program_id(0) * b
    n_max = layout.n_nodes - 1

    def fetch_groups():
        # unconditional per-lane fetches: see _select_kernel.fetch_groups
        def start(i, _):
            g = _group_base(nodes_vmem[i, 0], n_max)
            pltpu.make_async_copy(
                packed_hbm.at[(lane0 + i) // fan, pl.ds(g, GROUP), :],
                rows_vmem.at[i], sems.at[i],
            ).start()
            return 0
        jax.lax.fori_loop(0, b, start, 0)

        def wait(i, _):
            g = _group_base(nodes_vmem[i, 0], n_max)
            pltpu.make_async_copy(
                packed_hbm.at[(lane0 + i) // fan, pl.ds(g, GROUP), :],
                rows_vmem.at[i], sems.at[i],
            ).wait()
            return 0
        jax.lax.fori_loop(0, b, wait, 0)

    def cond(carry):
        h, all_stopped = carry
        return jnp.logical_and(h < depth_limit, jnp.logical_not(all_stopped))

    def body(carry):
        h, _ = carry
        fetch_groups()
        nodes = nodes_vmem[:]
        tiles = rows_vmem[:]                     # [B, GROUP, seg]
        active = stopped_vmem[:] == 0

        n = tiles[:, SL_N, :][:, 0:a]
        w = tiles[:, SL_W, :][:, 0:a]
        p_signed = tiles[:, SL_P, :][:, 0:a]
        meta = tiles[:, SL_META, :]
        done = meta[:, 0:1] > 0.5
        v_node = meta[:, 1:2]                    # [B, 1]

        legal = p_signed >= 0.0
        p = jnp.maximum(p_signed, 0.0)
        sum_n = jnp.sum(n, axis=1, keepdims=True)
        q = w / jnp.maximum(n, 1.0)
        visited = n > 0.0
        p_vis = jnp.sum(jnp.where(visited, p, 0.0), axis=1, keepdims=True)
        w_q = jnp.sum(jnp.where(visited, p * q, 0.0), axis=1,
                      keepdims=True) / jnp.maximum(p_vis, 1e-8)
        v_mix = (v_node + sum_n * w_q) / (1.0 + sum_n)
        v_mix = jnp.where(p_vis > 1e-8, v_mix, v_node)
        comp_q = jnp.where(visited, q, v_mix)

        logits = jnp.log(jnp.maximum(p, 1e-30))
        max_n = jnp.max(n, axis=1, keepdims=True)
        sm_in = jnp.where(
            legal, logits + (c_visit + max_n) * c_scale * comp_q, NEG_INF)
        sm_max = jnp.max(sm_in, axis=1, keepdims=True)
        e = jnp.where(legal, jnp.exp(sm_in - sm_max), 0.0)
        pi_prime = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)

        scores = jnp.where(legal, pi_prime - n / (1.0 + sum_n), NEG_INF)
        mx = jnp.max(scores, axis=1, keepdims=True)
        walk_action = jnp.min(
            jnp.where(scores == mx, iota_a, jnp.int32(2 ** 30)),
            axis=1, keepdims=True,
        ).astype(jnp.int32)
        action = jnp.where(h == 0, rootact_in[:], walk_action)

        onehot = iota_a == action
        child = jnp.sum(
            jnp.where(onehot, tiles[:, SL_C, :][:, 0:a], 0.0),
            axis=1, keepdims=True,
        ).astype(jnp.int32)

        walking = jnp.logical_and(active, jnp.logical_not(done))
        expandable = child < 0
        rec = walking
        rec_row = jnp.reshape(jnp.where(rec, nodes, -1), (1, b))
        act_row = jnp.reshape(jnp.where(rec, action, -1), (1, b))
        pnodes_ref[pl.ds(h, 1), :] = rec_row
        pacts_ref[pl.ds(h, 1), :] = act_row
        plen_ref[:] = plen_ref[:] + rec.astype(jnp.int32)

        stop_done = jnp.logical_and(active, done)
        stop_expand = jnp.logical_and(walking, expandable)
        stop_now = jnp.logical_or(stop_done, stop_expand)

        act_ref[:] = jnp.where(stop_expand, action, act_ref[:])
        leaf_ref[:] = jnp.where(stop_now, nodes, leaf_ref[:])
        nodes_vmem[:] = jnp.where(
            jnp.logical_and(walking, jnp.logical_not(expandable)),
            child, nodes,
        )
        stopped_vmem[:] = jnp.maximum(
            stopped_vmem[:], stop_now.astype(jnp.int32)
        )
        all_stopped = jnp.all(stopped_vmem[:] == 1)
        return h + 1, all_stopped

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

    still = stopped_vmem[:] == 0
    leaf_ref[:] = jnp.where(still, nodes_vmem[:], leaf_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("layout", "depth_limit", "c_visit",
                                    "c_scale", "interpret", "fan"))
def gumbel_select_walk(packed: jax.Array, root_actions: jax.Array,
                       layout: PackedLayout, depth_limit: int,
                       c_visit: float, c_scale: float,
                       interpret: bool = False, fan: int = 1):
    """Gumbel walk over B packed trees with per-lane forced root actions.

    Same outputs as :func:`select_walk`.  ``root_actions`` i32 [B * fan];
    with ``fan`` > 1 walk lane ``l`` reads tree ``l // fan`` (read-only
    round-parallel batching, see :func:`_gumbel_select_kernel`) and every
    output is sized ``[B * fan]`` / ``[depth, B * fan]``.
    """
    b = packed.shape[0] * fan
    if root_actions.shape[0] != b:
        raise ValueError(
            f"root_actions has {root_actions.shape[0]} lanes, expected "
            f"{packed.shape[0]} trees x fan {fan} = {b}")
    d = depth_limit
    tile, n_tiles = _lane_tiling(b)
    kernel = functools.partial(_gumbel_select_kernel, layout, depth_limit,
                               c_visit, c_scale, fan)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # root actions
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # leaf
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # action
            jax.ShapeDtypeStruct((d, b), jnp.int32),   # path nodes
            jax.ShapeDtypeStruct((d, b), jnp.int32),   # path actions
            jax.ShapeDtypeStruct((b, 1), jnp.int32),   # path len
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, GROUP, layout.seg), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, layout.seg)),
        interpret=interpret,
    )(packed, root_actions.reshape(b, 1).astype(jnp.int32))
    leaf, action, pnodes, pacts, plen = out
    return leaf[:, 0], action[:, 0], pnodes, pacts, plen[:, 0]


# ----------------------------------------------------------------------
# backup kernel
# ----------------------------------------------------------------------
def _backup_kernel_serial(layout: PackedLayout, mode: str,
                   packed_in, pnodes_ref, pacts_ref, plen_ref, values_ref,
                   expanding_ref, priors_ref, done_ref, slot_ref,
                   packed_out, rows_vmem, hopnodes_vmem, sems):
    """Serial hop replay — the shipped (and only) backup kernel.

    A triple-buffered DMA pipeline variant existed in round 4 (hop i+1's
    reads started before hop i's compute, write-backs waited two hops
    later) but its x3-unrolled loop pads the hop count to a multiple of
    3 with park-tile replays; at production path lengths (~3-6 hops at
    gumbel@64 / puct@400 self-play) the surplus hops cost more than the
    overlap buys: end-to-end device A/B measured 506.8 (pipeline) vs
    ~536 (serial) moves/s on bench config #3 and 3357.9 vs 3626.3 on
    config #6 (round 4, runs/bench_r4_probe.log).  It was DELETED in
    round 5 (VERDICT #7): two rounds produced no workload where it wins,
    and keeping ~1k lines bit-exact in two variants is pure maintenance
    surface.  The Mosaic lessons it taught (unconditional DMAs only,
    Python-constant VMEM offsets, 2 KB sflag budget) live on in
    DECISIONS round 4 and tests/test_mosaic_lowering.py; the code is in
    git history (commit ac8449e and ancestors) if a long-walk workload
    ever materializes.
    """
    s = layout.seg
    b = rows_vmem.shape[0]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP, 1), 1)
    sub_n = (iota_sub == SL_N).astype(jnp.float32)
    sub_w = (iota_sub == SL_W).astype(jnp.float32)
    sub_p = (iota_sub == SL_P).astype(jnp.float32)
    sub_c = (iota_sub == SL_C).astype(jnp.float32)
    sub_m = (iota_sub == SL_META).astype(jnp.float32)

    plen = plen_ref[:]          # [B, 1] i32
    values = values_ref[:]      # [B, 1] f32
    expanding = expanding_ref[:] == 1
    slot = slot_ref[0, 0]
    max_len = jnp.max(plen)
    lane0 = pl.program_id(0) * b  # absolute lane of this tile's first row

    # ---- compose the fresh slot tile in VMEM ---------------------------
    # Writing it here (instead of an XLA dynamic-update-slice in the scan
    # body) keeps the packed tree untouched by any XLA op between the
    # custom-calls: XLA's layout assignment otherwise puts the row
    # compose/update cluster in a node-major layout and inserts a
    # full-tree relayout copy PER SIMULATION — measured 0.37 ms/sim at
    # 64x408x1152, >30% of the whole simulation (round-3 device trace).
    # In the node-as-group layout nothing shares the slot's tile, so in
    # "backup"/"vl" mode (fresh slot: zero stats, children -1 from the
    # per-move init) the compose is a PURE WRITE — no read DMA.  In
    # "finalize" mode later vl sims of the same macro step may already
    # have visited/expanded the slot node, so N/W/C are preserved via a
    # read-modify-write.  Orphan (non-expanding) lanes get the tile too,
    # matching the XLA glue's unconditional write — nothing links to them.
    n_max = layout.n_nodes - 1
    sg = _group_base(slot, n_max)

    iota_col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    col0 = (iota_col == 0).astype(jnp.float32)
    col1 = (iota_col == 1).astype(jnp.float32)
    dn = done_ref[:]                                     # [B, 1]
    meta3 = dn[:, :, None] * col0 + values[:, :, None] * col1   # [B,1,S]
    pri3 = priors_ref[:][:, None, :]                     # [B, 1, S]

    if mode == "finalize":
        def cstart(k, _):
            pltpu.make_async_copy(
                packed_out.at[lane0 + k, pl.ds(sg, GROUP), :],
                rows_vmem.at[k], sems.at[k],
            ).start()
            return 0
        jax.lax.fori_loop(0, b, cstart, 0)

        def cwait(k, _):
            pltpu.make_async_copy(
                packed_out.at[lane0 + k, pl.ds(sg, GROUP), :],
                rows_vmem.at[k], sems.at[k],
            ).wait()
            return 0
        jax.lax.fori_loop(0, b, cwait, 0)
        groups0 = rows_vmem[:]
        keep = 1.0 - sub_p - sub_m
        rows_vmem[:] = groups0 * keep + sub_p * pri3 + sub_m * meta3
    else:
        rows_vmem[:] = sub_p * pri3 + sub_c * (-1.0) + sub_m * meta3

    def cwb_start(k, _):
        pltpu.make_async_copy(
            rows_vmem.at[k], packed_out.at[lane0 + k, pl.ds(sg, GROUP), :],
            sems.at[k],
        ).start()
        return 0
    jax.lax.fori_loop(0, b, cwb_start, 0)

    def cwb_wait(k, _):
        pltpu.make_async_copy(
            rows_vmem.at[k], packed_out.at[lane0 + k, pl.ds(sg, GROUP), :],
            sems.at[k],
        ).wait()
        return 0
    jax.lax.fori_loop(0, b, cwb_wait, 0)

    def cond(carry):
        return carry < max_len

    def body(i):
        # stage this hop's per-lane node indices as a [B, 1] column: scalar
        # VMEM reads need a static lane index (dynamic lane offsets are not
        # addressable), so the DMA loops read hopnodes_vmem[k, 0]
        hop_nodes = jnp.reshape(pnodes_ref[pl.ds(i, 1), :], (b, 1))
        hopnodes_vmem[:] = jnp.maximum(hop_nodes, 0)

        def start(k, _):
            g = _group_base(hopnodes_vmem[k, 0], n_max)
            pltpu.make_async_copy(
                packed_out.at[lane0 + k, pl.ds(g, GROUP), :], rows_vmem.at[k],
                sems.at[k],
            ).start()
            return 0
        jax.lax.fori_loop(0, b, start, 0)

        def wait(k, _):
            g = _group_base(hopnodes_vmem[k, 0], n_max)
            pltpu.make_async_copy(
                packed_out.at[lane0 + k, pl.ds(g, GROUP), :], rows_vmem.at[k],
                sems.at[k],
            ).wait()
            return 0
        jax.lax.fori_loop(0, b, wait, 0)

        groups = rows_vmem[:]   # [B, GROUP, seg]
        acts = jnp.reshape(pacts_ref[pl.ds(i, 1), :], (b, 1))
        active_f = (i < plen).astype(jnp.float32)       # [B, 1]
        # masks as f32 throughout: Mosaic cannot broadcast i1 vectors into
        # a new minor dim, 32-bit types only
        onehot_f = (iota_s == acts).astype(jnp.float32) * active_f  # [B, S]
        oh3 = onehot_f[:, None, :]                      # [B, 1, S]

        # v at edge i (0 = root edge) is value * (-1)^(L - i): the leaf sits
        # L hops below, and perspective flips once per hop up
        # (tree._apply_eval_and_backup)
        parity = jnp.bitwise_and(plen - i, 1) == 1
        v = jnp.where(parity, -values, values)          # [B, 1]
        v3 = v[:, :, None]                              # [B, 1, 1]

        if mode == "backup":       # one-shot backup: N+1, W += v_flipped
            delta = oh3 * (sub_n + sub_w * v3)
        elif mode == "vl":         # virtual loss: N+1, W-1, NO flip
            delta = oh3 * (sub_n - sub_w)
        elif mode == "finalize":   # replace VL: W += v_flipped + 1, N as-is
            delta = oh3 * (sub_w * (v3 + 1.0))
        else:
            raise ValueError(f"unknown backup mode: {mode!r}")
        new = groups + delta

        # expansion edge (the path's last hop of an expanding lane) links
        # the fresh slot into the children sublane
        is_exp_f = (jnp.logical_and(expanding, i == plen - 1)
                    .astype(jnp.float32))               # [B, 1]
        set_c = oh3 * sub_c * is_exp_f[:, :, None]
        new = jnp.where(set_c > 0.5, slot.astype(jnp.float32), new)
        rows_vmem[:] = new

        def wstart(k, _):
            g = _group_base(hopnodes_vmem[k, 0], n_max)
            pltpu.make_async_copy(
                rows_vmem.at[k], packed_out.at[lane0 + k, pl.ds(g, GROUP), :],
                sems.at[k],
            ).start()
            return 0
        jax.lax.fori_loop(0, b, wstart, 0)

        def wwait(k, _):
            g = _group_base(hopnodes_vmem[k, 0], n_max)
            pltpu.make_async_copy(
                rows_vmem.at[k], packed_out.at[lane0 + k, pl.ds(g, GROUP), :],
                sems.at[k],
            ).wait()
            return 0
        jax.lax.fori_loop(0, b, wwait, 0)
        return i + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))



@functools.partial(jax.jit, static_argnames=("layout", "interpret",
                                             "mode"))
def backup_paths(packed: jax.Array, path_nodes: jax.Array,
                 path_actions: jax.Array, path_len: jax.Array,
                 values: jax.Array, expanding: jax.Array, slot: jax.Array,
                 layout: PackedLayout,
                 signed_priors: jax.Array, done: jax.Array,
                 interpret: bool = False, mode: str = "backup"
                 ) -> jax.Array:
    """Write the fresh slot tile, then apply one simulation's backup.

    In-place on ``packed`` (aliased); returns the updated array.  ``slot``
    (i32 scalar, traced) is the node index expanded this simulation
    (lane-uniform by construction); its tile receives ``signed_priors``
    ([B, A] — padded to the segment width here) and the ``done`` flag
    ([B]) — stats stay at the pre-move init (zero N/W, children -1).
    Lanes with ``expanding[b] == 0`` stopped on a terminal or depth-capped
    node and only receive N/W updates along their path.

    ``mode`` selects the k-leaves-per-sim phase (tree._select_expand_vl /
    _finalize_leaf semantics):
      - "backup": the one-shot k=1 path — N+1, W += v_flipped per edge.
      - "vl": virtual loss — N+1, W-1 per edge with NO perspective flip
        (``values`` unused); ``signed_priors`` should be the uniform
        placeholder; composes the slot tile and links the child so the
        next select can descend through it.
      - "finalize": W += v_flipped + 1 per edge (cancels the virtual
        loss), N untouched; re-composes the slot tile with the REAL priors
        while preserving N/W/C accumulated by later vl sims of the same
        macro step.
    """
    b = packed.shape[0]
    tile, n_tiles = _lane_tiling(b)
    a = signed_priors.shape[-1]
    s = layout.seg
    if a < s:
        # pad the prior segment to the tile width; pad cols read as
        # illegal (-1) and are never consumed by the walk kernels
        signed_priors = jnp.pad(signed_priors, ((0, 0), (0, s - a)),
                                constant_values=-1.0)
    return _backup_paths_serial(packed, path_nodes, path_actions,
                                path_len, values, expanding, slot,
                                layout, signed_priors, done,
                                interpret, mode, tile, n_tiles)


def _backup_paths_serial(packed, path_nodes, path_actions, path_len,
                         values, expanding, slot, layout, signed_priors,
                         done, interpret, mode, tile, n_tiles):
    """Serial-hop pallas_call (round-3 kernel; see _backup_kernel_serial)."""
    b = packed.shape[0]
    d = path_nodes.shape[0]
    s = layout.seg
    kernel = functools.partial(_backup_kernel_serial, layout, mode)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # packed (aliased)
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),   # path nodes
            pl.BlockSpec((d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),   # path actions
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # path len
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # values
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # expanding
            pl.BlockSpec((tile, s), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # slot-tile priors
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),   # slot-tile done flag
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),   # slot
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, GROUP, layout.seg), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(tile, layout.seg)),
        interpret=interpret,
    )(packed, path_nodes, path_actions,
      path_len.reshape(b, 1).astype(jnp.int32),
      values.reshape(b, 1).astype(jnp.float32),
      expanding.reshape(b, 1).astype(jnp.int32),
      signed_priors.astype(jnp.float32),
      done.reshape(b, 1).astype(jnp.float32),
      jnp.asarray(slot, jnp.int32).reshape(1, 1))
