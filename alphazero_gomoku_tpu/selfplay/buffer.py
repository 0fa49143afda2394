"""Replay buffer: preallocated host-side ring storage + persistence.

Equivalent of the reference's ``deque``-of-tuples buffer and its pickle
persistence (``/root/reference/train.py:272-354``), re-designed for array
throughput: samples live in contiguous NumPy arrays, insertion is
vectorized ring-write, sampling gathers a batch in one fancy-index.
Persistence uses ``np.savez_compressed`` with the same
degrade-to-fresh-state semantics on load failure and the same
capacity-mismatch warning.

States are stored as ``uint8`` with a small integer scale PER CHANNEL
(``u = round(x * scale)``) and decoded by one f32 multiply
(``x = u * (1/scale)``).  The scales come from the game's encoding
contract (``env.obs_plane_scales``): binary stone/colour planes use
scale 1 (stored as 0/1 verbatim) and the Pente captured-pair planes
(values k/5) use scale 5 (stored as k).  Both directions are BIT-EXACT:
``k * f32(0.2) == f32(k / 5)`` for every k ≤ 5 — pinned by
``tests/test_selfplay.py::test_buffer_uint8_roundtrip_is_exact`` — and
a single IEEE multiply is reproducible across numpy, XLA:CPU and
XLA:TPU (a *division* by the scale is NOT: XLA strength-reduces
divide-by-constant non-correctly-rounded, measured 126/256 values off
by 1 ulp on CPU).  The uint8 ring cuts host RAM, the device-mirror HBM
footprint, the per-iteration host->device sync, and the compressed save
size 4x (the production 160k x 15 x 15 x 5 ring: 720 MB -> 180 MB).
Inputs outside [0, 255/scale] are clipped — the storage contract is
"encoded observation planes", not arbitrary floats.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import numpy as np

ScaleLike = Union[Sequence[float], np.ndarray, None]


_SCATTER_RINGS = None


def _scatter_rings(states_ring, pis_ring, zs_ring, pos, s_new, p_new,
                   z_new):
    """One jitted donate-in-place scatter over all three ring arrays.

    Module-level so every :class:`DeviceBufferMirror` shares one compile
    cache (keyed by bucket shape); jax is imported lazily to keep the
    host-only buffer path import-light."""
    global _SCATTER_RINGS
    if _SCATTER_RINGS is None:
        import functools

        import jax

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def scatter(sr, pr, zr, pos, s, p, z):
            return (sr.at[pos].set(s), pr.at[pos].set(p),
                    zr.at[pos].set(z))

        _SCATTER_RINGS = scatter
    return _SCATTER_RINGS(states_ring, pis_ring, zs_ring, pos, s_new,
                          p_new, z_new)


def _scales_array(channel_scales: ScaleLike, channels: int) -> np.ndarray:
    if channel_scales is None:
        return np.ones((channels,), np.float32)
    s = np.asarray(channel_scales, np.float32)
    if s.shape != (channels,):
        raise ValueError(
            f"channel_scales shape {s.shape} != ({channels},)")
    return s


def encode_states_u8(states: np.ndarray,
                     channel_scales: ScaleLike = None) -> np.ndarray:
    """f32 observation planes -> uint8 ring storage (exact, see module)."""
    if states.dtype == np.uint8:
        return states
    s = _scales_array(channel_scales, states.shape[-1])
    return np.clip(np.round(states.astype(np.float32) * s),
                   0.0, 255.0).astype(np.uint8)


def inv_scales_f32(channel_scales: ScaleLike, channels: int) -> np.ndarray:
    """The decode multipliers ``f32(1/scale)`` (1/5 -> exactly f32(0.2))."""
    return np.float32(1.0) / _scales_array(channel_scales, channels)


def decode_states_f32(states_u8: np.ndarray,
                      inv_scales: np.ndarray) -> np.ndarray:
    """uint8 ring storage -> f32 planes (one correctly-rounded multiply)."""
    if states_u8.dtype != np.uint8:
        return states_u8
    return states_u8.astype(np.float32) * inv_scales


class ReplayBuffer:
    """Uniform-sampling ring buffer of (state, pi, z) training samples."""

    def __init__(self, capacity: int = 20000, board_size: int = 15,
                 channels: int = 3, channel_scales: ScaleLike = None):
        self.capacity = int(capacity)
        self.board_size = board_size
        self.channels = channels
        self.channel_scales = _scales_array(channel_scales, channels)
        self.inv_scales = inv_scales_f32(self.channel_scales, channels)
        a = board_size * board_size
        self.states = np.zeros(
            (self.capacity, board_size, board_size, channels), np.uint8
        )
        self.pis = np.zeros((self.capacity, a), np.float32)
        self.zs = np.zeros((self.capacity,), np.float32)
        self._write = 0
        self._size = 0

    # ------------------------------------------------------------------
    def add(self, states: np.ndarray, pis: np.ndarray, zs: np.ndarray
            ) -> np.ndarray:
        """Vectorized ring insert of N samples (newest overwrite oldest).

        Returns the ring positions written (for device-mirror sync)."""
        n = len(zs)
        if n == 0:
            return np.zeros((0,), np.int64)
        states = encode_states_u8(np.asarray(states), self.channel_scales)
        if n >= self.capacity:
            # only the newest `capacity` samples survive
            keep = slice(n - self.capacity, n)
            self.states[:] = states[keep]
            self.pis[:] = pis[keep]
            self.zs[:] = zs[keep]
            self._write = 0
            self._size = self.capacity
            return np.arange(self.capacity)
        idx = (self._write + np.arange(n)) % self.capacity
        self.states[idx] = states
        self.pis[idx] = pis
        self.zs[idx] = zs
        self._write = int((self._write + n) % self.capacity)
        self._size = int(min(self._size + n, self.capacity))
        return idx

    def sample(self, batch_size: int, rng: Optional[np.random.Generator] = None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Uniform sample without replacement (reference ``random.sample``).

        Falls back to sampling WITH replacement when the buffer holds
        fewer than ``batch_size`` samples — the per-host replay path can
        legitimately ask a short local shard for its share of a global
        batch whose global gate already passed.
        """
        if self._size == 0:
            raise ValueError(
                "sample() on an empty replay buffer — in per-host replay "
                "mode gate training on min_local_buffer_len (see "
                "selfplay/loop.py) so no host samples an empty shard")
        rng = rng or np.random.default_rng()
        idx = rng.choice(self._size, size=batch_size,
                         replace=self._size < batch_size)
        return (
            decode_states_f32(self.states[idx], self.inv_scales),
            self.pis[idx],
            self.zs[idx].reshape(-1, 1),
        )

    def sample_many(self, n_batches: int, batch_size: int,
                    rng: Optional[np.random.Generator] = None):
        """Stack ``n_batches`` independent samples: [n, b, ...] arrays."""
        rng = rng or np.random.default_rng()
        outs = [self.sample(batch_size, rng) for _ in range(n_batches)]
        return (
            np.stack([o[0] for o in outs]),
            np.stack([o[1] for o in outs]),
            np.stack([o[2] for o in outs]),
        )

    def __len__(self) -> int:
        return self._size


# ----------------------------------------------------------------------
# persistence (reference train.py:299-354 semantics)
# ----------------------------------------------------------------------
def save_replay_buffer(buffer: ReplayBuffer, filepath: str) -> bool:
    try:
        os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
        order = (np.arange(len(buffer)) + (
            buffer._write - len(buffer))) % buffer.capacity
        tmp = filepath + ".tmp.npz"
        np.savez_compressed(
            tmp,
            states=buffer.states[order],
            pis=buffer.pis[order],
            zs=buffer.zs[order],
            capacity=np.int64(buffer.capacity),
            channel_scales=buffer.channel_scales,
        )
        # np.savez appends .npz when missing; our tmp already ends with it
        os.replace(tmp, filepath)
        print(f"[Buffer] saved: {filepath} ({len(buffer)} samples)")
        return True
    except Exception as e:  # degrade, don't crash training
        print(f"[Buffer] save failed: {e}")
        return False


def load_replay_buffer(filepath: str, capacity: int,
                       board_size: int = 15,
                       channel_scales: ScaleLike = None
                       ) -> Optional[ReplayBuffer]:
    """``channel_scales`` is the caller's (env's) encoding contract; a
    scale vector stored in the file wins (uint8-format saves carry it —
    legacy f32 saves don't, and re-encode with the caller's on add)."""
    if not os.path.exists(filepath):
        print(f"[Buffer] no saved buffer at: {filepath}")
        return None
    try:
        with np.load(filepath) as data:
            saved_cap = int(data["capacity"])
            if saved_cap != capacity:
                print(f"[Buffer] warning: saved capacity ({saved_cap}) != "
                      f"configured ({capacity})")
            if "channel_scales" in data:
                channel_scales = data["channel_scales"]
            buf = ReplayBuffer(capacity=capacity, board_size=board_size,
                               channels=data["states"].shape[-1],
                               channel_scales=channel_scales)
            buf.add(data["states"], data["pis"], data["zs"])
        print(f"[Buffer] loaded: {filepath} ({len(buf)} samples)")
        return buf
    except Exception as e:
        print(f"[Buffer] load failed: {e}")
        return None


class DeviceBufferMirror:
    """Device-resident mirror of a :class:`ReplayBuffer`'s ring arrays.

    Motivation (measured, round 4): the host-side epoch path ships the
    full pre-sampled batch stack — ``steps × batch`` samples, ~1 GB at
    the production config — through the host↔device link every
    iteration, and the train phase is link-bound, not compute-bound.
    The mirror keeps the ring arrays in HBM, ships only each iteration's
    NEW samples (`sync` after ``ReplayBuffer.add``), and the epoch
    gathers batches on device from a tiny [steps, batch] index array.
    States ride as uint8 (the ring's storage encoding) and are decoded
    to f32 inside the gather epoch after the per-batch gather — both the
    HBM ring and the per-iteration sync move 4x less than f32.

    Sampling semantics are unchanged: callers draw the same
    without-replacement numpy index batches as the host path and pass
    them in, so the two paths are bit-identical given the same RNG
    stream (tests/test_device_buffer.py).
    """

    def __init__(self, buffer: ReplayBuffer, sharding=None):
        """``sharding`` (e.g. a replicated NamedSharding over a mesh) pins
        the ring arrays' placement so the sharded gather epoch does not
        re-broadcast them on every call; None = default single device."""
        import jax
        import jax.numpy as jnp

        self.capacity = buffer.capacity
        self.sharding = sharding
        self.channel_scales = buffer.channel_scales
        # decode multipliers for the gather epoch ([C] f32 on device)
        self.inv_scales = jnp.asarray(buffer.inv_scales)
        if sharding is not None:
            self.inv_scales = jax.device_put(self.inv_scales, sharding)

        def place(x):
            arr = jnp.asarray(x)
            return jax.device_put(arr, sharding) if sharding is not None \
                else arr

        if len(buffer):
            # resume case: seed from the loaded host buffer (one-time ship)
            self.states = place(buffer.states)
            self.pis = place(buffer.pis)
            self.zs = place(buffer.zs)
        else:
            self.states = place(np.zeros_like(buffer.states))
            self.pis = place(np.zeros_like(buffer.pis))
            self.zs = place(np.zeros_like(buffer.zs))

    def sync(self, states: np.ndarray, pis: np.ndarray, zs: np.ndarray,
             positions: np.ndarray) -> None:
        """Write this iteration's new samples at their ring positions.

        One host->device shipment + ONE jitted scatter call: the previous
        eager form (per-array ``device_put`` + three ``.at[].set``) was
        ~7 dispatches, and over the ~1 s/dispatch axon tunnel the buffer
        phase (7.3 s) had overtaken self-play itself (3.8 s) at gumbel
        speeds.  The sample count varies per iteration, so inputs are
        padded to a power-of-two bucket with duplicate writes of row 0
        (same value at the same position — scatter order is immaterial)
        to keep one compiled program per bucket instead of one per shape.

        The 4096 floor pins the common case to ONE compiled bucket: a
        production iteration lands 1-3k samples (e.g. 128 games x ~20
        recorded plies x 8 symmetries / PCR thinning), which would
        otherwise bounce between 1024/2048/4096 buckets and recompile
        the scatter for each.  The padding cost is ~5.5 MB on the link
        per call — noise next to the shipment itself — and tiny-config
        runs (tests, CPU smoke) compile once and stay cheap.
        """
        n = len(positions)
        if n == 0:
            return
        import jax

        bucket = max(4096, 1 << (n - 1).bit_length())
        pad = bucket - n

        def padded(x, dtype):
            arr = np.asarray(x, dtype)
            if pad == 0:
                return arr
            return np.concatenate(
                [arr, np.broadcast_to(arr[:1], (pad,) + arr.shape[1:])])

        enc = encode_states_u8(np.asarray(states), self.channel_scales)
        host = (padded(positions, np.int32), padded(enc, np.uint8),
                padded(pis, np.float32), padded(zs, self.zs.dtype))
        dev = jax.device_put(host, self.sharding) \
            if self.sharding is not None else jax.device_put(host)
        self.states, self.pis, self.zs = _scatter_rings(
            self.states, self.pis, self.zs, *dev)
