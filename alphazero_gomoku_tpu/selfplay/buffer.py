"""Replay buffer: preallocated host-side ring storage + persistence.

Equivalent of the reference's ``deque``-of-tuples buffer and its pickle
persistence (``/root/reference/train.py:272-354``), re-designed for array
throughput: samples live in contiguous NumPy arrays (states NHWC float32,
policies, outcomes), insertion is vectorized ring-write, sampling gathers a
batch in one fancy-index.  Persistence uses ``np.savez_compressed`` with the
same degrade-to-fresh-state semantics on load failure and the same
capacity-mismatch warning.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class ReplayBuffer:
    """Uniform-sampling ring buffer of (state, pi, z) training samples."""

    def __init__(self, capacity: int = 20000, board_size: int = 15,
                 channels: int = 3):
        self.capacity = int(capacity)
        self.board_size = board_size
        self.channels = channels
        a = board_size * board_size
        self.states = np.zeros(
            (self.capacity, board_size, board_size, channels), np.float32
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
        """Uniform sample without replacement (reference ``random.sample``)."""
        rng = rng or np.random.default_rng()
        idx = rng.choice(self._size, size=batch_size, replace=False)
        return (
            self.states[idx],
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
        )
        # np.savez appends .npz when missing; our tmp already ends with it
        os.replace(tmp, filepath)
        print(f"[Buffer] saved: {filepath} ({len(buffer)} samples)")
        return True
    except Exception as e:  # degrade, don't crash training
        print(f"[Buffer] save failed: {e}")
        return False


def load_replay_buffer(filepath: str, capacity: int,
                       board_size: int = 15) -> Optional[ReplayBuffer]:
    if not os.path.exists(filepath):
        print(f"[Buffer] no saved buffer at: {filepath}")
        return None
    try:
        with np.load(filepath) as data:
            saved_cap = int(data["capacity"])
            if saved_cap != capacity:
                print(f"[Buffer] warning: saved capacity ({saved_cap}) != "
                      f"configured ({capacity})")
            buf = ReplayBuffer(capacity=capacity, board_size=board_size,
                               channels=data["states"].shape[-1])
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
    The mirror keeps the ring arrays in HBM (~430 MB at capacity 120k),
    ships only each iteration's NEW samples (`sync` after
    ``ReplayBuffer.add``), and the epoch gathers batches on device from
    a tiny [steps, batch] index array.

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
        """Write this iteration's new samples at their ring positions."""
        if len(positions) == 0:
            return
        import jax
        import jax.numpy as jnp

        def put(x, dtype=None):
            arr = jnp.asarray(x, dtype)
            return jax.device_put(arr, self.sharding) \
                if self.sharding is not None else arr

        pos = put(positions)
        self.states = self.states.at[pos].set(put(states))
        self.pis = self.pis.at[pos].set(put(pis))
        self.zs = self.zs.at[pos].set(put(zs, self.zs.dtype))
