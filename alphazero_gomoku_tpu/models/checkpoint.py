"""Checkpoint save/load for parameter/optimizer pytrees.

The reference persists net + optimizer + board metadata per snapshot with
``torch.save`` (``/root/reference/network.py:240-258``).  Here checkpoints are
a msgpack blob (via ``flax.serialization``) of numpy-ified pytrees plus a JSON
metadata header, written atomically.  Restore requires a structural template
(a freshly initialized model), mirroring the reference's load-into-existing-
model flow.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization

_MAGIC = b"AZTPU1\n"


def _to_numpy(tree):
    # jax.device_get first: ONE batched device->host transfer for the
    # whole pytree instead of one per-leaf fetch (60+ round-trips over
    # the ~1 s-latency axon tunnel for the 6x128 net); the tree_map then
    # only normalizes non-array leaves.
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save_checkpoint(path: str, tree: Any, metadata: Dict[str, Any]) -> None:
    """Atomically write ``tree`` (+ JSON-able ``metadata``) to ``path``."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy(tree))
    )
    meta = json.dumps(metadata).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta)))
        f.write(meta)
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Read a checkpoint; ``template`` supplies the pytree structure."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an alphazero_gomoku_tpu checkpoint")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        metadata = json.loads(f.read(meta_len).decode("utf-8"))
        blob = f.read()
    state = serialization.msgpack_restore(blob)
    tree = serialization.from_state_dict(template, state)
    return tree, metadata


def peek_metadata(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f"{path}: not an alphazero_gomoku_tpu checkpoint")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(meta_len).decode("utf-8"))
