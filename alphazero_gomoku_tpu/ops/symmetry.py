"""Dihedral (8-fold) symmetry augmentation for square-board samples.

Matches the reference augmenter (``/root/reference/mcts/new_mcts_alpha.py:42-56``):
for k in 0..3 rotations, emit (rot_k(state), rot_k(pi)) and the horizontal
flip of each.  Provided both as NumPy (host collection path) and JAX (device
batched path) implementations; layouts are NHWC-style ``[..., H, W, C]`` for
states and flat ``[H*W]`` policies.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def expand_symmetries_np(state_hwc: np.ndarray, pi: np.ndarray):
    """8 dihedral variants of one sample.

    Args:
        state_hwc: [H, W, C] encoded observation.
        pi: [H*W] policy vector.

    Returns:
        list of (state_hwc, pi) pairs, length 8.
    """
    size = state_hwc.shape[0]
    pi_board = pi.reshape(size, size)
    out = []
    for k in range(4):
        s_rot = np.rot90(state_hwc, k, axes=(0, 1))
        p_rot = np.rot90(pi_board, k)
        out.append((np.ascontiguousarray(s_rot),
                    np.ascontiguousarray(p_rot.reshape(-1))))
        s_flip = np.flip(s_rot, axis=1)
        p_flip = np.flip(p_rot, axis=1)
        out.append((np.ascontiguousarray(s_flip),
                    np.ascontiguousarray(p_flip.reshape(-1))))
    return out


def expand_symmetries_batch_np(states: np.ndarray, pis: np.ndarray):
    """Vectorized 8-fold expansion of a batch.

    Args:
        states: [N, H, W, C]; pis: [N, H*W]

    Returns:
        (states8 [8N, H, W, C], pis8 [8N, H*W]) — variant-major ordering.
    """
    size = states.shape[1]
    pib = pis.reshape(-1, size, size)
    ss, pp = [], []
    for k in range(4):
        s_rot = np.rot90(states, k, axes=(1, 2))
        p_rot = np.rot90(pib, k, axes=(1, 2))
        ss.append(s_rot)
        pp.append(p_rot)
        ss.append(np.flip(s_rot, axis=2))
        pp.append(np.flip(p_rot, axis=2))
    states8 = np.ascontiguousarray(np.concatenate(ss, axis=0))
    pis8 = np.ascontiguousarray(
        np.concatenate(pp, axis=0).reshape(-1, size * size)
    )
    return states8, pis8


def expand_symmetries_jax(states: jnp.ndarray, pis: jnp.ndarray):
    """Device-side 8-fold expansion: [N,H,W,C],[N,A] -> [8N,...]."""
    size = states.shape[1]
    pib = pis.reshape(-1, size, size)
    ss, pp = [], []
    for k in range(4):
        s_rot = jnp.rot90(states, k, axes=(1, 2))
        p_rot = jnp.rot90(pib, k, axes=(1, 2))
        ss += [s_rot, jnp.flip(s_rot, axis=2)]
        pp += [p_rot, jnp.flip(p_rot, axis=2)]
    return (
        jnp.concatenate(ss, axis=0),
        jnp.concatenate(pp, axis=0).reshape(-1, size * size),
    )
