"""Training losses matching the reference's formulas.

Reference (``/root/reference/network.py:163,199-224``):
  - policy: ``nn.KLDivLoss(reduction='batchmean')`` between log-softmax of the
    logits and the MCTS visit distribution — i.e.
    ``mean_B( sum_A t * (log t - log p) )`` with the ``0 * log 0 := 0``
    convention.
  - value: MSE between tanh value output [B, 1] and outcome z in {-1, 0, 1}.
  - total = policy + value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def policy_kl(logits: jnp.ndarray, target_pi: jnp.ndarray) -> jnp.ndarray:
    """KL(target || softmax(logits)), batch-mean; target may contain zeros."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_t = jnp.where(target_pi > 0, target_pi, 1.0)
    tlogt = jnp.where(target_pi > 0, target_pi * jnp.log(safe_t), 0.0)
    per_example = jnp.sum(tlogt - target_pi * logp, axis=-1)
    return jnp.mean(per_example)


def value_mse(value: jnp.ndarray, target_z: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((value - target_z) ** 2)


def alphazero_loss(logits, value, target_pi, target_z,
                   value_loss_weight: float = 1.0):
    """Reference total is ``policy + value`` (weight 1.0,
    ``network.py:220-224``); ``value_loss_weight`` scales the MSE term as a
    collapse-mitigation knob (weight < 1 slows value-head saturation)."""
    pl = policy_kl(logits, target_pi)
    vl = value_mse(value, target_z)
    total = pl + value_loss_weight * vl
    return total, {"policy_loss": pl, "value_loss": vl, "total_loss": total}
