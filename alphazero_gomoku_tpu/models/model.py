"""Host-side model wrapper mirroring the reference's ``PyTorchModel`` surface.

Reference surface (``/root/reference/network.py:132-265``):
  - ``predict(encoded_states[B,C,H,W]) -> (probs[B,A], values[B,1])``
  - ``predict_batch(list_of_states)``
  - ``train_batch(states, pis, zs, epochs) -> loss dict``
  - ``save(path)`` / ``load(path)`` (net + optimizer + board metadata)
  - ``make_batch_from_states``

TPU-native internals: explicit param/batch-stat pytrees, optax optimizer
chain replicating torch ``Adam(lr, weight_decay)`` + ``clip_grad_norm_(3.0)``
(``network.py:161,223``) — clip, then L2-into-gradient, then Adam moments —
and jitted forward/train steps.  The public array convention stays NCHW
(reference-compatible); NHWC is used on device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from alphazero_gomoku_tpu.models import checkpoint as ckpt
from alphazero_gomoku_tpu.models.losses import alphazero_loss
from alphazero_gomoku_tpu.models.resnet import NetConfig, apply, init_variables

DEFAULT_LR = 1e-3
DEFAULT_WEIGHT_DECAY = 1e-4
GRAD_CLIP_NORM = 3.0


def make_optimizer(lr: float = DEFAULT_LR,
                   weight_decay: float = DEFAULT_WEIGHT_DECAY):
    """optax chain equivalent to the reference's optimizer semantics."""
    return optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP_NORM),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


@functools.partial(jax.jit, static_argnums=(0,))
def predict_fn(cfg: NetConfig, params, batch_stats, x_nhwc):
    """Eval-mode forward: (softmax probs [B, A], values [B, 1])."""
    (logits, value), _ = apply(cfg, params, batch_stats, x_nhwc, train=False)
    return jax.nn.softmax(logits, axis=-1), value


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def train_step_fn(cfg: NetConfig, tx, params, batch_stats, opt_state,
                  x_nhwc, target_pi, target_z,
                  value_loss_weight: float = 1.0):
    """One optimizer step on one batch. Returns new state + loss metrics."""

    def loss_fn(p):
        (logits, value), new_stats = apply(cfg, p, batch_stats, x_nhwc,
                                           train=True)
        loss, metrics = alphazero_loss(logits, value, target_pi, target_z,
                                       value_loss_weight)
        return loss, (new_stats, metrics)

    grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(params)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_stats, new_opt_state, metrics


class AZModel:
    """Parameter container + host API. All heavy work happens in jit."""

    def __init__(
        self,
        board_size: int = 15,
        action_size: Optional[int] = None,
        n_res_blocks: int = 3,
        channels: int = 64,
        lr: float = DEFAULT_LR,
        weight_decay: float = DEFAULT_WEIGHT_DECAY,
        seed: int = 0,
        compute_dtype=jnp.float32,
        in_channels: int = 3,
    ):
        self.board_size = board_size
        self.action_size = action_size or board_size * board_size
        self.cfg = NetConfig(
            board_size=board_size,
            action_size=self.action_size,
            n_res_blocks=n_res_blocks,
            channels=channels,
            compute_dtype=compute_dtype,
            in_channels=in_channels,
        )
        variables = init_variables(jax.random.PRNGKey(seed), self.cfg)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.lr = lr
        self.weight_decay = weight_decay
        self.tx = make_optimizer(lr, weight_decay)
        self.opt_state = self.tx.init(self.params)

    # -- prediction ------------------------------------------------------
    def predict(self, encoded_states: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """encoded_states: float32 [B, 3, H, W] (reference NCHW convention)."""
        x = jnp.asarray(encoded_states, jnp.float32).transpose(0, 2, 3, 1)
        probs, values = predict_fn(self.cfg, self.params, self.batch_stats, x)
        return np.asarray(probs), np.asarray(values)

    def predict_batch(self, states_list: List[np.ndarray]):
        return self.predict(self.make_batch_from_states(states_list))

    # -- training --------------------------------------------------------
    def train_batch(self, states: np.ndarray, target_pis: np.ndarray,
                    target_vs: np.ndarray, epochs: int = 1) -> Dict[str, float]:
        x = jnp.asarray(states, jnp.float32).transpose(0, 2, 3, 1)
        pis = jnp.asarray(target_pis, jnp.float32)
        zs = jnp.asarray(target_vs, jnp.float32).reshape(-1, 1)
        totals = {"policy_loss": 0.0, "value_loss": 0.0, "total_loss": 0.0}
        for _ in range(epochs):
            (self.params, self.batch_stats, self.opt_state, metrics) = (
                train_step_fn(self.cfg, self.tx, self.params,
                              self.batch_stats, self.opt_state, x, pis, zs)
            )
            for k in totals:
                totals[k] += float(metrics[k])
        return {k: v / float(epochs) for k, v in totals.items()}

    # -- persistence -----------------------------------------------------
    def save(self, path: str) -> None:
        tree = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
        }
        meta = {
            "board_size": self.board_size,
            "action_size": self.action_size,
            "n_res_blocks": self.cfg.n_res_blocks,
            "channels": self.cfg.channels,
            "in_channels": self.cfg.in_channels,
        }
        ckpt.save_checkpoint(path, tree, meta)

    def load(self, path: str, map_location=None) -> None:
        template = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
        }
        meta_only = ckpt.peek_metadata(path)
        for field, mine in (("board_size", self.board_size),
                            ("n_res_blocks", self.cfg.n_res_blocks),
                            ("channels", self.cfg.channels),
                            ("in_channels", self.cfg.in_channels)):
            theirs = meta_only.get(field)
            if theirs is not None and theirs != mine:
                raise ValueError(
                    f"checkpoint {field}={theirs} != model {field}={mine} "
                    f"(construct AZModel with the checkpoint's architecture, "
                    f"or use AZModel.from_checkpoint)"
                )
        tree, meta = ckpt.load_checkpoint(path, template)
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.opt_state = tree["opt_state"]

    # -- helpers ---------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, **overrides) -> "AZModel":
        """Construct a model sized from the checkpoint's own metadata.

        Reference torch snapshots (``.pt``/``.pth``) are detected and
        imported one-way (``models/torch_import.py``); native checkpoints
        load via their AZTPU1 metadata header.
        """
        from alphazero_gomoku_tpu.models.torch_import import (
            _is_torch_file, import_torch_checkpoint,
        )
        if _is_torch_file(path):
            return import_torch_checkpoint(path)
        meta = ckpt.peek_metadata(path)
        kwargs = dict(
            board_size=meta.get("board_size", 15),
            n_res_blocks=meta.get("n_res_blocks", 3),
            channels=meta.get("channels", 64),
            in_channels=meta.get("in_channels", 3),
        )
        kwargs.update(overrides)
        model = cls(**kwargs)
        model.load(path)
        return model

    def copy_weights_from(self, other: "AZModel",
                          include_optimizer: bool = True) -> None:
        self.params = jax.tree_util.tree_map(lambda x: x, other.params)
        self.batch_stats = jax.tree_util.tree_map(lambda x: x, other.batch_stats)
        if include_optimizer:
            self.opt_state = jax.tree_util.tree_map(lambda x: x, other.opt_state)

    @staticmethod
    def make_batch_from_states(list_of_encoded_states: List[np.ndarray]) -> np.ndarray:
        return np.stack(list_of_encoded_states, axis=0).astype(np.float32)
