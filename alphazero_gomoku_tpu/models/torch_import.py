"""One-way importer for reference torch snapshots (``.pt``).

The reference persists ``{"net": state_dict, "opt": ..., "board_size",
"action_size"}`` via ``torch.save`` (``/root/reference/network.py:239-248``).
This module converts that into an :class:`AZModel` so users migrating from
the reference can keep their trained nets:

  - conv weights: torch OIHW -> JAX HWIO (``permute(2, 3, 1, 0)``)
  - linear weights: ``[out, in]`` -> ``[in, out]``; the policy FC
    additionally permutes its INPUT columns because the torch net flattens
    the 2-channel policy-head activations CHW while this repo's NHWC
    forward flattens them HWC (``resnet.py`` policy head)
  - the 1-channel value-head flatten is layout-invariant (CHW == HWC)
  - BN running stats import as-is; torch's Adam moments are NOT imported
    (the optax chain state has a different structure) — the optimizer
    restarts fresh, which only matters if you continue training.

Import is one-way by design: native checkpoints are the msgpack ``AZTPU1``
container (``models/checkpoint.py``).  Architecture (channels, blocks,
in_channels, board size) is inferred from the state-dict shapes.

CLI: ``python -m alphazero_gomoku_tpu.models.torch_import in.pt out.ckpt``
"""

from __future__ import annotations

import numpy as np


def _is_torch_file(path: str) -> bool:
    """Cheap sniff: torch>=1.6 saves are zipfiles; legacy ones are pickle."""
    if path.endswith((".pt", ".pth")):
        return True
    try:
        with open(path, "rb") as f:
            magic = f.read(2)
        return magic == b"PK" or magic == b"\x80\x02"
    except OSError:
        return False


def _load_state(path: str):
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older saves with optimizer state need full unpickling
        state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "net" in state:
        return state["net"], state
    return state, {}


def _chw_to_hwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """Row permutation: FC input index under HWC flatten -> CHW flatten."""
    perm = np.zeros(c * h * w, dtype=np.int64)
    for ci in range(c):
        for hi in range(h):
            for wi in range(w):
                perm[hi * w * c + wi * c + ci] = ci * h * w + hi * w + wi
    return perm


def import_torch_checkpoint(path: str, lr: float = 1e-3,
                            weight_decay: float = 1e-4):
    """Load a reference ``.pt`` snapshot into a fresh :class:`AZModel`."""
    import jax.numpy as jnp

    from alphazero_gomoku_tpu.models.model import AZModel

    sd, extra = _load_state(path)
    sd = {k: np.array(v.detach().numpy(), copy=True)
          if hasattr(v, "detach") else v for k, v in sd.items()}

    stem = sd["conv.weight"]                      # [C, in, 3, 3]
    channels, in_channels = int(stem.shape[0]), int(stem.shape[1])
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("res_blocks.")})
    action_size = int(sd["policy_fc.weight"].shape[0])
    board_size = int(extra.get("board_size", round(action_size ** 0.5)))
    if board_size * board_size != action_size:
        raise ValueError(
            f"non-square action_size {action_size} (board_size {board_size})"
        )

    model = AZModel(board_size=board_size, action_size=action_size,
                    n_res_blocks=n_blocks, channels=channels,
                    in_channels=in_channels, lr=lr,
                    weight_decay=weight_decay)

    def conv(key):
        return jnp.asarray(sd[key].transpose(2, 3, 1, 0))

    def lin(key, perm=None):
        w = sd[key + ".weight"].T                 # [in, out]
        if perm is not None:
            w = w[perm]
        return {"w": jnp.asarray(w), "b": jnp.asarray(sd[key + ".bias"])}

    def bn_p(key):
        return {"scale": jnp.asarray(sd[key + ".weight"]),
                "bias": jnp.asarray(sd[key + ".bias"])}

    def bn_s(key):
        return {"mean": jnp.asarray(sd[key + ".running_mean"]),
                "var": jnp.asarray(sd[key + ".running_var"])}

    pperm = _chw_to_hwc_perm(2, board_size, board_size)
    model.params = {
        "stem": {"w": conv("conv.weight")},
        "stem_bn": bn_p("bn"),
        "blocks": [
            {"conv1": {"w": conv(f"res_blocks.{i}.conv1.weight")},
             "bn1": bn_p(f"res_blocks.{i}.bn1"),
             "conv2": {"w": conv(f"res_blocks.{i}.conv2.weight")},
             "bn2": bn_p(f"res_blocks.{i}.bn2")}
            for i in range(n_blocks)
        ],
        "policy_conv": {"w": conv("policy_conv.weight")},
        "policy_bn": bn_p("policy_bn"),
        "policy_fc": lin("policy_fc", pperm),
        "value_conv": {"w": conv("value_conv.weight")},
        "value_bn": bn_p("value_bn"),
        "value_fc1": lin("value_fc1"),   # 1 channel: CHW == HWC flatten
        "value_fc2": lin("value_fc2"),
    }
    model.batch_stats = {
        "stem_bn": bn_s("bn"),
        "blocks": [{"bn1": bn_s(f"res_blocks.{i}.bn1"),
                    "bn2": bn_s(f"res_blocks.{i}.bn2")}
                   for i in range(n_blocks)],
        "policy_bn": bn_s("policy_bn"),
        "value_bn": bn_s("value_bn"),
    }
    model.opt_state = model.tx.init(model.params)
    return model


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference torch .pt snapshot to a native "
                    "AZTPU1 checkpoint")
    ap.add_argument("src", help="reference .pt snapshot")
    ap.add_argument("dst", help="output .ckpt path")
    args = ap.parse_args(argv)
    model = import_torch_checkpoint(args.src)
    model.save(args.dst)
    print(f"imported {args.src} -> {args.dst} "
          f"({model.cfg.n_res_blocks}x{model.cfg.channels}, "
          f"board {model.board_size}, in_channels {model.cfg.in_channels})")


if __name__ == "__main__":
    main()
