"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's "workers==1 serial path as the debug backend"
strategy (reference ``train.py:670-694``): the identical jitted code paths
run on CPU so the TPU program is testable without hardware, and sharding
tests get 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platform_name", "cpu")
