"""Pre-flight device-memory guard (selfplay/budget.py).

Companion to the round-3 batch-512 close-out: XLA's own memory analysis
is the accounting source (tools/hbm_budget.py), and the guard must raise
a clear host-side error for over-budget configs instead of letting the
TPU worker hard-fault.
"""

import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.selfplay.budget import (
    MemoryBudgetError,
    device_hbm_bytes,
    preflight_memory_check,
    with_preflight,
)


def _big_program():
    @jax.jit
    def fn(x):
        y = jnp.outer(x, x)          # [4096, 4096] f32 = 64 MB temp/output
        return jnp.sum(y, axis=0)

    return fn, jnp.ones((4096,), jnp.float32)


def test_preflight_passes_in_budget():
    fn, x = _big_program()
    acct = preflight_memory_check(fn, x, label="test")
    if acct is None:  # backend without AOT memory analysis: check degrades
        pytest.skip("memory_analysis unavailable on this backend")
    assert acct["peak_bytes"] > 0
    assert acct["limit_bytes"] >= acct["peak_bytes"]
    # the compiled executable is cached: the real call must still work
    assert fn(x).shape == (4096,)


def test_preflight_raises_over_budget():
    fn, x = _big_program()
    if preflight_memory_check(fn, x) is None:
        pytest.skip("memory_analysis unavailable on this backend")
    with pytest.raises(MemoryBudgetError, match="peak device memory"):
        preflight_memory_check(fn, x, margin=1e-9, label="tiny-margin")


def test_with_preflight_wrapper_checks_then_calls():
    fn, x = _big_program()
    if preflight_memory_check(fn, x) is None:
        pytest.skip("memory_analysis unavailable on this backend")
    wrapped = with_preflight(fn, label="wrapped", margin=1e-9)
    with pytest.raises(MemoryBudgetError):
        wrapped(x)
    ok = with_preflight(fn, label="wrapped-ok")
    assert ok(x).shape == (4096,)


def test_device_hbm_bytes_positive():
    assert device_hbm_bytes() > 2 ** 30
