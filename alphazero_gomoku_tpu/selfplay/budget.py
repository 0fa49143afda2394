"""Pre-flight device-memory check for jitted self-play programs.

Round-2's batch-512 fault investigation (ROADMAP #3) ended with "consistent
with HBM pressure" as a hypothesis; the round-3 accounting
(``tools/hbm_budget.py``, XLA's own ``memory_analysis`` on the AOT-compiled
program) REFUTED it: the faulting 512x400 f32 self-play peaks at 2.81 GB
against 16 GB of v5e HBM, and the passing int8 twin peaks at 2.80 GB.
Whatever kills the worker, it is not allocation size.  This module keeps
the useful half of that close-out: every large jitted program can be
budget-checked against the device BEFORE its first execution, so a config
that genuinely exceeds HBM raises a clear, actionable error on the host
instead of hard-faulting the TPU worker mid-run.

The check is free in the common path: ``jax.jit`` caches the executable
produced by ``lower().compile()``, so the later call with the same
arguments reuses it instead of compiling twice.

Reference analogue: none — the reference's CPU workers rely on the OS
allocator failing cleanly (``/root/reference/train.py:710-742``); a TPU
worker does not.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# v5e (and the axon "TPU v5 lite" tunnel) HBM per chip; used only when the
# backend does not expose memory_stats().
_FALLBACK_HBM_BYTES = 16 * 1024 ** 3


class MemoryBudgetError(RuntimeError):
    """A jitted program's XLA-reported peak exceeds the device budget."""


def device_hbm_bytes(device=None) -> int:
    """Best-effort device memory limit in bytes."""
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _FALLBACK_HBM_BYTES


def memory_analysis_dict(compiled) -> Dict[str, Any]:
    """XLA memory analysis of a compiled executable as plain numbers."""
    ma = compiled.memory_analysis()
    arg = int(ma.argument_size_in_bytes)
    out = int(ma.output_size_in_bytes)
    tmp = int(ma.temp_size_in_bytes)
    alias = int(ma.alias_size_in_bytes)
    return {
        "argument_bytes": arg,
        "output_bytes": out,
        "temp_bytes": tmp,
        "alias_bytes": alias,
        "peak_bytes": arg + out + tmp - alias,
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
    }


def preflight_memory_check(jitted_fn, *args, margin: float = 0.92,
                           label: str = "program",
                           device=None) -> Optional[Dict[str, Any]]:
    """Compile ``jitted_fn(*args)`` and check its peak against the device.

    Raises :class:`MemoryBudgetError` when XLA's reported peak (arguments
    + outputs + temps - aliased) exceeds ``margin`` of the device memory
    limit; returns the accounting dict otherwise.  Degrades to ``None``
    (no check) when the backend cannot lower ahead-of-time or report
    memory analysis — a missing check must never block a run.  The
    compiled executable lands in the jit cache, so the subsequent real
    call does not recompile.
    """
    try:
        compiled = jitted_fn.lower(*args).compile()
        acct = memory_analysis_dict(compiled)
    except MemoryBudgetError:
        raise
    except Exception:
        return None
    limit = device_hbm_bytes(device)
    acct["limit_bytes"] = limit
    acct["margin"] = margin
    if acct["peak_bytes"] > margin * limit:
        gib = 1024 ** 3
        raise MemoryBudgetError(
            f"{label}: XLA-reported peak device memory "
            f"{acct['peak_bytes'] / gib:.2f} GiB exceeds {margin:.0%} of "
            f"the {limit / gib:.2f} GiB device limit "
            f"(arguments {acct['argument_bytes'] / gib:.2f} + outputs "
            f"{acct['output_bytes'] / gib:.2f} + temporaries "
            f"{acct['temp_bytes'] / gib:.2f} GiB). Reduce batch_games, "
            f"n_simulations (node capacity), or switch inference to int8 "
            f"before running: this would abort the TPU worker mid-run."
        )
    return acct


def with_preflight(jitted_fn, label: str = "program", margin: float = 0.92):
    """Wrap a jitted callable so its FIRST call runs the budget check.

    The wrapped function's arguments are only known at call time, so the
    check happens lazily: on the first invocation the program is lowered
    and compiled (cached — no double compile), the XLA peak is checked
    against the device, and only then does the call execute.  Subsequent
    calls go straight through.
    """
    checked = False

    def call(*args, **kwargs):
        nonlocal checked
        if not checked:
            if not kwargs:  # keyword calls would lower a different signature
                preflight_memory_check(jitted_fn, *args,
                                       label=label, margin=margin)
            checked = True
        return jitted_fn(*args, **kwargs)

    return call
