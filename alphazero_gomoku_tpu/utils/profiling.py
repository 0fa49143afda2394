"""Tracing and phase-timing instrumentation.

The reference only has ad-hoc ``time.time()`` prints per phase
(``train.py:653,750-763,807-810``).  Here the equivalents are first-class:
``PhaseTimer`` collects wall-clock per named phase (and powers the loop's
log lines), and ``trace_annotation`` / ``start_profiler_trace`` wire into
``jax.profiler`` so device timelines can be captured with TensorBoard/XProf
when needed.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase across iterations."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 3),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region visible in device profiles (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(log_dir: str = "/tmp/az_tpu_trace") -> str:
    """Begin capturing a device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_profiler_trace() -> None:
    jax.profiler.stop_trace()
