"""Utilities: profiling/tracing hooks and structured logging."""

from alphazero_gomoku_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer,
    trace_annotation,
    start_profiler_trace,
    stop_profiler_trace,
)
