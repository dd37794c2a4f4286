"""Tracing/profiling hooks (SURVEY §5: a gap in the reference — it only
wall-clocked the progress callback).

Two tools: ``trace(...)`` wraps a block in a ``jax.profiler`` trace for
TensorBoard/Perfetto inspection of the compiled step, and ``Timer``
measures steady-state steps/sec with ``block_until_ready`` fencing (the
BENCH headline metric's measurement discipline).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, name: Optional[str] = None):
    """Capture a jax.profiler trace of the enclosed block.

    View with TensorBoard's profile plugin or Perfetto. Use around a few
    steady-state steps, not the compile step.
    """
    jax.profiler.start_trace(log_dir)
    try:
        if name is not None:
            with jax.profiler.TraceAnnotation(name):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Phase timer with device fencing; accumulates per-phase durations."""

    def __init__(self):
        self.durations: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a block; ``fence`` is a pytree to block_until_ready on exit
        so device work is included."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.durations.setdefault(name, []).append(time.perf_counter() - t0)

    def steps_per_sec(self, name: str, steps_per_call: int) -> float:
        """Steady-state throughput for a phase (drops the first, cold call)."""
        times = self.durations.get(name, [])
        times = times[1:] if len(times) > 1 else times
        if not times:
            return 0.0
        return steps_per_call * len(times) / sum(times)

    def summary(self) -> Dict[str, float]:
        return {
            name: sum(times) / len(times) for name, times in self.durations.items()
        }
