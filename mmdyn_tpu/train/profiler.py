"""Profiling / step-timing utilities (aux subsystem the reference lacks —
its only instrumentation is a terminal progress bar, SURVEY.md section 5).

``trace(logdir)`` wraps jax.profiler tracing (view in TensorBoard or Perfetto)
and ``StepTimer`` keeps a lightweight step-time / throughput meter that only
syncs the device when read.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Profile the enclosed block with the JAX profiler when logdir is set."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running step-time statistics (host wall clock between marks)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._count = 0
        self._total = 0.0
        self._min = float("inf")
        self._last = None

    def mark(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._count += 1
            self._total += dt
            self._min = min(self._min, dt)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return self._total / self._count if self._count else 0.0

    @property
    def min_step_time(self) -> float:
        return self._min if self._count else 0.0

    def frames_per_sec(self, batch_size: int) -> float:
        mt = self.mean_step_time
        return batch_size / mt if mt > 0 else 0.0
