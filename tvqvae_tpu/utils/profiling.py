"""Profiling and step-time instrumentation.

The reference has no tracing at all (SURVEY.md §5.1 — its only perf control
is torch matmul precision). Here profiling is first-class:

  - `trace(logdir)`: context manager around `jax.profiler` producing
    TensorBoard/XProf traces of device execution,
  - `StepTimer`: streaming wall-clock step statistics (mean/p50/p90, it/s)
    suitable for per-interval logging from train loops,
  - `annotate`: named trace spans (jax.profiler.TraceAnnotation).
"""

import contextlib
import time
from typing import Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Streaming step timing with percentile summaries."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self, n_steps: int = 1) -> None:
        """Record elapsed time since the last tick; `n_steps` > 1 divides it
        so bundled loops still report per-step times."""
        now = time.perf_counter()
        if self._last is not None:
            self._times.append((now - self._last) / max(n_steps, 1))
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def summary(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "perf/step_time_mean_ms": float(t.mean() * 1e3),
            "perf/step_time_p50_ms": float(np.percentile(t, 50) * 1e3),
            "perf/step_time_p90_ms": float(np.percentile(t, 90) * 1e3),
            "perf/steps_per_sec": float(1.0 / t.mean()),
        }
