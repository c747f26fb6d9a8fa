"""Profiling/tracing hooks (exceeds the reference, which only logged
wall-clock deltas — SURVEY §5.1): jax.profiler traces + a steps/sec meter
for the BASELINE metric."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec meter; call ``tick()`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self):
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])


def annotate(name: str):
    """Named region for profile traces."""
    return jax.profiler.TraceAnnotation(name)
