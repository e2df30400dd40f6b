"""Profiling / tracing hooks (SURVEY.md §5: the reference has only wall-clock
timeit calls; here: jax.profiler traces + a step timer with forced sync).

Note: on some experimental platforms block_until_ready can return early; the
timer forces a device->host scalar sync for honest wall-clock numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock with forced device sync."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(jnp.sum(sync_value))  # force full device->host sync
        dt = time.time() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def rate(self, items_per_step: float = 1.0) -> float:
        return items_per_step / self.mean if self.times else 0.0
