"""Profiling / tracing utilities.

The reference had only wall-clock prints (SURVEY §5; train.py:480-487).
Here: a context manager around jax.profiler emitting TensorBoard-viewable
traces (XLA op timeline, HBM usage), plus a step timer that logs to the
metrics sink.

Usage:
  with trace("/tmp/trace"):        # view with tensorboard --logdir
      step_fn(state, batch)
or `python -m mvsnet_tpu.train ... --profile_dir /tmp/trace` (traces steps
10-15 and continues training).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-duration stats (time_per_step parity: train.py:487,511)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._durations = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._durations) / max(len(self._durations), 1)


def device_memory_stats() -> Optional[dict]:
    """Per-device HBM stats when the backend exposes them."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return {k: int(v) for k, v in stats.items()} if stats else None
    except Exception:
        return None
