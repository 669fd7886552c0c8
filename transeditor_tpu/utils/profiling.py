"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm postfixes (SURVEY.md §5).
Here: jax.profiler trace capture around training/serving windows plus a
lightweight step timer that reports images/sec and step-time
percentiles (the BASELINE.md metrics).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time stats; call tick() once per step."""

    def __init__(self, window: int = 200, items_per_step: int = 1):
        self.window = window
        self.items = items_per_step
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p95": float(np.percentile(t, 95) * 1e3),
            "items_per_sec": self.items / float(np.mean(t)),
        }
