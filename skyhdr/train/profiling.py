"""Tracing/profiling — a capability the reference lacks entirely (its only
instrumentation is wall-clock epoch timing, train.py:446,525; SURVEY.md §5).

  * trace(logdir)  — context manager around jax.profiler.trace; produces a
    Perfetto/TensorBoard-profile trace of the wrapped steps.
  * StepTimer      — per-step wall-clock stats with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step durations (blocking on the given output)."""

    def __init__(self):
        self._durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        assert self._t0 is not None
        self._durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    def stats(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = sorted(self._durations)
        n = len(d)
        return {
            "steps": n,
            "mean_ms": 1e3 * sum(d) / n,
            "p50_ms": 1e3 * d[n // 2],
            "p90_ms": 1e3 * d[int(n * 0.9)],
            "min_ms": 1e3 * d[0],
            "max_ms": 1e3 * d[-1],
        }

    def reset(self):
        self._durations.clear()
