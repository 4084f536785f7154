"""Tracing/profiling — first-class observability (reference has none, SURVEY §5).

* ``trace(logdir)``: jax.profiler context manager -> TensorBoard-viewable
  XPlane trace of device execution.
* ``StepTimer``: lightweight rolling wall-clock/step + device-time probe for
  train/infer loops, emitting to MetricLogger-compatible dicts.
* ``device_memory_stats``: HBM usage snapshot (allocated/limit).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


class StepTimer:
    """Rolling steps/sec with optional warmup skip (compile step excluded)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._count = 0
        # warmup=0: rate over ALL steps, measured from construction
        # (the count==warmup branch below is unreachable then — round-2
        # review: _t0 stayed None forever and tick() always returned None)
        self._t0: Optional[float] = time.perf_counter() if warmup == 0 else None

    def tick(self) -> Optional[float]:
        """Call once per step after block_until_ready; returns steps/sec so far."""
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            return None
        if self._t0 is None or self._count <= self.warmup:
            return None
        return (self._count - self.warmup) / (time.perf_counter() - self._t0)
