"""Phase timers.

The reference brackets phases with gettimeofday (HTMHashBuild.hpp:93-94,310)
and rdtsc cycle counters (mc/src/rdtsc.h:35-57).  On TPU, dispatch is async:
a phase timer must block on device results (`block_until_ready`) to measure
real device time.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict

import jax


class PhaseTimer:
    """Collects per-phase wall times in microseconds (the reference's
    reporting unit)."""

    def __init__(self) -> None:
        self.micros: Dict[str, float] = {}

    @contextmanager
    def phase(self, name: str, *results):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.micros[name] = self.micros.get(name, 0.0) + (
                time.perf_counter() - start) * 1e6

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on all jax outputs, record elapsed µs."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.micros[name] = self.micros.get(name, 0.0) + (
            time.perf_counter() - start) * 1e6
        return out

    def total(self) -> float:
        return sum(self.micros.values())
