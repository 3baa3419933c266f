"""Profiling helpers: jax.profiler traces + lightweight throughput timers.

Replaces the reference's commented-out line_profiler hooks and ad-hoc
``time.time()`` deltas (decoders.py:968-970, 992-1003)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Accumulating work/time meter: ``with meter.measure(n_proposals): ...``"""

    def __init__(self) -> None:
        self.work = 0.0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, work_units: float) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.work += work_units

    @property
    def rate(self) -> float:
        return self.work / self.seconds if self.seconds else 0.0


class StageTimer:
    """Named stage wall-times (host-side; call block_until_ready yourself
    when timing device work)."""

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def summary(self) -> str:
        total = sum(self.times.values()) or 1.0
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{k:24s} {v:8.3f}s  {100*v/total:5.1f}%" for k, v in rows
        )
