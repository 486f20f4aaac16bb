"""Tracing, profiling and throughput counters.

The reference has no tracing or profiling of any kind (SURVEY.md §5 —
only tqdm download bars). This module provides the TPU-native
observability layer: ``jax.profiler`` trace capture, wall-clock timers and
images/sec throughput meters used by bench.py and the examples.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Iterator

import jax

from ._config import get_logger

logger = get_logger("profiling")

__all__ = ["trace", "timed", "Throughput"]


@contextlib.contextmanager
def trace(log_dir: str, *, host_profile: bool = False) -> Iterator[None]:
    """Capture a TPU profiler trace viewable in TensorBoard/XProf.

    >>> with profiling.trace("/tmp/jax-trace"):
    ...     encoder.encode(images)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def timed(label: str) -> Iterator[None]:
    """Log wall-clock duration of a block (blocks on async dispatch only if
    the caller does — wrap with block_until_ready for device timings)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s: %.3fs", label, time.perf_counter() - t0)


@dataclass
class Throughput:
    """Streaming items/sec meter.

    >>> meter = Throughput()
    >>> for batch in batches:
    ...     out = encode(batch); out.block_until_ready()
    ...     meter.update(len(batch))
    >>> meter.rate
    """

    count: int = 0
    _start: float = field(default_factory=time.perf_counter)

    def update(self, n: int) -> None:
        self.count += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    @property
    def rate(self) -> float:
        return self.count / max(self.elapsed, 1e-9)

    def reset(self) -> None:
        self.count = 0
        self._start = time.perf_counter()

    def __repr__(self) -> str:
        return f"Throughput({self.count} items, {self.rate:.1f}/s)"
