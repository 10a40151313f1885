"""Tracing / profiling utilities.

The reference has zero instrumentation — not even timers (SURVEY.md §5:
"logs contain no timing lines").  This module provides:

  * ``trace(path)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace of device execution;
  * ``Throughput`` — rolling edges/sec / steps/sec counters (the
    north-star metric is propagation edges/sec/chip, BASELINE.json);
  * ``time_fn`` — warmed-up wall-clock timing of a jitted callable with
    ``block_until_ready`` fencing.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_profiling: bool = False):
    """Capture a jax profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=False,
                             create_perfetto_trace=host_profiling)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 3) -> float:
    """Mean seconds per call, post-warmup, device-fenced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass
class Throughput:
    """Rolling throughput counters.

    ``edges_per_step`` should count propagation edge traversals
    (E * layers * directions * fwd/bwd) so the reported number is the
    roofline-comparable edges/sec/chip.
    """

    edges_per_step: int
    steps: int = 0
    seconds: float = 0.0
    _t0: Optional[float] = field(default=None, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, steps: int = 1):
        assert self._t0 is not None, "call start() first"
        self.seconds += time.perf_counter() - self._t0
        self.steps += steps
        self._t0 = None

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.seconds if self.seconds else 0.0

    @property
    def edges_per_sec(self) -> float:
        return self.steps_per_sec * self.edges_per_step

    def summary(self) -> str:
        return (f"{self.steps} steps in {self.seconds:.2f}s | "
                f"{self.steps_per_sec:.2f} steps/s | "
                f"{self.edges_per_sec:,.0f} edges/s")
