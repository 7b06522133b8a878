"""Tracing / profiling helpers (SURVEY.md SS5 "Tracing / profiling").

The reference's only observability was the Keras TensorBoard callback. The
TPU-native equivalents here:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing an
  XLA/TPU trace viewable in Perfetto/TensorBoard.
* :class:`StepTimer` — wall-clock img/s/chip meter with a host-fetch fence
  (on the axon relay backend ``block_until_ready`` can return before remote
  execution finishes; fetching a scalar output is the reliable fence —
  discovered empirically, see bench.py).
* :func:`flops_estimate` — XLA cost analysis of a jitted function, for
  MFU accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace: ``with trace('/tmp/t'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the live jax.profiler server (attach TensorBoard/Perfetto).

    SURVEY.md SS5 "Tracing / profiling": the on-demand capture companion to
    :func:`trace` — run once at startup, then capture windows remotely.
    Returns the server object (keep a reference alive).
    """
    return jax.profiler.start_server(port)


class StepTimer:
    """Throughput meter: ``tick()`` per step, ``rate()`` -> items/s/chip."""

    def __init__(self, items_per_step: int, warmup: int = 2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self, fence_output=None) -> None:
        if fence_output is not None:
            np.asarray(jax.tree.leaves(fence_output)[-1])  # host-fetch fence
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    def rate(self) -> float:
        if self._t0 is None or self._count <= self.warmup:
            return 0.0
        steps = self._count - self.warmup
        dt = time.perf_counter() - self._t0
        return steps * self.items_per_step / dt / jax.device_count()


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of one call of ``fn(*args)`` per XLA cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else None
    except Exception:
        return None
