"""Profiling + step timing.

The reference's only observability is wall-clock AverageMeters
(``train1.py:280-288``). Here: the same meters (``dahpe_tpu.utils.meters``)
plus a ``jax.profiler`` trace context producing TensorBoard-viewable traces
of the XLA programs, and a throughput tracker.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/jaxtrace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """images/sec tracker with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n_steps = 0
        self.n_items = 0
        self._t0 = None

    def step(self, n_items: int):
        self.n_steps += 1
        if self.n_steps == self.warmup:
            self._t0 = time.perf_counter()
            self.n_items = 0
        elif self.n_steps > self.warmup:
            self.n_items += n_items

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self.n_items == 0:
            return 0.0
        return self.n_items / (time.perf_counter() - self._t0)


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
