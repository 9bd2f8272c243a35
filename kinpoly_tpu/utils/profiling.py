"""Profiling / tracing helpers — a strict upgrade over the reference's
wall-clock-only timing (SURVEY §5): jax.profiler traces + named phase
timers whose results integrate with training logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase (T_sample / T_update / ... in
    the reference logs)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.time()
        yield
        if sync:
            jax.effects_barrier()
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {k: dict(total=v, mean=v / max(self.counts[k], 1))
                for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation
