"""Profiling and observability helpers.

The reference has no tracing at all (SURVEY.md §5.1 — GNU Radio perf
counters exist upstream but are never enabled; debugging is GUI scopes).
Here observability is first-class:

  - `trace(...)`: JAX profiler capture (TensorBoard-compatible) around
    any pipeline section;
  - `StageTimer`: wall-clock per-stage accounting for host-side loops;
  - the debug tensors the reference exposes as optional block outputs
    (corr magnitude, timing error/mu — lib/corr_est_cc_impl.cc:174-177,
    lib/msk_timing_recovery_cc_impl.cc:116-117) are already first-class
    fields of `BurstRecords` / `TimingResult`.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace context: view with TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer for host pipeline stages."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {t * 1e3:.1f} ms total / {n} calls "
                         f"({t / n * 1e3:.2f} ms avg)")
        return "\n".join(lines)
