"""Tracing and per-phase timing.

The reference has no profiling beyond ad-hoc ``time()`` pairs around the
query loop (``trainers/base.py:93-96``; survey §5).  Here:

* :class:`PhaseTimer` — named wall-clock phases with device sync, so
  timings mean "work finished", not "dispatch returned".
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory when enabled (no-op otherwise).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating named timers: ``with timer("build"): ...``."""

    def __init__(self, sync: bool = True):
        self._sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if self._sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [
            f"{name:24s} total {v['total_s']:9.3f}s  "
            f"x{v['count']:<5d} mean {v['mean_s'] * 1e3:9.2f}ms"
            for name, v in sorted(self.summary().items())
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``jax.profiler`` trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
