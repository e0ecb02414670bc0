"""Tracing / profiling / per-phase timing.

The reference has *no* profiling beyond one wall-clock around a whole
generation (generator_base.py:108-118; SURVEY §5.1). This module adds the
TPU-native observability layer:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    Perfetto/TensorBoard traces of the XLA programs;
  * ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` for host-side
    phases so draft/verify rounds are visible in the timeline;
  * ``StepTimer`` — cheap wall-clock phase timing with mean/p50/p99
    summaries (used by the stepped engine and benchmarks).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host span)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock durations per phase name."""

    def __init__(self):
        self._t: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._t[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._t[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._t.items():
            xs_sorted = sorted(xs)
            n = len(xs_sorted)
            out[name] = {
                "count": n,
                "total": sum(xs_sorted),
                "mean": sum(xs_sorted) / n,
                "p50": xs_sorted[n // 2],
                "p99": xs_sorted[min(int(n * 0.99), n - 1)],
            }
        return out

    def __str__(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:24s} n={s['count']:<6d} mean={s['mean'] * 1e3:8.2f}ms "
                f"p50={s['p50'] * 1e3:8.2f}ms p99={s['p99'] * 1e3:8.2f}ms"
            )
        return "\n".join(lines)
