"""Tracing / profiling hooks.

The reference has no tracer — timing is nanobench in benchmarks and raw
``clock_gettime`` in the app (SURVEY §5).  The rebuild exposes:

* ``trace(dir)`` — ``jax.profiler`` context writing a TensorBoard-viewable
  trace of the device timeline (XLA fusions, Pallas kernels, collectives).
* ``annotate(name)`` — named region that shows up inside the trace.
* ``Timer`` — lightweight host-side wall-clock section timer with
  per-section accumulation, for solver drivers and IO.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["trace", "annotate", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region (``with annotate("cg-iterate"): ...``)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock section timer.

    >>> t = Timer()
    >>> with t("spmv"):
    ...     y = op(x); jax.block_until_ready(y)
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, section: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[section] += time.perf_counter() - t0
            self.counts[section] += 1

    def report(self) -> str:
        lines = [
            f"{name}: {self.totals[name]*1e3:.2f} ms "
            f"({self.counts[name]}x, {self.totals[name]/self.counts[name]*1e6:.1f} us avg)"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        out = "\n".join(lines)
        print(out)
        return out
