"""Run-time utilities: phase timing and optional device profiling.

The reference's only instrumentation is a wall-clock Stopwatch around
calculate_spectra (src/cpp/Stopwatch.h) plus progress printfs.  Here every
pipeline phase is timed, and a jax.profiler trace can be captured around any
phase for xprof analysis.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulates named phase durations; prints a summary."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.phases: list = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases.append((name, dt))
            if self.verbose:
                print(f"[is3d_tpu] {name}: {dt:.3f} s")

    def total(self) -> float:
        return sum(dt for _, dt in self.phases)

    def summary(self) -> str:
        lines = [f"  {name:<28s} {dt:8.3f} s" for name, dt in self.phases]
        lines.append(f"  {'total':<28s} {self.total():8.3f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
