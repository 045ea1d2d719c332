"""Run-time utilities: phase timing and optional device profiling.

The reference's only instrumentation is a wall-clock Stopwatch around
calculate_spectra (src/cpp/Stopwatch.h) plus progress printfs.  Here every
pipeline phase is timed, and a jax.profiler trace can be captured around any
phase for xprof analysis.
"""

from __future__ import annotations

import contextlib
import os
import time

_cache_enabled: str | None = None


def enable_persistent_compilation_cache(cache_dir: str | None = None):
    """Point JAX's persistent compilation cache at a stable on-disk location
    so cold-start costs (CLI startup, decay-wave compiles, sampler worker
    processes) are paid once per machine instead of once per process.

    The reference has no compile step to cache; for the TPU build the cold
    compile of the full pipeline is minutes (NOTES_ROUND1: decay waves 124 s
    cold vs 4.3 s warm), so this is wired into every entry point (CLI, IS3D
    API, ensemble workers).  Opt out with IS3D_NO_COMPILE_CACHE=1; override
    the location with IS3D_COMPILE_CACHE=<dir>.

    Safe to call multiple times and after jax is initialized; returns the
    cache dir or None if disabled/unavailable."""
    global _cache_enabled
    if os.environ.get("IS3D_NO_COMPILE_CACHE"):
        return None
    if _cache_enabled is not None:
        return _cache_enabled
    d = cache_dir or os.environ.get(
        "IS3D_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "is3d_tpu", "xla"))
    try:
        import jax
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Only genuinely expensive compiles (>= 1 s): an aggressive
        # cache-everything configuration (min_entry_size -1, threshold
        # 0.1 s) measured 20x SLOWER on the prepare phase's many small
        # dispatches (117 s vs 5.4 s for compute_particle_densities) --
        # per-compile cache traffic dominates tiny ops.  The targets are
        # the multi-second kernel/decay-wave compiles, which do not
        # reliably dedupe across processes on the serving backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    _cache_enabled = d
    return d


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


class EnvGatedAccumTimer:
    """Keyed wall-clock accumulation across loop iterations, enabled by an
    environment variable; a no-op otherwise.  Complements PhaseTimer (one
    entry per phase, always on): this one folds repeated enter/exit of the
    same key into a single total, for opt-in breakdowns of hot host loops
    (e.g. IS3D_SAMPLER_TIMINGS=1 for the sampler drain loop)."""

    def __init__(self, env_var: str):
        self.enabled = os.environ.get(env_var, "") == "1"
        self.acc: dict = {}
        # (key, t0) stack so nested/interleaved `with timer(k):` blocks
        # attribute time to the right key instead of silently mixing them
        self._stack: list = []
        self._next_key = None

    def __call__(self, key: str):
        self._next_key = key
        return self

    def __enter__(self):
        if self.enabled:
            self._stack.append((self._next_key, time.perf_counter()))

    def __exit__(self, *exc):
        if self.enabled:
            key, t0 = self._stack.pop()
            self.acc[key] = (self.acc.get(key, 0.0)
                             + time.perf_counter() - t0)
        return False

    def report(self, label: str):
        if self.enabled and self.acc:
            parts = "  ".join(f"{k}={v:.3f}s" for k, v in self.acc.items())
            print(f"[{label} timings] {parts}")


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
