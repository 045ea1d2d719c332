"""Attribute the production decayed-spectra value+grad COLD compile.

Round-4 PERF.md records 242 s one-time for jax.value_and_grad of the
full-SMASH decayed-spectra scalar (was ~980 s before the uniform wave
shape plan) but not where it goes -- how many XLA programs, which
dominates (round-4 VERDICT weak #2 / next-round item 5).  This harness
disables the persistent cache (IS3D_NO_COMPILE_CACHE=1) to force a true
cold compile, turns on jax_log_compiles, runs the same workload as
`bench_diff_decays.py --production`, and prints every compiled program's
wall time, sorted.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH \
           python experiments/attribute_cold_compiles.py
"""

import logging
import os
import re
import runpy
import sys
import time

os.environ["IS3D_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

_records = []


class _CompileLogCatcher(logging.Handler):
    _pat = re.compile(
        r"Finished XLA compilation of (.+?) in ([0-9.e+-]+) sec")

    def emit(self, record):
        m = self._pat.search(record.getMessage())
        if m:
            _records.append((float(m.group(2)), m.group(1)))


def main():
    h = _CompileLogCatcher()
    logging.getLogger("jax").addHandler(h)
    logging.getLogger("jax").setLevel(logging.DEBUG)

    mod = runpy.run_path(
        os.path.join(os.path.dirname(__file__), "bench_diff_decays.py"))
    t0 = time.perf_counter()
    mod["production_scale"]()
    wall = time.perf_counter() - t0

    _records.sort(reverse=True)
    total = sum(t for t, _ in _records)
    print(f"\n{len(_records)} XLA programs compiled, "
          f"{total:.1f} s compile total, {wall:.1f} s wall "
          f"(backend={jax.default_backend()})")
    shown = 0.0
    for t, name in _records[:12]:
        shown += t
        print(f"  {t:8.1f} s  {name}")
    rest = total - shown
    if len(_records) > 12:
        print(f"  {rest:8.1f} s  ... {len(_records) - 12} smaller programs")


if __name__ == "__main__":
    sys.exit(main())
