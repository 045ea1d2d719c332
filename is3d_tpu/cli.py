"""Command-line entry point (RuniS3D equivalent, reference: RuniS3D.cpp).

Usage::

    python -m is3d_tpu.cli [run_dir] [key=value ...]

Reads ``<run_dir>/iS3D_parameters.dat``, the surface from
``<run_dir>/input/surface.dat``, PDG / tables / deltaf_coefficients from the
run directory, writes outputs to ``<run_dir>/results/``.  ``key=value``
arguments override parameters (reference: ParameterReader::readFromArguments).
"""

from __future__ import annotations

import sys
import time


_USAGE = (
    "usage: python -m is3d_tpu [run_dir] [key=value ...]\n"
    "  run_dir    directory with iS3D_parameters.dat, input/surface.dat,\n"
    "             PDG/, tables/, deltaf_coefficients/ (default: .)\n"
    "  key=value  parameter overrides, e.g. mode=1 operation=2\n"
    "             (reference: ParameterReader::readFromArguments)")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("-h", "--help"):
        print(_USAGE)
        return 0
    run_dir = "."
    if argv and "=" not in argv[0]:
        run_dir = argv.pop(0)
    bad = [a for a in argv if "=" not in a]
    if bad:
        print(f"unrecognized argument(s): {' '.join(bad)}\n{_USAGE}",
              file=sys.stderr)
        return 2
    overrides = dict(a.split("=", 1) for a in argv)

    from .api import IS3D

    from .utils import PhaseTimer

    t0 = time.time()
    run = IS3D.from_run_dir(run_dir, overrides=overrides)
    # full config echo (reference: paraRdr->echo() at iS3D.cpp:84)
    import dataclasses
    for f in dataclasses.fields(run.cfg):
        print(f"  {f.name} = {getattr(run.cfg, f.name)}")
    result = run.run_particlization(timer=PhaseTimer(verbose=True))
    dt = time.time() - t0
    if result.spectra is not None:
        print(f"spectra shape {result.spectra.shape}")
    if result.events is not None:
        print(f"sampled {len(result.events)} event(s)")
    print(run.timer.summary())
    print(f"done in {dt:.2f} s; output in {run.results_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
