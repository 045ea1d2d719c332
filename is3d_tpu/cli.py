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
    "             (reference: ParameterReader::readFromArguments)\n"
    "pod mode (multi-host deterministic kernels, docs/MULTIHOST.md Level 4):\n"
    "  run the SAME command on every host, adding\n"
    "  multihost_coordinator=host:port multihost_nproc=N multihost_pid=i\n"
    "  (process 0 writes results/; all results are bit-identical to a\n"
    "  single-process run)\n"
    "harness keys (consumed by the CLI, not Config): platform=cpu forces\n"
    "  the backend pre-init; host_devices=N forces N virtual CPU devices")

# CLI-only keys, consumed before Config sees the overrides
_POD_KEYS = ("multihost_coordinator", "multihost_nproc", "multihost_pid")
_HARNESS_KEYS = ("platform", "host_devices")


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

    harness = {k: overrides.pop(k) for k in _HARNESS_KEYS if k in overrides}
    if harness.get("host_devices"):
        # virtual CPU device count; must land in XLA_FLAGS before backend init
        import os
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count="
                     f"{int(harness['host_devices'])}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
    if harness.get("platform"):
        # before any backend init (the env var JAX_PLATFORMS is ignored
        # when a TPU plugin autoloads -- see ensemble_worker)
        import jax
        jax.config.update("jax_platforms", harness["platform"])
        if harness["platform"] == "cpu":
            jax.config.update("jax_enable_x64", True)

    pod = {k: overrides.pop(k) for k in _POD_KEYS if k in overrides}
    if pod:
        missing = [k for k in _POD_KEYS if k not in pod]
        if missing:
            print(f"pod mode needs all of {', '.join(_POD_KEYS)}; missing "
                  f"{', '.join(missing)}\n{_USAGE}", file=sys.stderr)
            return 2
        from .parallel.multihost import initialize
        initialize(pod["multihost_coordinator"],
                   int(pod["multihost_nproc"]), int(pod["multihost_pid"]))

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
