"""Worker process entry for multiprocess_oversample.

Usage (spawned by ensemble.multiprocess_oversample, or by hand / a cluster
scheduler for multi-host runs against a shared filesystem):

    python -m is3d_tpu.ensemble_worker worker_id=0 n_workers=4 \
        run_dir=. out_dir=oversampling events_per_batch=100 base_seed=0 \
        [platform=cpu] [any iS3D parameter overrides, e.g. df_mode=2]

Each worker loads the surface from the reference-layout run_dir, derives
the same deterministic batch plan as every other worker, and samples only
the batches with batch % n_workers == worker_id, checkpointing each into
its own manifest (TPU-native analog of the reference's
scripts/run_multithread_sampling_iS3D.py sandboxed process pool).
"""

from __future__ import annotations

import sys


_OWN_KEYS = ("worker_id", "n_workers", "run_dir", "out_dir",
             "events_per_batch", "base_seed", "platform", "max_batches",
             "mesh_devices", "host_devices")


def main(argv: list[str]) -> int:
    kv = {}
    for a in argv:
        if "=" not in a:
            raise SystemExit(f"arguments must be key=value, got {a!r}")
        k, v = a.split("=", 1)
        kv[k] = v

    if kv.get("host_devices"):
        # virtual CPU device count (testing a mesh without real chips);
        # must be in XLA_FLAGS before backend init
        import os as _os
        flags = [f for f in _os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count="
                     f"{int(kv['host_devices'])}")
        _os.environ["XLA_FLAGS"] = " ".join(flags)
    if kv.get("platform"):
        # must run before any backend initialization (the env var
        # JAX_PLATFORMS is ignored when a TPU plugin autoloads)
        import jax
        jax.config.update("jax_platforms", kv["platform"])
        if kv["platform"] == "cpu":
            jax.config.update("jax_enable_x64", True)

    import numpy as np
    from .utils import enable_persistent_compilation_cache
    from .api import IS3D
    from .ensemble import oversample_run

    # workers are fresh processes: without the persistent cache each one
    # pays the full sampler/prepare compile bill
    enable_persistent_compilation_cache()

    overrides = {k: v for k, v in kv.items() if k not in _OWN_KEYS}
    # reject mistyped worker keys outright: a typo like n_worker=4 would
    # otherwise fall through to the config, be silently dropped there
    # (load_config ignores unknown names), and leave this worker sampling
    # EVERY batch of the plan with the default manifest name
    from . import config as _config
    unknown = sorted(k for k in overrides if k not in _config._FIELD_TYPES)
    if unknown:
        raise SystemExit(
            f"unknown argument(s) {unknown}: not a worker key "
            f"({', '.join(_OWN_KEYS)}) and not an iS3D config parameter")
    run = IS3D.from_run_dir(kv.get("run_dir", "."), overrides=overrides)
    run.read_fo_surf_from_file(write_averages=False)
    (table, df_data, species, mcids, _grid, plasma) = run._prepare()

    mesh = None
    if kv.get("mesh_devices"):
        # shard the cell axis over this worker's local chips: multi-host
        # scale-out composes (worker processes) x (per-worker device mesh)
        from .parallel.mesh import default_mesh
        mesh = default_mesh(int(kv["mesh_devices"]),
                            axis=run.cfg.mesh_axis)

    n_batches, total, ntot = oversample_run(
        run.surface, species, np.asarray(mcids), df_data, run.cfg, plasma,
        out_dir=kv.get("out_dir", "oversampling"),
        events_per_batch=int(kv.get("events_per_batch", 100)),
        base_seed=int(kv.get("base_seed", 0)),
        max_batches=int(kv.get("max_batches", 1000)),
        worker_id=int(kv.get("worker_id", 0)),
        n_workers=int(kv.get("n_workers", 1)), mesh=mesh,
        particle_table=table)
    print(f"worker {kv.get('worker_id', 0)}/{kv.get('n_workers', 1)}: "
          f"{total} hadrons over its share of {n_batches} batches "
          f"(mean yield {ntot:.3f}/event)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
