"""Headline benchmark: smooth Cooper-Frye throughput on one chip.

Metric: Cooper-Frye (cell x species x momentum-point) evaluations per second
per chip on the reference momentum grid (32 pT x 24 phi x 21 y, 3+1D), full
hadron list scale (320 species).

Baseline (BASELINE.md north star): a 1M-cell full-list smooth-spectra pass in
30 s on a v5e-8, i.e. 1e6 * 320 * 32*24*21 / 30 / 8 = 2.15e10 evals/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from is3d_tpu.config import Config
    from is3d_tpu.kernels.smooth import smooth_spectra
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                                  synthetic_deltaf_data)

    dtype = jnp.float32
    n_cells = 131072
    n_species = 320
    cfg = Config(operation=1, mode=1, dimension=3, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=512,
                 precision="f32")

    surface = synthetic_surface(n_cells, dimension=3, seed=1, dtype=dtype)
    species = synthetic_species(n_species, dtype=dtype)
    grid = native_momentum_grid(dimension=3, n_pT=32, n_phi=24, n_y=21,
                                dtype=dtype)
    df_data = synthetic_deltaf_data(dtype=dtype)

    # a FRESH host-generated surface per repetition: the serving layer
    # caches repeated dispatches (even on-device-perturbed inputs have been
    # observed to hit it), which silently inflates naive benchmarks

    # on a multi-chip rig, shard the cell axis over the full mesh and
    # report the per-chip rate (single JSON line either way)
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from is3d_tpu.parallel.mesh import default_mesh, smooth_spectra_sharded
        mesh = default_mesh(axis=cfg.mesh_axis)

    def dispatch(s):
        if mesh is not None:
            return smooth_spectra_sharded(s, species, grid, df_data, cfg,
                                          mesh=mesh)
        return smooth_spectra(s, species, grid, df_data, cfg)

    def run(seed):
        s = synthetic_surface(n_cells, dimension=3, seed=seed, dtype=dtype)
        return dispatch(s)

    float(jnp.sum(run(0)))               # compile + warm up
    # >=5 timed reps; the canonical number is the MEDIAN and the JSON
    # carries the min/max band so a single noisy rig draw (observed ~4%
    # in round 3) can no longer masquerade as a regression
    reps = 5
    dts = []
    checks = []
    for i in range(reps):
        s = synthetic_surface(n_cells, dimension=3, seed=100 + i, dtype=dtype)
        t0 = time.perf_counter()
        out = dispatch(s)
        # force a device-to-host readback: async dispatch layers have been
        # observed to return from block_until_ready before execution
        checks.append(float(jnp.sum(out)))
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    assert len(set(checks)) == reps, "distinct inputs must give distinct sums"

    evals = n_cells * n_species * 32 * 24 * 21
    value = evals / dt / max(1, n_dev)
    baseline = 1e6 * 320 * 32 * 24 * 21 / 30.0 / 8.0
    rates = sorted(evals / d / max(1, n_dev) for d in dts)
    print(json.dumps({
        "metric": "cooper_frye_evals_per_sec_per_chip",
        "value": value,
        "unit": "evals/s/chip",
        "vs_baseline": value / baseline,
        "reps": reps,
        "min": rates[0],
        "max": rates[-1],
    }))


def _main_with_retry():
    # the serving tunnel occasionally drops a dispatch with a transient
    # backend error (observed: JaxRuntimeError FAILED_PRECONDITION on a
    # first post-idle run); the driver invokes this once per round, so
    # retry in a fresh attempt instead of reporting a red benchmark
    for attempt in range(3):
        try:
            return main()
        except Exception as e:               # noqa: BLE001
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed "
                  f"({type(e).__name__}: {e}); retrying",
                  file=sys.stderr)
            time.sleep(10)


if __name__ == "__main__":
    sys.exit(_main_with_retry())
