"""Ensemble-batched vs per-event-loop throughput for small surfaces.

The use case batch.py exists for: event-by-event hydro ensembles of SMALL
2+1D surfaces (10k-100k cells each), where a per-event dispatch loop pays
per-call latency that a stacked vmap amortizes into one program.  Both
paths run the identical linear-df kernel on the identical events; the
metric is events/s (and the implied Geval/s) at equal total work.

Usage: python experiments/bench_batch.py [n_events] [cells_per_event] [reps]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.batch import stack_surfaces, batched_spectra_fn
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    dtype = jnp.float32
    cfg = Config(operation=1, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=4096,
                 precision="f32")
    species = synthetic_species(64, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype)
    df_data = synthetic_deltaf_data(dtype=dtype)
    evals_per_event = (n_cells * species.n_species * grid.n_pT
                       * grid.n_phi * grid.n_eta)

    surfaces = [synthetic_surface(n_cells, dimension=2, seed=s, dtype=dtype)
                for s in range(E)]
    stacked = stack_surfaces(surfaces)
    fn = jax.jit(batched_spectra_fn(species, grid, df_data, cfg,
                                    n_events=E))

    # warmup both paths (compile + serving first-readback)
    np.asarray(fn(stacked))
    np.asarray(smooth_spectra(surfaces[0], species, grid, df_data, cfg))

    for tag, run in (
        ("batched", lambda: np.asarray(fn(stacked))),
        ("loop", lambda: [np.asarray(smooth_spectra(
            s, species, grid, df_data, cfg)) for s in surfaces]),
    ):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(f"{tag:8s}: {t:8.3f} s  {E / t:8.1f} events/s  "
              f"{E * evals_per_event / t / 1e9:7.1f} Geval/s  "
              f"(reps {['%.3f' % x for x in times]})")


if __name__ == "__main__":
    main()
