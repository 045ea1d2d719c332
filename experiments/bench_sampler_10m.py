"""10M-cell single-chip sampler proof (round-5 VERDICT item 2).

The round-4 smooth kernels proved 10M cells on one 16 GB chip; the
sampler could not follow because phase A materialized ~4 (C, S) tables
(~51 GB at 10M x 444 species).  The cell-chunked driver
(kernels/sample._sample_cell_chunked) bounds phase A to
cfg.sampler_cell_chunk cells per chunk (auto: 2^19), so this run is the
memory proof: a full-species 10M-cell surface sampled end to end on one
chip, kept-hadron rate + peak HBM reported.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_sampler_10m.py \
           [n_cells] [nevents]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.surface import ThermoAverages
from is3d_tpu.kernels.sample import sample_particles
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)


def peak_hbm_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return float("nan")


def main():
    from is3d_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nevents = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dtype = jnp.float32
    cfg = Config(operation=2, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, precision="f32")
    print(f"surface: {n_cells} cells, full species list, nevents={nevents}")
    surface = synthetic_surface(n_cells, dimension=2, seed=1, dtype=dtype)
    species = synthetic_species(444, dtype=dtype)
    mcids = np.arange(1, 445, dtype=np.int32)
    df_data = synthetic_deltaf_data(dtype=dtype)
    plasma = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)

    t0 = time.perf_counter()
    ev = sample_particles(surface, species, mcids, None, df_data, cfg,
                          plasma, nevents=nevents, seed=1)
    t_cold = time.perf_counter() - t0
    n_cold = sum(len(e["mcid"]) for e in ev)
    print(f"cold (incl. compile): {len(ev)} events, {n_cold} hadrons, "
          f"{t_cold:.1f} s, peak HBM {peak_hbm_gb():.2f} GB")

    t0 = time.perf_counter()
    ev = sample_particles(surface, species, mcids, None, df_data, cfg,
                          plasma, nevents=nevents, seed=2)
    t_warm = time.perf_counter() - t0
    n = sum(len(e["mcid"]) for e in ev)
    print(f"warm: {n} hadrons in {t_warm:.1f} s -> "
          f"{n / t_warm / 1e3:.1f} k hadrons/s e2e, "
          f"peak HBM {peak_hbm_gb():.2f} GB")


if __name__ == "__main__":
    main()
