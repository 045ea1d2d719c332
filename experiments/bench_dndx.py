"""Spacetime-distribution (operation 0, dN/dX) throughput, VH linear df.

The dN/dX kernel evaluates the same pointwise emission function as the
spectra kernel but reduces it to per-cell dN/dy + (tau, r) histograms
instead of a momentum-grid accumulator.  This bench tracks its eval
throughput at production shapes so layout work on the pointwise block is
measurable.  Fresh surface per rep + forced readback (serving-layer
countermeasures, see NOTES_ROUND1.md).

Usage: PYTHONPATH=. python experiments/bench_dndx.py [n_cells]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.dndx import spacetime_distributions
from is3d_tpu.testing import (synthetic_species, synthetic_surface,
                              synthetic_deltaf_data)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    dtype = jnp.float32
    sp = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype)
    df_syn = synthetic_deltaf_data(dtype=dtype)
    # df 3 (feqmod variant) runs in the production regime of the REAL
    # coefficient tables when available (breakdown fraction ~0, so the
    # breakdown partition routes everything to the feqmod-only kernel);
    # without them, fall back to the synthetic regime WITHOUT the
    # partition (>50% synthetic breakdown would recompile the split
    # kernels inside every timed rep)
    import os
    from bench_feqmod import REFERENCE, real_deltaf_data
    have_real = os.path.isdir(REFERENCE)
    if have_real:
        df_real = real_deltaf_data(dtype)
    else:
        print("NOTE: reference tables unavailable; df3 runs the synthetic "
              "(unphysical high-breakdown) regime, unpartitioned")
        df_real = df_syn
    for df_mode, df in ((1, df_syn), (3, df_real)):
        cfg = Config(dimension=2, df_mode=df_mode, include_shear_deltaf=1,
                     include_bulk_deltaf=1, include_baryondiff_deltaf=0,
                     regulate_deltaf=1, outflow=1, cell_chunk=65536,
                     precision="f32",
                     feqmod_partition=1 if have_real else 0)
        surf = synthetic_surface(n, dimension=2, seed=0, dtype=dtype)
        spacetime_distributions(surf, sp, grid, df, cfg)  # warmup/compile
        dts, checks = [], []
        for i in range(3):
            s = synthetic_surface(n, dimension=2, seed=100 + i, dtype=dtype)
            t0 = time.perf_counter()
            out = spacetime_distributions(s, sp, grid, df, cfg)
            checks.append(float(np.sum(out["dN_dy"])))
            dts.append(time.perf_counter() - t0)
        assert len(set(checks)) == 3, "distinct inputs must give distinct sums"
        ev = n * 320 * 32 * 24 * 48
        print(f"dN/dX 2+1D df{df_mode}: {ev / np.median(dts) / 1e9:.1f} "
              f"Geval/s ({n} cells, 320 species, 32x24x48)")


if __name__ == "__main__":
    main()
