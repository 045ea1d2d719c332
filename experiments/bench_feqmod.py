"""Modified-equilibrium (feqmod) spectra kernel throughput, df modes 3/4.

The feqmod kernel evaluates BOTH the modified-equilibrium branch (momentum
transform at the scaled rapidity) and the linearized fallback per point,
then masks per cell -- roughly twice the per-point work of the linear-df
kernel.  This bench pins its eval rate at production shapes.  Fresh
surface per rep + forced readback (serving countermeasures,
NOTES_ROUND1.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_feqmod.py [n_cells]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
from is3d_tpu.testing import (synthetic_species, synthetic_surface,
                              synthetic_deltaf_data)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    dtype = jnp.float32
    sp = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype)
    df = synthetic_deltaf_data(dtype=dtype)
    for df_mode in (3, 4):
        cfg = Config(dimension=2, df_mode=df_mode, include_shear_deltaf=1,
                     include_bulk_deltaf=1, include_baryondiff_deltaf=0,
                     include_baryon=0, regulate_deltaf=1, outflow=1,
                     cell_chunk=65536, precision="f32")
        surf = synthetic_surface(n, dimension=2, seed=0, dtype=dtype)
        smooth_spectra_feqmod(surf, sp, grid, df, cfg)  # warmup/compile
        dts, checks = [], []
        for i in range(3):
            s = synthetic_surface(n, dimension=2, seed=100 + i, dtype=dtype)
            t0 = time.perf_counter()
            out = np.asarray(smooth_spectra_feqmod(s, sp, grid, df, cfg))
            checks.append(float(out.sum()))
            dts.append(time.perf_counter() - t0)
        assert len(set(checks)) == 3, "distinct inputs must give distinct sums"
        ev = n * 320 * 32 * 24 * grid.n_eta
        print(f"feqmod 2+1D df{df_mode}: {ev / np.median(dts) / 1e9:.1f} "
              f"Geval/s ({n} cells, 320 species, 32x24x{grid.n_eta})")


if __name__ == "__main__":
    main()
