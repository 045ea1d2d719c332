"""End-to-end 1M-cell smooth-spectra measurement (the COVERAGE.md headline).

Full-scale single-chip pass: 1M cells x 320 species x 32x24x21 grid,
slab-split dispatches, fresh surface, forced readback.  df modes 1/2 run
the linear-df kernel; 3/4 run the partitioned feqmod kernel with the
REAL shipped coefficient tables (production breakdown regime).
Usage: python experiments/bench_1m_e2e.py [n_cells] [df_mode]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    df_mode = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype = jnp.float32
    cfg = Config(operation=1, mode=1, dimension=3, df_mode=df_mode,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=512,
                 precision="f32")
    species = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=3, n_pT=32, n_phi=24, n_y=21,
                                dtype=dtype)
    if df_mode in (3, 4):
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_feqmod import REFERENCE, real_deltaf_data
        if not os.path.isdir(REFERENCE):
            sys.exit(f"df_mode {df_mode} needs the real coefficient tables "
                     f"({REFERENCE}); the synthetic tables put >50% of "
                     "cells in breakdown, which is not the production "
                     "regime this bench reports")
        df_data = real_deltaf_data(dtype)
        kernel = smooth_spectra_feqmod
    else:
        df_data = synthetic_deltaf_data(dtype=dtype)
        kernel = smooth_spectra

    # warm-up with the SAME n_cells compiles every slab shape incl. the
    # remainder slab (n_cells % cell_slab); a partial warm-up would leave
    # one compile inside the timed window
    s = synthetic_surface(n_cells, dimension=3, seed=0, dtype=dtype)
    float(jnp.sum(kernel(s, species, grid, df_data, cfg)))

    s = synthetic_surface(n_cells, dimension=3, seed=7, dtype=dtype)
    t0 = time.perf_counter()
    out = kernel(s, species, grid, df_data, cfg)
    chk = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    ev = n_cells * 320 * 32 * 24 * 21
    print(f"{n_cells} cells df{df_mode} end to end: {dt:.1f} s "
          f"({ev/dt/1e9:.1f} Geval/s; checksum {chk:.4e})")


if __name__ == "__main__":
    main()
