"""Subprocess worker for tests/test_multihost.py (not a test module).

Joins a jax.distributed CPU pod (each process contributes the local devices
its XLA_FLAGS forced), loads only its process_cell_slice of a deterministic
synthetic surface, runs the multi-host smooth-spectra path, and saves the
replicated result for the parent to compare bit-for-bit against the
in-process single-host computation.
"""

import sys


def fixtures():
    from is3d_tpu.config import Config
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                                  synthetic_deltaf_data)
    cfg = Config(operation=1, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 include_baryon=1, include_baryondiff_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=8, reduce_groups=8)
    n_global = 37          # not a multiple of the group count or device count
    surface = synthetic_surface(n_global, dimension=2, seed=3)
    species = synthetic_species(5)
    grid = native_momentum_grid(dimension=2, n_pT=8, n_phi=6, n_eta=12)
    df = synthetic_deltaf_data()
    return cfg, n_global, surface, species, grid, df


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out = sys.argv[3], sys.argv[4]
    from is3d_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)

    import numpy as np
    from is3d_tpu.kernels.common import surface_columns
    cfg, n_global, surface, species, grid, df = fixtures()
    cols = surface_columns(surface, cfg)
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols_local = {k: np.asarray(v)[start:stop] for k, v in cols.items()}
    spec = multihost.smooth_spectra_multihost(cols_local, n_global, species,
                                              grid, df, cfg)
    np.save(f"{out}/proc{pid}.npy", np.asarray(spec))


if __name__ == "__main__":
    main()
