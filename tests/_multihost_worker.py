"""Subprocess worker for tests/test_multihost.py (not a test module).

Joins a jax.distributed CPU pod (each process contributes the local devices
its XLA_FLAGS forced), loads only its process_cell_slice of deterministic
synthetic surfaces, runs every multi-host kernel path (smooth VH spectra,
VAH spectra, spin polarization, dN/dX distributions), and saves the
replicated results for the parent to compare bit-for-bit against the
in-process single-host computations.
"""

import sys

import numpy as np


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


def _single_species(mass, sign, degeneracy=2.0, baryon=1.0):
    import jax.numpy as jnp
    from is3d_tpu.data import SpeciesArrays
    z = jnp.zeros(1)
    return SpeciesArrays(
        mass=jnp.asarray([mass]), sign=jnp.asarray([sign]),
        degeneracy=jnp.asarray([degeneracy]), baryon=jnp.asarray([baryon]),
        equilibrium_density=z, bulk_density=z, diff_density=z)


def polzn_fixtures():
    import jax.numpy as jnp
    from is3d_tpu.config import Config
    from is3d_tpu.io.surface import Surface, ThermoAverages
    from is3d_tpu.io.tables import native_momentum_grid
    cfg = Config(operation=1, mode=5, dimension=2, cell_chunk=4,
                 reduce_groups=8)
    n_global = 23
    rng = np.random.default_rng(91)
    n = n_global
    cells = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n), eta=np.zeros(n),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n), dan=np.zeros(n),
        ux=rng.uniform(-0.5, 0.5, n), uy=rng.uniform(-0.5, 0.5, n),
        un=rng.uniform(-0.02, 0.02, n),
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        wtx=rng.normal(0, 0.01, n), wty=rng.normal(0, 0.01, n),
        wtn=rng.normal(0, 0.01, n), wxy=rng.normal(0, 0.01, n),
        wxn=rng.normal(0, 0.01, n), wyn=rng.normal(0, 0.01, n),
    )
    surface = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    species = _single_species(1.11568, 1.0)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=10)
    plasma = ThermoAverages(0.155, 0.3, 0.05, 0.0, 0.0)
    return cfg, n_global, surface, species, grid, plasma


def vah_fixtures():
    import jax.numpy as jnp
    from is3d_tpu.config import Config
    from is3d_tpu.io.surface import Surface
    from is3d_tpu.io.tables import native_momentum_grid
    cfg = Config(operation=1, mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=4, reduce_groups=8)
    n_global = 29
    rng = np.random.default_rng(92)
    n = n_global
    cells = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n), eta=np.zeros(n),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n), dan=np.zeros(n),
        ux=rng.uniform(-0.5, 0.5, n), uy=rng.uniform(-0.5, 0.5, n),
        un=rng.uniform(-0.03, 0.03, n),
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        pitt=rng.normal(0, 0.002, n), pitx=rng.normal(0, 0.002, n),
        pity=rng.normal(0, 0.002, n), pitn=rng.normal(0, 0.001, n),
        pixx=rng.normal(0, 0.002, n), pixy=rng.normal(0, 0.002, n),
        pixn=rng.normal(0, 0.001, n), piyy=rng.normal(0, 0.002, n),
        piyn=rng.normal(0, 0.001, n), pinn=rng.normal(0, 0.001, n),
        bulkPi=rng.normal(0, 0.002, n),
        Wx=rng.normal(0, 0.002, n), Wy=rng.normal(0, 0.002, n),
        Lambda=rng.uniform(0.14, 0.17, n), aL=rng.uniform(0.6, 1.4, n),
    )
    surface = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    species = _single_species(0.139, -1.0, degeneracy=1.0, baryon=0.0)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=8)
    return cfg, n_global, surface, species, grid


def dndx_fixtures():
    import dataclasses
    cfg, n_global, surface, species, grid, df = fixtures()
    cfg = dataclasses.replace(cfg, operation=0, tau_bins=10, r_bins=8)
    return cfg, n_global, surface, species, grid, df


def feqmod_fixtures():
    """df_mode 3 with chunk routing forced on: the synthetic coefficient
    tables put a large fraction of cells in breakdown, so multiple routing
    arms (feqmod-only / fallback-only / both-branch chunks) are exercised
    across the pod."""
    import dataclasses
    cfg, n_global, surface, species, grid, df = fixtures()
    cfg = dataclasses.replace(cfg, df_mode=3, feqmod_partition_min_cells=1)
    return cfg, n_global, surface, species, grid, df


def feqmod_dndx_fixtures():
    import dataclasses
    cfg, n_global, surface, species, grid, df = feqmod_fixtures()
    cfg = dataclasses.replace(cfg, operation=0, tau_bins=10, r_bins=8)
    return cfg, n_global, surface, species, grid, df


def _slice(cols, start, stop):
    return {k: np.asarray(v)[start:stop] for k, v in cols.items()}


def compute_multihost(out: dict) -> None:
    """Run every multi-host kernel path; fill ``out`` with numpy results."""
    from is3d_tpu.parallel import multihost
    from is3d_tpu.kernels.common import surface_columns
    from is3d_tpu.kernels.vah import vah_surface_cols
    from is3d_tpu.kernels.polzn import polzn_cols
    from is3d_tpu.kernels.dndx import dndx_cols

    cfg, n_global, surface, species, grid, df = fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(surface_columns(surface, cfg), start, stop)
    out["smooth"] = np.asarray(multihost.smooth_spectra_multihost(
        cols, n_global, species, grid, df, cfg))

    cfg, n_global, surface, species, grid = vah_fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(vah_surface_cols(surface), start, stop)
    out["vah"] = np.asarray(multihost.smooth_spectra_vah_multihost(
        cols, n_global, species, grid, cfg))

    cfg, n_global, surface, species, grid, plasma = polzn_fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(polzn_cols(surface), start, stop)
    pol = multihost.spin_polarization_multihost(
        cols, n_global, species, grid, cfg, plasma)
    for k, v in pol.items():
        out[f"polzn_{k}"] = np.asarray(v)

    cfg, n_global, surface, species, grid, df = dndx_fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(dndx_cols(surface, cfg), start, stop)
    dnx = multihost.spacetime_distributions_multihost(
        cols, n_global, species, grid, df, cfg)
    for k in ("dN_dy", "dN_dydeta", "dN_taudtaudy", "dN_twopirdrdy",
              "dN_twopitaurdtaudrdy"):
        out[f"dndx_{k}"] = np.asarray(dnx[k])

    # feqmod paths: the SAME slice-local contract as every other kernel
    # (in-kernel chunk routing; no global partition decision exists)
    cfg, n_global, surface, species, grid, df = feqmod_fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(surface_columns(surface, cfg), start, stop)
    out["feqmod"] = np.asarray(multihost.feqmod_spectra_multihost(
        cols, n_global, species, grid, df, cfg))

    cfg, n_global, surface, species, grid, df = feqmod_dndx_fixtures()
    start, stop = multihost.process_cell_slice(cfg, n_global)
    cols = _slice(dndx_cols(surface, cfg), start, stop)
    dnx = multihost.feqmod_spacetime_distributions_multihost(
        cols, n_global, species, grid, df, cfg)
    for k in ("dN_dy", "dN_taudtaudy", "dN_twopitaurdtaudrdy"):
        out[f"feqmod_dndx_{k}"] = np.asarray(dnx[k])


def compute_inprocess() -> dict:
    """The single-host references the pod results must match bit-for-bit."""
    from is3d_tpu.kernels.smooth import smooth_spectra
    from is3d_tpu.kernels.vah import smooth_spectra_vah
    from is3d_tpu.kernels.polzn import spin_polarization
    from is3d_tpu.kernels.dndx import spacetime_distributions
    out = {}
    cfg, _, surface, species, grid, df = fixtures()
    out["smooth"] = np.asarray(smooth_spectra(surface, species, grid, df, cfg))
    cfg, _, surface, species, grid = vah_fixtures()
    out["vah"] = np.asarray(smooth_spectra_vah(surface, species, grid, cfg))
    cfg, _, surface, species, grid, plasma = polzn_fixtures()
    for k, v in spin_polarization(surface, species, grid, cfg,
                                  plasma).items():
        out[f"polzn_{k}"] = np.asarray(v)
    cfg, _, surface, species, grid, df = dndx_fixtures()
    dnx = spacetime_distributions(surface, species, grid, df, cfg)
    for k in ("dN_dy", "dN_dydeta", "dN_taudtaudy", "dN_twopirdrdy",
              "dN_twopitaurdtaudrdy"):
        out[f"dndx_{k}"] = np.asarray(dnx[k])
    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    cfg, _, surface, species, grid, df = feqmod_fixtures()
    out["feqmod"] = np.asarray(
        smooth_spectra_feqmod(surface, species, grid, df, cfg))
    cfg, _, surface, species, grid, df = feqmod_dndx_fixtures()
    dnx = spacetime_distributions(surface, species, grid, df, cfg)
    for k in ("dN_dy", "dN_taudtaudy", "dN_twopitaurdtaudrdy"):
        out[f"feqmod_dndx_{k}"] = np.asarray(dnx[k])
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_dir = sys.argv[3], sys.argv[4]
    from is3d_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)

    out = {}
    compute_multihost(out)
    np.savez(f"{out_dir}/proc{pid}.npz", **out)


if __name__ == "__main__":
    main()
