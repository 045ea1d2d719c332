"""Spacetime distributions (operation = 0) vs the spectra kernels."""

import numpy as np
import pytest

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
from is3d_tpu.kernels.dndx import spacetime_distributions
from is3d_tpu import observables

from test_smooth import (smash_table, df_data, pikp_species, random_cells,
                         to_surface)  # noqa: F401


BASE = Config(operation=0, dimension=2, df_mode=2, include_shear_deltaf=1,
              include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
              cell_chunk=16, tau_min=0.0, tau_max=12.0, tau_bins=60,
              r_min=0.0, r_max=12.0, r_bins=40)


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_dndx_total_matches_spectra_dNdy(smash_table, df_data, df_mode):
    """Summing the momentum-integrated per-cell dN/dy over cells must equal
    the pT-phi integral of the smooth spectra (same emission function)."""
    rng = np.random.default_rng(31)
    cells = random_cells(37, rng, dimension=2)
    surf = to_surface(cells)
    sp = pikp_species(smash_table)
    # fixed nodes: dN/dX always integrates at the common eta nodes, so the
    # spectra side must too for this shared-emission-function identity
    grid = native_momentum_grid(dimension=2, n_pT=12, n_phi=8, n_eta=16,
                                eta_mT_rescale=False)
    cfg = BASE.replace(df_mode=df_mode)

    dX = spacetime_distributions(surf, sp, grid, df_data, cfg)
    if df_mode in (1, 2):
        spectra = smooth_spectra(surf, sp, grid, df_data,
                                 cfg.replace(operation=1))
    else:
        spectra = smooth_spectra_feqmod(surf, sp, grid, df_data,
                                        cfg.replace(operation=1))
    want = np.asarray(observables.dN_dy(spectra, grid))[:, 0]
    np.testing.assert_allclose(dX["dN_dy"], want, rtol=1e-10, atol=1e-18)


def test_dndx_histograms_consistent(smash_table, df_data):
    """Bin sums reproduce the total dN/dy; bins outside the grid are empty."""
    rng = np.random.default_rng(33)
    cells = random_cells(25, rng, dimension=2)
    surf = to_surface(cells)
    sp = pikp_species(smash_table)
    grid = native_momentum_grid(dimension=2, n_pT=10, n_phi=8, n_eta=12)
    dX = spacetime_distributions(surf, sp, grid, df_data, BASE)

    # all cells lie in tau [1,8] x r [0, ~11.3]: raw histograms sum to dN_dy
    np.testing.assert_allclose(dX["raw_tau_hist"].sum(1), dX["dN_dy"],
                               rtol=1e-12)
    np.testing.assert_allclose(dX["raw_r_hist"].sum(1), dX["dN_dy"],
                               rtol=1e-12)

    # eta distribution integrates back to dN_dy with the eta weights
    w = np.asarray(grid.eta_weight)
    np.testing.assert_allclose(dX["dN_dydeta"] @ w, dX["dN_dy"], rtol=1e-12)


@pytest.mark.parametrize("df_mode", [3, 4])
def test_dndx_feqmod_partition_matches_unpartitioned(smash_table, df_data,
                                                     df_mode):
    """The breakdown partition of the feqmod dN/dX pass must reproduce the
    single both-branch dispatch on a surface mixing clean and strong-bulk
    breakdown cells (histograms are additive, routing is per-cell)."""
    rng = np.random.default_rng(44)
    n = 26
    cells = random_cells(n, rng, dimension=2)
    cells["bulkPi"][n // 2:] = -0.9 * cells["P"][n // 2:]
    surf = to_surface(cells)
    sp = pikp_species(smash_table)
    grid = native_momentum_grid(dimension=2, n_pT=8, n_phi=6, n_eta=12)
    cfg = BASE.replace(df_mode=df_mode, cell_chunk=8)

    ref = spacetime_distributions(surf, sp, grid, df_data,
                                  cfg.replace(feqmod_partition=0))
    got = spacetime_distributions(surf, sp, grid, df_data,
                                  cfg.replace(feqmod_partition_min_cells=1))
    for k in ("dN_dy", "dN_dydeta", "raw_tau_hist", "raw_r_hist",
              "dN_twopitaurdtaudrdy"):
        np.testing.assert_allclose(got[k], ref[k], rtol=5e-12, atol=1e-300,
                                   err_msg=k)


def test_dndx_3d_runs(smash_table, df_data):
    rng = np.random.default_rng(35)
    cells = random_cells(19, rng, dimension=3)
    surf = to_surface(cells)
    sp = pikp_species(smash_table)
    grid = native_momentum_grid(dimension=3, n_pT=8, n_phi=8, n_y=5)
    cfg = BASE.replace(dimension=3)
    dX = spacetime_distributions(surf, sp, grid, df_data, cfg)
    assert np.isfinite(dX["dN_dy"]).all() and (dX["dN_dy"] > 0).all()


def test_dndx_writer(tmp_path, smash_table, df_data):
    from is3d_tpu import writers
    rng = np.random.default_rng(36)
    cells = random_cells(9, rng, dimension=2)
    surf = to_surface(cells)
    sp = pikp_species(smash_table)
    grid = native_momentum_grid(dimension=2, n_pT=6, n_phi=6, n_eta=8)
    dX = spacetime_distributions(surf, sp, grid, df_data, BASE)
    writers.write_spacetime_distributions(dX, [211, -211, 321, -321, 2212, -2212],
                                          str(tmp_path))
    lines = open(f"{tmp_path}/spacetime_distribution/dN_taudtaudy_211.dat").read().splitlines()
    assert len(lines) == BASE.tau_bins
    assert len(lines[0].split("\t")) == 2
