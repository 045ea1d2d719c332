"""Sampled elliptic flow vs continuous vn, plus error-path robustness."""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config, load_config
from is3d_tpu.io.surface import Surface, read_surface
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu.kernels.sample import sample_particles
from is3d_tpu import observables

from test_sampler import species_with_densities, MCIDS, PLASMA
from test_smooth import smash_table, df_data  # noqa: F401


def flow_surface(n=64, eps=0.15, u0=0.45):
    """Azimuthally elliptic 2+1D surface: radial flow modulated by
    (1 + eps cos 2 phi_s) -> nonzero v2 with a known sign."""
    phi_s = np.linspace(0, 2 * np.pi, n, endpoint=False)
    umag = u0 * (1 + eps * np.cos(2 * phi_s))
    z = np.zeros(n)
    cells = dict(
        tau=np.full(n, 5.0), x=5.0 * np.cos(phi_s), y=5.0 * np.sin(phi_s),
        eta=z, dat=np.full(n, 0.5), dax=0.1 * np.cos(phi_s),
        day=0.1 * np.sin(phi_s), dan=z,
        ux=umag * np.cos(phi_s), uy=umag * np.sin(phi_s), un=z,
        T=np.full(n, 0.155), E=np.full(n, 0.33), P=np.full(n, 0.057),
        pixx=z, pixy=z, pixn=z, piyy=z, piyn=z, bulkPi=z,
        muB=z, nB=z, Vx=z, Vy=z, Vn=z,
    )
    return Surface(**{k: jnp.asarray(v) for k, v in cells.items()})


def test_sampled_v2_matches_continuous(smash_table, df_data):
    surf = flow_surface()
    y_cut = 3.0
    cfg = Config(operation=2, dimension=2, df_mode=1, include_shear_deltaf=0,
                 include_bulk_deltaf=0, regulate_deltaf=1, outflow=1,
                 y_cut=y_cut, sampler_seed=77)
    sp = species_with_densities(smash_table, 0.155)

    grid = native_momentum_grid(dimension=2, n_pT=24, pT_max=4.0, n_phi=48,
                                n_eta=32)
    spectra = smooth_spectra(surf, sp, grid, df_data,
                             cfg.replace(operation=1, cell_chunk=32))
    vn, _ = observables.continuous_vn(spectra, grid)
    # pT-integrated pion v2 from the smooth spectra
    w = np.asarray(grid.pT_weight) * np.asarray(grid.pT)
    dN = np.asarray(observables.dN_twopipTdpTdy(spectra, grid))[0, :, 0]
    v2_pt = np.asarray(vn)[0, 1, :, 0]
    v2_smooth = np.sum(w * dN * v2_pt) / np.sum(w * dN)
    assert v2_smooth > 0.01   # the construction produces real elliptic flow

    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=400)
    mc = np.concatenate([e["mcid"] for e in events])
    px = np.concatenate([e["px"] for e in events])
    py = np.concatenate([e["py"] for e in events])
    pi = np.abs(mc) == 211
    phi = np.arctan2(py[pi], px[pi])
    # event plane is x-axis by construction
    v2_sampled = np.cos(2 * phi).mean()
    sigma = np.sqrt(0.5 / pi.sum())
    assert abs(v2_sampled - v2_smooth) < 5 * sigma + 0.01, \
        (v2_sampled, v2_smooth, pi.sum())


# ------------------------------------------------------------ error paths

def test_unknown_parameter_strict():
    with pytest.raises(KeyError):
        load_config(text="nonsense_knob = 3", strict=True)
    cfg = load_config(text="nonsense_knob = 3")   # tolerant by default
    assert cfg.operation == 1


def test_bad_mode_rejected():
    with pytest.raises(ValueError):
        read_surface("1 2 3", mode=9, dimension=2)


def test_column_mismatch_message_names_mode():
    with pytest.raises(ValueError, match="mode"):
        read_surface("1 2 3 4 5", mode=1, dimension=2)


def test_dimension2_nonzero_dan_rejected():
    # mode 3 exits on dsigma_eta != 0 in 2+1D (readindata.cpp:959-963)
    from is3d_tpu.io.surface import expected_columns
    ncols = expected_columns(3, False, False)
    vals = [1, 0, 0, 0, 0.5, 0, 0, 0.3] + [1] * (ncols - 8)
    text = " ".join(str(v) for v in vals)
    with pytest.raises(ValueError, match="dsigma_eta|dan"):
        read_surface(text, mode=3, dimension=2)


def test_smooth_rejects_feqmod_modes(smash_table, df_data):
    from is3d_tpu.io.tables import native_momentum_grid
    surf = flow_surface(8)
    sp = species_with_densities(smash_table, 0.155)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=4)
    with pytest.raises(ValueError, match="modes 1-2"):
        smooth_spectra(surf, sp, grid, df_data, Config(df_mode=3))


def test_vah_dndx_runs_and_matches_spectra():
    """Operation 0 on VAH surfaces (modes 2-3): a capability the reference
    lacks entirely (its MODE-2 kernel block is dead code with no dN/dX
    path even commented out).  The momentum-integrated per-cell dN/dy must
    match the pT-phi integral of fixed-node VAH spectra -- the identical
    emission function reduced two ways."""
    from is3d_tpu.io.surface import Surface
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.kernels.dndx import spacetime_distributions
    from is3d_tpu.kernels.vah import smooth_spectra_vah
    from is3d_tpu.data import SpeciesArrays
    from is3d_tpu import observables
    from test_vah import make_vah_cells
    import jax.numpy as jnp

    rng = np.random.default_rng(81)
    cells = make_vah_cells(15, rng, dimension=2)
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    grid = native_momentum_grid(dimension=2, n_pT=10, n_phi=6, n_eta=96)
    cfg = Config(operation=0, mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=8, tau_min=0.0, tau_max=12.0, tau_bins=20,
                 r_min=0.0, r_max=12.0, r_bins=15)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]),
                       baryon=jnp.asarray([0.0]), equilibrium_density=z,
                       bulk_density=z, diff_density=z)
    dX = spacetime_distributions(surf, sp, grid, None, cfg)
    # fixed-node spectra (same discretization as the dN/dX integrand)
    spectra = smooth_spectra_vah(
        surf, sp, grid.replace(eta_mT_rescale=False),
        cfg.replace(operation=1))
    # smooth_spectra_vah always applies its aL rescale; compare at the
    # physics level with a tolerance absorbing the quadrature difference
    want = np.asarray(observables.dN_dy(spectra, grid))[:, 0]
    np.testing.assert_allclose(dX["dN_dy"], want, rtol=2e-3)  # fixed-node
    # dN/dX vs adaptive-node spectra: difference is pure eta-quadrature error
    # histogram consistency: binned totals equal the momentum-integrated sum
    np.testing.assert_allclose(dX["raw_tau_hist"].sum(), dX["dN_dy"].sum(),
                               rtol=1e-10)
