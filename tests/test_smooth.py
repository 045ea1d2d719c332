"""Smooth Cooper-Frye kernel vs the independent numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.data import SpeciesArrays
from is3d_tpu.io import pdg, deltaf
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.io.surface import Surface
from is3d_tpu.kernels.smooth import smooth_spectra

from oracle import oracle_smooth_spectra, ideal_boltzmann_1cell_y0


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def smash_table(reference_dir):
    return pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=2)


@pytest.fixture(scope="module")
def df_data(reference_dir, smash_table):
    return deltaf.build_deltaf_data(f"{reference_dir}/deltaf_coefficients",
                                    hrg_eos=2, particle_table=smash_table,
                                    T_avg=0.155)


@pytest.fixture(scope="module")
def scipy_df_eval(reference_dir):
    """Independent coefficient evaluation for the oracle (scipy natural
    splines on the raw tables, muB = 0)."""
    from scipy.interpolate import CubicSpline
    T, muB, raw = deltaf.load_deltaf_tables(
        f"{reference_dir}/deltaf_coefficients", hrg_eos=2)
    sp = {k: CubicSpline(T, raw[k][0], bc_type="natural") for k in raw}

    def evaluate(Tq, muBq, E, P):
        T4 = Tq**4
        return dict(
            c0=float(sp["c0"](Tq)) / T4, c1=0.0,
            c2=float(sp["c2"](Tq)) / T4, c3=0.0, c4=0.0,
            F=float(sp["F"](Tq)) * Tq, G=0.0,
            betabulk=float(sp["betabulk"](Tq)) * T4,
            betaV=1.0,
            betapi=float(sp["betapi"](Tq)) * T4,
        )
    return evaluate


def pikp_species(table):
    ids = [211, -211, 321, -321, 2212, -2212]
    idx = pdg.chosen_indices(table, ids)
    return SpeciesArrays(
        mass=jnp.asarray(table.mass[idx]),
        sign=jnp.asarray(table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(table.gspin[idx]),
        baryon=jnp.asarray(table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=jnp.zeros(len(idx)),
        bulk_density=jnp.zeros(len(idx)),
        diff_density=jnp.zeros(len(idx)),
    )


def random_cells(n, rng, dimension):
    tau = rng.uniform(1.0, 8.0, n)
    cells = dict(
        tau=tau,
        x=rng.uniform(-5, 5, n), y=rng.uniform(-5, 5, n),
        eta=(rng.uniform(-2, 2, n) if dimension == 3 else np.zeros(n)),
        dat=rng.uniform(-0.2, 1.0, n), dax=rng.uniform(-0.5, 0.5, n),
        day=rng.uniform(-0.5, 0.5, n),
        dan=(rng.uniform(-0.1, 0.1, n) if dimension == 3 else np.zeros(n)),
        ux=rng.uniform(-0.7, 0.7, n), uy=rng.uniform(-0.7, 0.7, n),
        un=rng.uniform(-0.05, 0.05, n),
        T=rng.uniform(0.145, 0.165, n),
        E=rng.uniform(0.25, 0.4, n), P=rng.uniform(0.04, 0.08, n),
        pixx=rng.normal(0, 0.005, n), pixy=rng.normal(0, 0.003, n),
        pixn=rng.normal(0, 0.002, n), piyy=rng.normal(0, 0.005, n),
        piyn=rng.normal(0, 0.002, n),
        bulkPi=rng.normal(0, 0.003, n),
        muB=np.zeros(n), nB=np.zeros(n),
        Vx=np.zeros(n), Vy=np.zeros(n), Vn=np.zeros(n),
    )
    return cells


def to_surface(cells):
    return Surface(**{k: jnp.asarray(v) for k, v in cells.items()})


def grid_dicts(grid):
    g = {k: np.asarray(getattr(grid, k)) for k in
         ("pT", "phi", "y", "eta", "eta_weight")}
    return g


def run_both(cells, species_j, grid, df_data, scipy_df_eval, cfg):
    ours = np.asarray(smooth_spectra(to_surface(cells), species_j, grid,
                                     df_data, cfg))
    sp = {
        "mass": np.asarray(species_j.mass), "sign": np.asarray(species_j.sign),
        "degeneracy": np.asarray(species_j.degeneracy),
        "baryon": np.asarray(species_j.baryon),
    }
    df_eval = lambda T, muB, E, P: scipy_df_eval(T, muB, E, P)
    want = oracle_smooth_spectra(
        cells, sp, grid_dicts(grid), df_eval,
        df_mode=cfg.df_mode, dimension=cfg.dimension,
        include_shear=bool(cfg.include_shear_deltaf),
        include_bulk=bool(cfg.include_bulk_deltaf),
        include_baryon=bool(cfg.include_baryon),
        include_baryondiff=bool(cfg.include_baryondiff_deltaf),
        regulate_deltaf=bool(cfg.regulate_deltaf),
        outflow=bool(cfg.outflow))
    return ours, want


BASE_CFG = Config(operation=1, mode=1, dimension=2, df_mode=2,
                  include_shear_deltaf=1, include_bulk_deltaf=1,
                  regulate_deltaf=1, outflow=1, cell_chunk=16)


def test_ideal_1cell_semianalytic(smash_table, df_data):
    """The toy surface: 1 cell at rest, dsigma = (dat,0,0,0), no viscosity.
    Cross-check against the closed-form eta-quadrature expression."""
    grid = native_momentum_grid(dimension=2, n_pT=8, n_phi=6, n_eta=48,
                                eta_max=6.0, eta_mT_rescale=False)
    cells = dict(tau=np.array([0.5]), x=np.zeros(1), y=np.zeros(1),
                 eta=np.zeros(1), dat=np.array([1000.0]), dax=np.zeros(1),
                 day=np.zeros(1), dan=np.zeros(1), ux=np.zeros(1),
                 uy=np.zeros(1), un=np.zeros(1),
                 T=np.array([0.786 * 0.197327053]),
                 E=np.array([1.839 * 0.197327053]),
                 P=np.array([0.270 * 0.197327053]),
                 pixx=np.zeros(1), pixy=np.zeros(1), pixn=np.zeros(1),
                 piyy=np.zeros(1), piyn=np.zeros(1), bulkPi=np.zeros(1),
                 muB=np.zeros(1), nB=np.zeros(1), Vx=np.zeros(1),
                 Vy=np.zeros(1), Vn=np.zeros(1))
    cfg = BASE_CFG.replace(include_shear_deltaf=0, include_bulk_deltaf=0,
                           cell_chunk=4)
    species = pikp_species(smash_table)
    ours = np.asarray(smooth_spectra(to_surface(cells), species, grid,
                                     df_data, cfg))
    # Boltzmann analog: for the pion the quantum-statistics correction is a
    # few percent, so compare against the full oracle instead for precision,
    # and against the Boltzmann closed form loosely.
    etas, etaws = np.asarray(grid.eta), np.asarray(grid.eta_weight)
    for ipT in range(grid.n_pT):
        boltz = ideal_boltzmann_1cell_y0(
            float(species.mass[4]), float(species.degeneracy[4]),
            float(cells["T"][0]), 0.5, 1000.0, float(grid.pT[ipT]),
            etas, etaws)
        # proton: Boltzmann approx good to < 0.1%
        assert ours[4, ipT, 0, 0] == pytest.approx(boltz, rel=2e-3)
    # phi-independence for a cell at rest
    np.testing.assert_allclose(ours, np.broadcast_to(ours[:, :, :1, :], ours.shape),
                               rtol=1e-12)


@pytest.mark.parametrize("df_mode", [1, 2])
def test_vs_oracle_2d(smash_table, df_data, scipy_df_eval, df_mode):
    rng = np.random.default_rng(42)
    cells = random_cells(37, rng, dimension=2)
    grid = native_momentum_grid(dimension=2, n_pT=6, n_phi=5, n_eta=16,
                                eta_max=5.0, eta_mT_rescale=False)
    cfg = BASE_CFG.replace(df_mode=df_mode)
    ours, want = run_both(cells, pikp_species(smash_table), grid, df_data,
                          scipy_df_eval, cfg)
    np.testing.assert_allclose(ours, want, rtol=2e-7, atol=1e-18)


@pytest.mark.parametrize("df_mode", [1, 2])
def test_vs_oracle_3d(smash_table, df_data, scipy_df_eval, df_mode):
    rng = np.random.default_rng(7)
    cells = random_cells(23, rng, dimension=3)
    grid = native_momentum_grid(dimension=3, n_pT=5, n_phi=4, n_y=7, y_max=3.0)
    cfg = BASE_CFG.replace(df_mode=df_mode, dimension=3, cell_chunk=8)
    ours, want = run_both(cells, pikp_species(smash_table), grid, df_data,
                          scipy_df_eval, cfg)
    np.testing.assert_allclose(ours, want, rtol=2e-7, atol=1e-18)


def test_outflow_off(smash_table, df_data, scipy_df_eval):
    rng = np.random.default_rng(3)
    cells = random_cells(19, rng, dimension=2)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=12,
                                eta_mT_rescale=False)
    cfg = BASE_CFG.replace(outflow=0, regulate_deltaf=0)
    ours, want = run_both(cells, pikp_species(smash_table), grid, df_data,
                          scipy_df_eval, cfg)
    np.testing.assert_allclose(ours, want, rtol=2e-7, atol=1e-18)


def test_chunking_invariance(smash_table, df_data):
    rng = np.random.default_rng(11)
    cells = random_cells(41, rng, dimension=2)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=12)
    species = pikp_species(smash_table)
    surf = to_surface(cells)
    a = np.asarray(smooth_spectra(surf, species, grid, df_data,
                                  BASE_CFG.replace(cell_chunk=41)))
    b = np.asarray(smooth_spectra(surf, species, grid, df_data,
                                  BASE_CFG.replace(cell_chunk=8)))
    np.testing.assert_allclose(a, b, rtol=1e-13)


def test_slab_split_matches_single_dispatch(smash_table, df_data,
                                            scipy_df_eval):
    """Host-side slab splitting must be exactly a sum of partial spectra."""
    rng = np.random.default_rng(91)
    cells = random_cells(53, rng, dimension=2)
    species_j = pikp_species(smash_table)
    grid = native_momentum_grid(dimension=2, n_pT=5, n_phi=4, n_eta=8)
    cfg = Config(operation=1, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=8)
    one = smooth_spectra(to_surface(cells), species_j, grid, df_data,
                         cfg.replace(cell_slab=1 << 20))
    split = smooth_spectra(to_surface(cells), species_j, grid, df_data,
                           cfg.replace(cell_slab=16))
    np.testing.assert_allclose(np.asarray(split), np.asarray(one),
                               rtol=1e-12, atol=1e-22)


def test_eta_mT_rescale_converged_at_high_pT(smash_table, df_data):
    """The default native 2+1D grid (eta_mT_rescale=True) must be
    quadrature-converged out to the pT grid edge: vs a 2048-node fixed
    reference, <= 1e-3 relative on non-negligible values at n_eta = 48
    (the fixed-node grid loses up to 12% at pT = 4 GeV, n_eta = 64).
    Cells have nonzero u^eta so the flow-rapidity recentering is
    exercised."""
    rng = np.random.default_rng(77)
    cells = random_cells(24, rng, dimension=2)
    cells["un"] = rng.uniform(-0.1, 0.1, 24)
    species = pikp_species(smash_table)
    surf = to_surface(cells)
    cfg = BASE_CFG.replace(cell_chunk=8)
    gk = dict(dimension=2, n_pT=8, pT_max=4.0, n_phi=4)
    def rel_err(cfg_):
        ref = np.asarray(smooth_spectra(
            surf, species,
            native_momentum_grid(n_eta=2048, eta_max=8.0,
                                 eta_mT_rescale=False, **gk), df_data, cfg_))
        got = np.asarray(smooth_spectra(
            surf, species, native_momentum_grid(n_eta=48, **gk),
            df_data, cfg_))
        scale = np.abs(ref).max()
        return np.max(np.abs(got - ref) / np.maximum(np.abs(ref),
                                                     1e-5 * scale))

    # smooth integrand: converged to quadrature noise (measured 6e-5,
    # dominated by the outflow Theta(p.dsigma) cut; 3e-8 without it)
    assert rel_err(cfg.replace(regulate_deltaf=0)) < 2e-4
    # with |df| <= 1 regulation the integrand has a derivative kink whose
    # position no node placement can track; its O(h^2)-ish error is a
    # property of the regulated integrand (the reference shares it), and
    # is still 40x below the fixed-node grid's high-pT deficit
    assert rel_err(cfg) < 3e-3
