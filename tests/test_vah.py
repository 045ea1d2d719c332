"""VAH anisotropic-hydro spectra kernel vs a direct numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.data import SpeciesArrays
from is3d_tpu.io.surface import Surface, read_surface
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.vah import smooth_spectra_vah
from is3d_tpu.units import CF_PREFACTOR
from is3d_tpu.physics.anisotropic import aL_fit, R200


def make_vah_cells(n, rng, dimension=2):
    return dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n),
        eta=(rng.uniform(-1, 1, n) if dimension == 3 else np.zeros(n)),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n),
        dan=(rng.uniform(-0.05, 0.05, n) if dimension == 3 else np.zeros(n)),
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


def oracle_vah(cells, mass, sign, deg, grid, cfg, remap=True):
    """Direct numpy integral.  remap=True mirrors the kernel's
    mT-adaptive eta-node map node-exactly; remap=False integrates on the
    grid's raw (fixed) eta nodes -- with a dense wide grid that is the
    ground truth any node map must converge to."""
    pT = np.asarray(grid.pT); phi = np.asarray(grid.phi)
    eta = np.asarray(grid.eta); etaw = np.asarray(grid.eta_weight)
    ys = [0.0] if cfg.dimension == 2 else list(np.asarray(grid.y))
    out = np.zeros((len(pT), len(phi), len(ys)))
    n = len(cells["tau"])
    for ic in range(n):
        tau = cells["tau"][ic]; tau2 = tau * tau
        ux, uy, un = cells["ux"][ic], cells["uy"][ic], cells["un"][ic]
        ut = np.sqrt(1 + ux**2 + uy**2 + tau2 * un**2)
        u0 = np.sqrt(1 + ux**2 + uy**2)
        zt, zn = tau * un / u0, ut / (u0 * tau)
        Wx, Wy = cells["Wx"][ic], cells["Wy"][ic]
        Wt = (ux * Wx + uy * Wy) * ut / u0**2
        Wn = Wt * un / ut
        lam, aL = cells["Lambda"][ic], cells["aL"][ic]
        xiL = 1.0 / aL**2 - 1.0
        for i, pt_ in enumerate(pT):
            mT = np.sqrt(mass**2 + pt_**2)
            if cfg.dimension == 2 and remap:
                # same exact eta -> -y_flow + s*eta substitution the
                # kernel applies, s = aL sqrt(lam / max(mT, lam)) (resolves
                # the narrowed integrand at high mT, centered on the cell's
                # longitudinal-flow rapidity; jacobian in the weight)
                s = aL * np.sqrt(lam / max(mT, lam))
                y_flow = np.arctanh(tau * un / ut)
                etas, ws = -y_flow + s * eta, s * etaw
            elif cfg.dimension == 2:
                etas, ws = eta, etaw
            else:
                etas, ws = [cells["eta"][ic]], [1.0]
            for j, ph in enumerate(phi):
                px, py = pt_ * np.cos(ph), pt_ * np.sin(ph)
                for k, yv in enumerate(ys):
                    for e, w in zip(etas, ws):
                        ptau = mT * np.cosh(yv - e)
                        pn = mT / tau * np.sinh(yv - e)
                        pds = (ptau * cells["dat"][ic] + px * cells["dax"][ic]
                               + py * cells["day"][ic] + pn * cells["dan"][ic])
                        pdotu = ptau * ut - px * ux - py * uy - tau2 * pn * un
                        pdotz = ptau * zt - tau2 * pn * zn
                        Ea = np.sqrt(pdotu**2 + xiL * pdotz**2)
                        fa = 1.0 / (np.exp(Ea / lam) + sign)
                        fabar = 1.0 - sign * fa
                        df = 0.0
                        if cfg.include_shear_deltaf:
                            Wp = Wt * ptau - Wx * px - Wy * py - tau2 * pn * Wn
                            pipp = (cells["pitt"][ic] * ptau**2
                                    + cells["pixx"][ic] * px**2
                                    + cells["piyy"][ic] * py**2
                                    + cells["pinn"][ic] * (tau2 * pn)**2
                                    + 2 * (-(cells["pitx"][ic] * px
                                             + cells["pity"][ic] * py) * ptau
                                           + cells["pixy"][ic] * px * py
                                           + tau2 * pn * (cells["pixn"][ic] * px
                                                          + cells["piyn"][ic] * py
                                                          - cells["pitn"][ic] * ptau)))
                            df += 0.1 * pdotz * Wp + 0.2 * pipp  # c3, c4
                        if cfg.include_bulk_deltaf:
                            df += (0.3 * mass**2 + 0.05 * pdotz**2
                                   + 0.07 * pdotu**2) * cells["bulkPi"][ic]
                        f = fa * (1 + np.clip(fabar * df, -1, 1)
                                  if cfg.regulate_deltaf else 1 + fabar * df)
                        if cfg.outflow and pds <= 0:
                            continue
                        out[i, j, k] += w * pds * f
    return CF_PREFACTOR * deg * out


def test_vah_vs_oracle_2d():
    rng = np.random.default_rng(51)
    cells = make_vah_cells(6, rng)
    cells["c0"] = np.full(6, 0.3)
    cells["c1"] = np.full(6, 0.05)
    cells["c2"] = np.full(6, 0.07)
    cells["c3"] = np.full(6, 0.1)
    cells["c4"] = np.full(6, 0.2)
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=4)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=8)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]), baryon=jnp.asarray([0.0]),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    surf_cols = {k: jnp.asarray(v) for k, v in cells.items()
                 if k not in ("c0", "c1", "c2", "c3", "c4")}
    surf = Surface(**surf_cols)
    from is3d_tpu.kernels.vah import _vah_jit
    cols = dict(tau=surf.tau, dat=surf.dat, dax=surf.dax, day=surf.day,
                dan=surf.dan, ux=surf.ux, uy=surf.uy, un=surf.un,
                eta=surf.eta, Lambda=surf.Lambda, aL=surf.aL,
                bulkPi=surf.bulkPi, Wx=surf.Wx, Wy=surf.Wy)
    for nm in ("pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
               "piyy", "piyn", "pinn"):
        cols[nm] = getattr(surf, nm)
    for nm in ("c0", "c1", "c2", "c3", "c4"):
        cols[nm] = jnp.asarray(cells[nm])
    got = np.asarray(_vah_jit(cols, sp, grid, cfg))[0]
    want = oracle_vah(cells, 0.139, -1.0, 1.0, grid, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-16)


def test_vah_3d_runs():
    rng = np.random.default_rng(52)
    cells = make_vah_cells(5, rng, dimension=3)
    cfg = Config(mode=2, dimension=3, include_shear_deltaf=0,
                 include_bulk_deltaf=0, outflow=1, cell_chunk=2)
    grid = native_momentum_grid(dimension=3, n_pT=3, n_phi=4, n_y=3)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]), baryon=jnp.asarray([0.0]),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    got = np.asarray(smooth_spectra_vah(surf, sp, grid, cfg))
    assert np.isfinite(got).all() and (got > 0).any()


def test_vah_reader_roundtrip():
    """Mode-2 reader computes (aL, Lambda) consistent with the fit."""
    rng = np.random.default_rng(53)
    n = 3
    base = np.zeros((n, 31))
    base[:, 0] = rng.uniform(1, 4, n)                  # tau
    base[:, 4] = rng.uniform(0.1, 0.5, n)              # dat
    base[:, 8] = 1.0                                   # ut (ignored)
    base[:, 12] = rng.uniform(1.2, 1.8, n)             # E (fm^-4)
    base[:, 13] = rng.uniform(0.75, 0.80, n)           # T
    base[:, 14] = rng.uniform(0.22, 0.28, n)           # P
    base[:, 15] = base[:, 14] * rng.uniform(0.5, 1.5, n)  # PL
    text = "\n".join(" ".join(f"{v:.17e}" for v in r) for r in base)
    surf, _ = read_surface(text, mode=2, dimension=2)
    ratio = base[:, 15] / base[:, 14]
    aL = aL_fit(ratio)
    np.testing.assert_allclose(np.asarray(surf.aL), aL, rtol=1e-12)
    lam = base[:, 13] / (0.5 * aL * R200(aL)) ** 0.25 * 0.197327053
    np.testing.assert_allclose(np.asarray(surf.Lambda), lam, rtol=1e-12)


def test_vah_eta_quadrature_converged_at_high_pT():
    """The mT-dependent eta-node rescale must keep the narrow (y - eta)
    integrand resolved out to the pT grid edge: default-resolution spectra
    vs a 1024-node reference <= 1e-4 relative everywhere (round-1 weak spot:
    the a_L-only rescale was 6% low at pT = 4 GeV with n_eta = 48)."""
    rng = np.random.default_rng(321)
    cells = make_vah_cells(24, rng, dimension=2)
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=8)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]), baryon=jnp.asarray([0.0]),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    ref_grid = native_momentum_grid(dimension=2, n_pT=8, pT_max=4.0,
                                    n_phi=4, n_eta=1024)
    ref = np.asarray(smooth_spectra_vah(surf, sp, ref_grid, cfg))
    g = native_momentum_grid(dimension=2, n_pT=8, pT_max=4.0, n_phi=4,
                             n_eta=48)
    got = np.asarray(smooth_spectra_vah(surf, sp, g, cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_vah_eta_quadrature_converged_under_strong_flow():
    """The eta-node span must stay centered on the cell's
    longitudinal-flow rapidity: with tau*un large (y_flow ~ 0.7-0.95,
    beyond the s(mT)-narrowed span s*eta_max ~ 0.8 at the pT = 4 GeV
    grid edge) an uncentered map loses the integrand peak entirely.
    The reference here is the GROUND-TRUTH integral on dense FIXED
    nodes over the full eta range (remap=False oracle) -- a dense run
    of the remapped kernel itself would share the remap's domain and
    could not detect mis-centering."""
    rng = np.random.default_rng(654)
    n = 6
    cells = make_vah_cells(n, rng, dimension=2)
    cells["tau"] = rng.uniform(8.0, 10.0, n)
    cells["un"] = rng.uniform(0.09, 0.13, n) * rng.choice([-1, 1], n)
    cells["c0"] = np.full(n, 0.3); cells["c1"] = np.full(n, 0.05)
    cells["c2"] = np.full(n, 0.07); cells["c3"] = np.full(n, 0.1)
    cells["c4"] = np.full(n, 0.2)
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=6)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]), baryon=jnp.asarray([0.0]),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    truth_grid = native_momentum_grid(dimension=2, n_pT=4, pT_max=4.0,
                                      n_phi=2, n_eta=2048, eta_max=8.0)
    truth = oracle_vah(cells, 0.139, -1.0, 1.0, truth_grid, cfg,
                       remap=False)
    g = native_momentum_grid(dimension=2, n_pT=4, pT_max=4.0, n_phi=2,
                             n_eta=48)
    from is3d_tpu.kernels.vah import _vah_jit
    cols = {k: jnp.asarray(v) for k, v in cells.items()
            if k not in ("x", "y", "T", "E", "P")}
    got = np.asarray(_vah_jit(cols, sp, g, cfg))[0]
    # centered map measures <= 1.6e-5 here; the uncentered one is ~15x
    # worse (2.2e-4 at the pT edge: the narrowed span's edge clips the
    # flow-shifted peak), so 1e-4 discriminates with margin both ways
    np.testing.assert_allclose(got, truth, rtol=1e-4)


def _vah_file_text(mode, n=3, seed=9):
    """Synthetic mode-2/3 surface file text (raw fm units; read_surface
    multiplies by hbarC)."""
    from is3d_tpu.units import HBARC
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        tau = rng.uniform(2, 6)
        pos = [tau, rng.uniform(-5, 5), rng.uniform(-5, 5), 0.0]
        da = [rng.uniform(0.1, 0.6), rng.uniform(-0.2, 0.2),
              rng.uniform(-0.2, 0.2), 0.0]
        ux, uy = rng.uniform(-0.3, 0.3, 2)
        u = [np.sqrt(1 + ux**2 + uy**2), ux, uy, 0.0]
        E, T, P = 0.4 / HBARC, 0.155 / HBARC, 0.08 / HBARC
        pi = list(rng.uniform(-1e-3, 1e-3, 10))
        W = list(rng.uniform(-1e-3, 1e-3, 4))
        if mode == 2:
            PL = P * rng.uniform(0.5, 1.5)
            rows.append(pos + da + u + [E, T, P, PL] + pi + W + [0.01])
        else:
            PL = P * rng.uniform(0.5, 1.5)
            PT = P * rng.uniform(0.5, 1.5)
            Lam = 0.16 / HBARC
            rows.append(pos + da + u + [E, T, PL, PT] + pi + W
                        + [Lam, 1.1, 0.8])
    return "\n".join(" ".join(f"{v:.8e}" for v in r) for r in rows)


@pytest.mark.parametrize("mode", [2, 3])
def test_vah_reader_returns_thermo_averages(mode):
    """The full file path for VAH surfaces needs in-memory ThermoAverages
    (deltaf T_avg, sampler plasma); returning None crashed
    run_particlization before any VAH kernel ran."""
    from is3d_tpu.io.surface import read_surface
    surf, avg = read_surface(_vah_file_text(mode), mode=mode, dimension=2)
    assert avg is not None
    np.testing.assert_allclose(avg.temperature, 0.155, rtol=1e-6)
    assert np.isfinite(avg.pressure) and avg.pressure > 0


def test_vah_run_dir_prepare(tmp_path):
    """IS3D.from_run_dir with a mode-2 surface must get through the whole
    prepare phase (the round-2 crash was avg.temperature on None)."""
    import os
    from is3d_tpu.api import IS3D
    d = tmp_path / "run"
    (d / "input").mkdir(parents=True)
    (d / "input" / "surface.dat").write_text(_vah_file_text(2))
    (d / "iS3D_parameters.dat").write_text(
        "mode = 2\noperation = 1\ndimension = 2\ndf_mode = 2\n")
    for name in ("PDG", "deltaf_coefficients", "tables"):
        os.symlink(f"/root/reference/{name}", d / name)
    run = IS3D.from_run_dir(str(d), chosen_file="chosen_particles_pikp.dat")
    run.read_fo_surf_from_file()
    assert run.averages is not None
    _table, _dfd, species, mcids, grid, plasma = run._prepare()
    assert plasma.temperature > 0.1
    assert species.n_species == len(mcids)
    # file-table grids keep fixed-node reference semantics for VH runs,
    # but VAH (modes 2/3, dead code in the reference -- no output parity
    # to preserve) must get the mT-adaptive eta remap: fixed nodes lose
    # up to ~6e-2 at the pT grid edge on narrow anisotropic integrands
    assert grid.eta_mT_rescale is True


def _gate_fixture(n=32, seed=77, with_c=False):
    rng = np.random.default_rng(seed)
    cells = make_vah_cells(n, rng)
    if with_c:
        for i, nm in enumerate(("c0", "c1", "c2", "c3", "c4")):
            cells[nm] = rng.normal(0, 0.1, n)
    surf = Surface(**{k: jnp.asarray(v, jnp.float32)
                      for k, v in cells.items()})
    z = jnp.zeros(2, jnp.float32)
    sp = SpeciesArrays(mass=jnp.asarray([0.139, 0.938], jnp.float32),
                       sign=jnp.asarray([-1.0, 1.0], jnp.float32),
                       degeneracy=jnp.asarray([1.0, 2.0], jnp.float32),
                       baryon=jnp.asarray([0.0, 1.0], jnp.float32),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    grid = native_momentum_grid(dimension=2, n_pT=6, n_phi=4, n_eta=12,
                                dtype=jnp.float32)
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=16, precision="f32")
    return surf, sp, grid, cfg


def test_vah_df_gate_bit_identical():
    """Surfaces without c0..c4 (every real mode-2/3 file): the gated
    kernel (df chains structurally absent) is BITWISE equal to the
    ungated one evaluating the chains on exact zeros."""
    surf, sp, grid, cfg = _gate_fixture()
    gated = np.asarray(smooth_spectra_vah(surf, sp, grid, cfg))
    ungated = np.asarray(smooth_spectra_vah(
        surf, sp, grid, cfg.replace(vah_df_gate=0)))
    np.testing.assert_array_equal(gated, ungated)
    assert np.isfinite(gated).all() and (gated > 0).any()


def test_vah_df_gate_keeps_nonzero_chains():
    """Nonzero c columns must defeat the gate: gated == ungated on the
    same surface, and both differ from the chain-free result."""
    surf, sp, grid, cfg = _gate_fixture(with_c=True)
    gated = np.asarray(smooth_spectra_vah(surf, sp, grid, cfg))
    ungated = np.asarray(smooth_spectra_vah(
        surf, sp, grid, cfg.replace(vah_df_gate=0)))
    np.testing.assert_array_equal(gated, ungated)
    bare = np.asarray(smooth_spectra_vah(
        surf, sp, grid, cfg.replace(include_shear_deltaf=0,
                                    include_bulk_deltaf=0)))
    assert np.abs(gated - bare).max() > 0


def test_effective_vah_cfg_decisions():
    from is3d_tpu.kernels.vah import effective_vah_cfg, vah_surface_cols
    import jax

    surf, _, _, cfg = _gate_fixture()          # no c columns
    cols = vah_surface_cols(surf)
    eff = effective_vah_cfg(cols, cfg)
    assert (eff.include_shear_deltaf, eff.include_bulk_deltaf) == (0, 0)

    # nonzero c4 alone keeps shear; bulk needs bulkPi AND a c0..c2
    cols2 = dict(cols); cols2["c4"] = jnp.ones_like(cols["tau"])
    eff2 = effective_vah_cfg(cols2, cfg)
    assert (eff2.include_shear_deltaf, eff2.include_bulk_deltaf) == (1, 0)
    cols3 = dict(cols); cols3["c1"] = jnp.ones_like(cols["tau"])
    eff3 = effective_vah_cfg(cols3, cfg)       # bulkPi nonzero in fixture
    assert (eff3.include_shear_deltaf, eff3.include_bulk_deltaf) == (0, 1)
    cols4 = dict(cols3); cols4["bulkPi"] = jnp.zeros_like(cols["tau"])
    eff4 = effective_vah_cfg(cols4, cfg)
    assert eff4.include_bulk_deltaf == 0

    # a tracer column cannot be proven zero -> chains stay (vmap/AD safety)
    def probe(c3):
        cols5 = dict(cols); cols5["c3"] = c3
        eff5 = effective_vah_cfg(cols5, cfg)
        assert eff5.include_shear_deltaf == 1
        return c3
    jax.vmap(probe)(jnp.zeros((2, cols["tau"].shape[0])))

    # config switches already off stay off regardless of the data
    off = cfg.replace(include_shear_deltaf=0, include_bulk_deltaf=0)
    eff6 = effective_vah_cfg(cols2, off)
    assert (eff6.include_shear_deltaf, eff6.include_bulk_deltaf) == (0, 0)


def test_vah_df_gate_dndx_bit_identical():
    """The dN/dX VAH path gates identically (spacetime histograms)."""
    from is3d_tpu.kernels.dndx import spacetime_distributions
    surf, sp, grid, cfg = _gate_fixture()
    a = spacetime_distributions(surf, sp, grid, None, cfg)
    b = spacetime_distributions(surf, sp, grid, None,
                                cfg.replace(vah_df_gate=0))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


# ---------------------------------------------------------------- vah tables

def test_vah_coefficient_tables_interpolation(reference_dir):
    """Loader + bilinear interpolation of the shipped
    deltaf_coefficients/vah tables: exact at grid nodes (matching the
    1/hbarC^3 unit conversion of the only reference consumer,
    src/cuda/deltafReader.cu:273-277), bilinear between nodes, clamped
    outside the (Lambda, aL) domain."""
    from is3d_tpu.io.deltaf import (load_vah_coefficient_tables,
                                    interpolate_vah_coefficients)
    from is3d_tpu.units import HBARC
    t = load_vah_coefficient_tables(f"{reference_dir}/deltaf_coefficients")
    L, aL = t["Lambda_invfm"], t["aL"]
    names = ("c0", "c1", "c2", "c3", "c4")
    assert t["c0"].shape == (len(aL), len(L)) == (180, 80)

    # exact node reproduction
    iL, ia = 17, 53
    got = interpolate_vah_coefficients(t, np.array([L[iL] * HBARC]),
                                       np.array([aL[ia]]))
    for k in names:
        np.testing.assert_allclose(got[k][0], t[k][ia, iL] / HBARC**3,
                                   rtol=1e-12)

    # interior points vs an independent bilinear (scipy)
    from scipy.interpolate import RegularGridInterpolator
    rng = np.random.default_rng(3)
    Lq = rng.uniform(L[0], L[-1], 64)
    aq = rng.uniform(aL[0], aL[-1], 64)
    got = interpolate_vah_coefficients(t, Lq * HBARC, aq)
    for k in names:
        ref = RegularGridInterpolator((aL, L), t[k])(
            np.stack([aq, Lq], axis=1)) / HBARC**3
        np.testing.assert_allclose(got[k], ref, rtol=1e-12)

    # out-of-domain queries clamp to the edge values
    lo = interpolate_vah_coefficients(t, np.array([0.01]), np.array([-3.0]))
    hi = interpolate_vah_coefficients(t, np.array([99.0]), np.array([99.0]))
    for k in names:
        np.testing.assert_allclose(lo[k][0], t[k][0, 0] / HBARC**3,
                                   rtol=1e-12)
        np.testing.assert_allclose(hi[k][0], t[k][-1, -1] / HBARC**3,
                                   rtol=1e-12)


def test_vah_coefficient_tables_wiring(reference_dir):
    """cfg.vah_coefficient_tables=1 fills MISSING c0..c4 on a mode-2
    surface from the shipped tables; the resulting spectra (a) equal a run
    with the interpolated values passed explicitly as surface columns and
    (b) actually activate the residual-df chains (differ from the
    gated-zero default).  User-supplied columns win; default config never
    touches the surface."""
    from is3d_tpu.api import IS3D
    from is3d_tpu.io.deltaf import (load_vah_coefficient_tables,
                                    interpolate_vah_coefficients)

    rng = np.random.default_rng(91)
    cells = make_vah_cells(24, rng)
    for k in ("pitt", "pitx", "pity", "pitn", "pinn"):
        cells.pop(k, None)
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    cfg = Config(mode=2, dimension=2, df_mode=4, operation=1,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 vah_coefficient_tables=1)

    run = IS3D(cfg, data_dir=reference_dir)
    run.surface = surf
    run._maybe_fill_vah_coefficients()
    assert run.surface.c0 is not None
    tables = load_vah_coefficient_tables(
        f"{reference_dir}/deltaf_coefficients")
    want = interpolate_vah_coefficients(tables, np.asarray(surf.Lambda),
                                        np.asarray(surf.aL))
    for k in ("c0", "c1", "c2", "c3", "c4"):
        np.testing.assert_allclose(np.asarray(getattr(run.surface, k)),
                                   want[k], rtol=1e-12)

    grid = native_momentum_grid(dimension=2, n_pT=5, n_phi=4, n_eta=16)
    z = jnp.zeros(1)
    sp = SpeciesArrays(mass=jnp.array([0.139]), sign=jnp.array([-1.0]),
                       degeneracy=jnp.array([1.0]), baryon=jnp.array([0.0]),
                       equilibrium_density=z, bulk_density=z, diff_density=z)
    filled = np.asarray(smooth_spectra_vah(run.surface, sp, grid, cfg))
    explicit = np.asarray(smooth_spectra_vah(
        surf.replace(**{k: jnp.asarray(want[k]) for k in want}),
        sp, grid, cfg))
    np.testing.assert_array_equal(filled, explicit)

    gated = np.asarray(smooth_spectra_vah(surf, sp, grid, cfg))
    assert np.abs(filled - gated).max() > 0.0

    # user-supplied columns win; default config is a no-op
    run2 = IS3D(cfg, data_dir=reference_dir)
    user = surf.replace(c0=jnp.full_like(surf.tau, 0.5))
    run2.surface = user
    run2._maybe_fill_vah_coefficients()
    np.testing.assert_array_equal(np.asarray(run2.surface.c0),
                                  np.asarray(user.c0))
    assert run2.surface.c1 is not None      # missing ones still filled
    run3 = IS3D(cfg.replace(vah_coefficient_tables=0),
                data_dir=reference_dir)
    run3.surface = surf
    run3._maybe_fill_vah_coefficients()
    assert run3.surface.c0 is None
