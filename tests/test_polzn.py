"""Spin polarization kernel vs a direct numpy evaluation (MODE 5)."""

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.data import SpeciesArrays
from is3d_tpu.io.surface import Surface, ThermoAverages
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.polzn import spin_polarization


def make_surface(n, rng, dimension=2):
    cells = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n),
        eta=(rng.uniform(-1, 1, n) if dimension == 3 else np.zeros(n)),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n), dan=np.zeros(n),
        ux=rng.uniform(-0.5, 0.5, n), uy=rng.uniform(-0.5, 0.5, n),
        un=rng.uniform(-0.02, 0.02, n),
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        wtx=rng.normal(0, 0.01, n), wty=rng.normal(0, 0.01, n),
        wtn=rng.normal(0, 0.01, n), wxy=rng.normal(0, 0.01, n),
        wxn=rng.normal(0, 0.01, n), wyn=rng.normal(0, 0.01, n),
    )
    return Surface(**{k: jnp.asarray(v) for k, v in cells.items()}), cells


def oracle_polzn(cells, mass, sign, grid, T, dimension):
    pT = np.asarray(grid.pT)
    phi = np.asarray(grid.phi)
    eta = np.asarray(grid.eta)
    etaw = np.asarray(grid.eta_weight)
    ys = [0.0] if dimension == 2 else list(np.asarray(grid.y))
    if dimension == 2:
        deta = eta[1] - eta[0]
        etas, ws = eta, etaw * deta
    St = np.zeros((len(pT), len(phi), len(ys)))
    Sx = np.zeros_like(St); Sy = np.zeros_like(St); Sn = np.zeros_like(St)
    Snorm = np.zeros_like(St)
    n = len(cells["tau"])
    for ic in range(n):
        tau = cells["tau"][ic]; tau2 = tau * tau
        ux, uy, un = cells["ux"][ic], cells["uy"][ic], cells["un"][ic]
        ut = np.sqrt(1 + ux**2 + uy**2 + tau2 * un**2)
        if dimension == 3:
            etas, ws = [cells["eta"][ic]], [1.0]
        for i, pt_ in enumerate(pT):
            mT = np.sqrt(mass**2 + pt_**2)
            for j, ph in enumerate(phi):
                px, py = pt_ * np.cos(ph), pt_ * np.sin(ph)
                for k, y in enumerate(ys):
                    for e, w in zip(etas, ws):
                        ptau = mT * np.cosh(y - e)
                        pn = mT / tau * np.sinh(y - e)
                        pds = (ptau * cells["dat"][ic] + px * cells["dax"][ic]
                               + py * cells["day"][ic] + pn * cells["dan"][ic])
                        pdotu = ptau * ut - px * ux - py * uy - tau2 * pn * un
                        f0 = 1.0 / (np.exp(pdotu / T) + sign)
                        pref = -(1.0 / 8.0 / mass) * (1 - sign * f0) * 2.0
                        wtx, wty, wtn = (cells["wtx"][ic], cells["wty"][ic],
                                         cells["wtn"][ic])
                        wxy, wxn, wyn = (cells["wxy"][ic], cells["wxn"][ic],
                                         cells["wyn"][ic])
                        st = pref * (wxy * pn - wxn * py + wyn * px)
                        sx = pref * (wyn * ptau - wtn * py + wty * pn)
                        sy = pref * (-wxn * ptau + wtn * px - wtx * pn)
                        sn = pref * (wtx * py + wxy * ptau - wty * px)
                        m = w * pds * f0
                        St[i, j, k] += m * st
                        Sx[i, j, k] += m * sx
                        Sy[i, j, k] += m * sy
                        Sn[i, j, k] += m * sn
                        Snorm[i, j, k] += m
    return St, Sx, Sy, Sn, Snorm


PLASMA = ThermoAverages(0.155, 0.3, 0.05, 0.0, 0.0)


def _species(mass, sign):
    z = jnp.zeros(1)
    return SpeciesArrays(mass=jnp.asarray([mass]), sign=jnp.asarray([sign]),
                         degeneracy=jnp.asarray([2.0]), baryon=jnp.asarray([1.0]),
                         equilibrium_density=z, bulk_density=z, diff_density=z)


def test_polzn_vs_oracle_2d():
    rng = np.random.default_rng(44)
    surf, cells = make_surface(7, rng, dimension=2)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=10,
                                eta_mT_rescale=False)   # node-exact oracle
    cfg = Config(mode=5, dimension=2, cell_chunk=4)
    sp = _species(1.11568, 1.0)   # Lambda
    out = spin_polarization(surf, sp, grid, cfg, PLASMA)
    St, Sx, Sy, Sn, Snorm = oracle_polzn(cells, 1.11568, 1.0, grid, 0.155, 2)
    np.testing.assert_allclose(np.asarray(out["St"])[0], St, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["Sx"])[0], Sx, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["Sy"])[0], Sy, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["Sn"])[0], Sn, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["Snorm"])[0], Snorm, rtol=1e-10)


def test_polzn_vs_oracle_3d():
    rng = np.random.default_rng(45)
    surf, cells = make_surface(5, rng, dimension=3)
    grid = native_momentum_grid(dimension=3, n_pT=3, n_phi=4, n_y=3)
    cfg = Config(mode=5, dimension=3, cell_chunk=2)
    sp = _species(1.11568, 1.0)
    out = spin_polarization(surf, sp, grid, cfg, PLASMA)
    St, Sx, Sy, Sn, Snorm = oracle_polzn(cells, 1.11568, 1.0, grid, 0.155, 3)
    np.testing.assert_allclose(np.asarray(out["St"])[0], St, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["Snorm"])[0], Snorm, rtol=1e-10)


def test_mode5_surface_reader(reference_dir):
    """Mode 5 layout: mode 1 + 6 vorticity columns."""
    import io
    from is3d_tpu.io.surface import read_surface
    rng = np.random.default_rng(3)
    rows = rng.uniform(0.1, 1.0, (4, 26))
    rows[:, 7] = 0.0  # dan = 0 (2+1D)
    text = "\n".join(" ".join(f"{v:.6e}" for v in r) for r in rows)
    surf, avg = read_surface(text, mode=5, dimension=2)
    assert surf.wtx is not None and surf.n_cells == 4
    np.testing.assert_allclose(np.asarray(surf.wyn), rows[:, 25])


def test_polzn_eta_mT_rescale_converged():
    """Default native grids use the mT-adaptive eta remap; the normalized
    polarization must match a 1024-node fixed-node reference at high pT
    (where fixed coarse grids under-resolve the narrow (y-eta) integrand)."""
    rng = np.random.default_rng(46)
    surf, _ = make_surface(12, rng, dimension=2)
    # strong longitudinal flow: y_flow up to ~1, so the test catches a
    # remap that narrows the node span without recentering on the peak
    surf = surf.replace(un=jnp.asarray(rng.uniform(-0.25, 0.25, 12)))
    cfg = Config(mode=5, dimension=2, cell_chunk=4)
    sp = _species(1.11568, 1.0)
    gk = dict(dimension=2, n_pT=6, pT_max=4.0, n_phi=4)
    ref = spin_polarization(
        surf, sp, native_momentum_grid(n_eta=1024, eta_max=8.0,
                                       eta_mT_rescale=False, **gk),
        cfg, PLASMA)
    got = spin_polarization(
        surf, sp, native_momentum_grid(n_eta=48, **gk), cfg, PLASMA)
    for k in ("St_over_Snorm", "Sx_over_Snorm", "Sy_over_Snorm",
              "Sn_over_Snorm"):
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, err_msg=k)
