"""Anisotropic-hydro (VAH) Monte-Carlo sampler validation.

The reference has no working counterpart (sample_dN_pTdpTdphidy_VAH_PL is a
stub, sampling_kernels.cpp:1231-1239), so the oracle is twofold:

1. a single cell at rest, where the sampled momentum distribution must match
   a direct numpy integral of f = f_a (1 + clamp(fabar df, -1, 1)) --
   absolute yield, species fractions, <pT>, and the longitudinal/transverse
   anisotropy <pz^2>/<px^2> that directly probes the a_L stretch;

2. a flowing multi-cell surface, where per-species dN/dy and the pion pT
   spectrum must agree with our smooth VAH kernel (the reference's own
   sampler-validation methodology, SURVEY.md section 4).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.surface import Surface, ThermoAverages
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.sample import sample_particles
from is3d_tpu.kernels.vah import smooth_spectra_vah
from is3d_tpu.physics import lrf
from is3d_tpu.units import TWO_PI2_HBARC3
from is3d_tpu import observables

from is3d_tpu.testing import synthetic_species

PLASMA = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)
MCIDS = np.arange(1, 7, dtype=np.int32)   # 6 massive synthetic species


def species6():
    return synthetic_species(6)


# ---------------------------------------------------------------- rest frame

def test_vah_sampler_single_cell_rest():
    """One cell at rest: LRF == lab, flux weight == 1, so the sampled list
    is a pure draw from f_a (1 + clamp(fabar df)).  Checked against direct
    numpy integrals."""
    sp = species6()
    tau = 3.0
    aL = 0.6
    Lam = 0.16
    s_pi, t_pi = 0.004, -0.003           # pi_perp LRF = [[s,t],[t,-s]]
    Wx, Wy = 0.004, -0.002
    bulkPi = 0.01
    c0 = c1 = c2 = 20.0
    c3, c4 = 30.0, 30.0

    z1 = jnp.zeros(1)
    one = jnp.ones(1)
    surf = Surface(
        tau=tau * one, x=z1, y=z1, eta=z1,
        dat=one, dax=z1, day=z1, dan=z1,
        ux=z1, uy=z1, un=z1,
        T=0.155 * one, E=0.3 * one, P=0.05 * one,
        pitt=z1, pitx=z1, pity=z1, pitn=z1,
        pixx=s_pi * one, pixy=t_pi * one, pixn=z1,
        piyy=-s_pi * one, piyn=z1, pinn=z1,
        bulkPi=bulkPi * one, Wx=Wx * one, Wy=Wy * one,
        Lambda=Lam * one, aL=aL * one,
        c0=c0 * one, c1=c1 * one, c2=c2 * one, c3=c3 * one, c4=c4 * one,
    )
    y_cut = 2.0
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=y_cut, sampler_seed=11)

    nev = 1500
    events = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                              nevents=nev)
    mc = np.concatenate([e["mcid"] for e in events])
    px = np.concatenate([e["px"] for e in events])
    py = np.concatenate([e["py"] for e in events])
    # longitudinal LRF momentum: at rest pz_LRF = tau * p^eta at the cell's
    # eta; reconstruct from (E, pz_lab, eta_out):
    # p^tau = E cosh(eta) - pz sinh(eta) is not needed -- use mT/y relations
    E = np.concatenate([e["E"] for e in events])
    pz_lab = np.concatenate([e["pz"] for e in events])
    eta = np.concatenate([e["eta"] for e in events])
    # lab (t,z) frame at eta: pz_LRF = -sinh(eta) E_lab' ... simplest exact:
    # p^eta tau = (pz cosh(eta) - E sinh(eta)); at rest LRF z-axis is the
    # eta direction, pz_LRF = tau p^eta / 1 = that combination
    pzL = pz_lab * np.cosh(eta) - E * np.sinh(eta)

    # ---- numpy oracle: integrals of f over momentum space
    masses = np.asarray(sp.mass)
    signs = np.asarray(sp.sign)
    degs = np.asarray(sp.degeneracy)
    p = np.linspace(1e-4, 4.0, 320)
    ct = np.linspace(-1.0, 1.0, 161)
    ph = np.linspace(0.0, 2 * np.pi, 65)[:-1]
    P, CT, PH = np.meshgrid(p, ct, ph, indexing="ij")
    ST = np.sqrt(1 - CT**2)
    PX, PY, PZ = P * ST * np.cos(PH), P * ST * np.sin(PH), P * CT
    xi = 1.0 / aL**2 - 1.0

    n_eff = np.zeros(len(masses))
    m_pT = np.zeros(len(masses))
    m_pz2 = np.zeros(len(masses))
    m_px2 = np.zeros(len(masses))
    for i, (m, sg, dg) in enumerate(zip(masses, signs, degs)):
        Eg = np.sqrt(m**2 + P**2)
        Ea = np.sqrt(Eg**2 + xi * PZ**2)
        fa = 1.0 / (np.exp(Ea / Lam) + sg)
        fabar = 1.0 - sg * fa
        df = (c3 * PZ * (Wx * PX + Wy * PY)
              + c4 * (s_pi * (PX**2 - PY**2) + 2 * t_pi * PX * PY)
              + (c0 * m**2 + c1 * PZ**2 + c2 * Eg**2) * bulkPi)
        f = fa * (1.0 + np.clip(fabar * df, -1.0, 1.0))
        w = f * P**2
        norm = np.trapezoid(np.trapezoid(np.trapezoid(w, ph), ct), p)
        # n = deg/( (2pi)^3 hbarc^3 ) * Int d^3p f, and (2pi)^3 = 4pi * 2pi^2
        n_eff[i] = dg * norm / (4 * np.pi * TWO_PI2_HBARC3)
        m_pT[i] = np.trapezoid(np.trapezoid(np.trapezoid(
            w * np.hypot(PX, PY), ph), ct), p) / norm
        m_pz2[i] = np.trapezoid(np.trapezoid(np.trapezoid(
            w * PZ**2, ph), ct), p) / norm
        m_px2[i] = np.trapezoid(np.trapezoid(np.trapezoid(
            w * PX**2, ph), ct), p) / norm

    # absolute yield: dN/dy = dat * n_eff (u.dsigma = dat at rest)
    for i, mcid in enumerate(MCIDS):
        sel = mc == mcid
        n_s = int(sel.sum())
        dNdy = n_s / (2 * y_cut * nev)
        sig = np.sqrt(max(n_s, 1)) / (2 * y_cut * nev)
        assert abs(dNdy - n_eff[i]) < 5 * sig + 0.02 * n_eff[i], \
            (mcid, dNdy, n_eff[i])
        pT_s = np.hypot(px[sel], py[sel])
        tol = 5 * pT_s.std() / np.sqrt(n_s) + 0.01 * m_pT[i]
        assert abs(pT_s.mean() - m_pT[i]) < tol, (mcid, pT_s.mean(), m_pT[i])
        # anisotropy: <pz^2>/<px^2> ~ aL^2 scale -- catches stretch errors
        ratio_s = (pzL[sel]**2).mean() / (px[sel]**2).mean()
        ratio_o = m_pz2[i] / m_px2[i]
        se = 5 * ratio_o * np.sqrt(2.0 / n_s) + 0.03 * ratio_o
        assert abs(ratio_s - ratio_o) < se, (mcid, ratio_s, ratio_o)


# ------------------------------------------------------- vs smooth VAH kernel

def vah_flow_surface(n=24, seed=3):
    """Flowing 2+1D VAH surface with residual W / pi_perp built from LRF
    components via the Milne tetrad, so lab contractions (smooth kernel)
    equal LRF contractions (sampler) exactly."""
    rng = np.random.default_rng(seed)
    tau = rng.uniform(2, 6, n)
    ux = rng.uniform(-0.5, 0.5, n)
    uy = rng.uniform(-0.5, 0.5, n)
    un = np.zeros(n)
    ut = np.sqrt(1 + ux**2 + uy**2)
    b = lrf.milne_basis(jnp.asarray(ut), jnp.asarray(ux), jnp.asarray(uy),
                        jnp.asarray(un), jnp.asarray(tau))
    Xt, Xx, Xy, Xn = (np.asarray(v) for v in (b.Xt, b.Xx, b.Xy, b.Xn))
    Yx, Yy = np.asarray(b.Yx), np.asarray(b.Yy)

    s_pi = rng.normal(0, 0.004, n)
    t_pi = rng.normal(0, 0.004, n)
    WxL = rng.normal(0, 0.004, n)
    WyL = rng.normal(0, 0.004, n)

    # pi_perp^{mu nu} = s (X X - Y Y) + t (X Y + Y X), Y^t = Y^eta = 0
    cells = dict(
        tau=tau, x=rng.uniform(-4, 4, n), y=rng.uniform(-4, 4, n),
        eta=np.zeros(n),
        dat=rng.uniform(0.4, 1.0, n), dax=rng.uniform(-0.15, 0.15, n),
        day=rng.uniform(-0.15, 0.15, n), dan=np.zeros(n),
        ux=ux, uy=uy, un=un,
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        pitt=s_pi * Xt * Xt,
        pitx=s_pi * Xt * Xx + t_pi * Xt * Yx,
        pity=s_pi * Xt * Xy + t_pi * Xt * Yy,
        pitn=s_pi * Xt * Xn,
        pixx=s_pi * (Xx**2 - Yx**2) + 2 * t_pi * Xx * Yx,
        pixy=s_pi * (Xx * Xy - Yx * Yy) + t_pi * (Xx * Yy + Yx * Xy),
        pixn=s_pi * Xx * Xn + t_pi * Yx * Xn,
        piyy=s_pi * (Xy**2 - Yy**2) + 2 * t_pi * Xy * Yy,
        piyn=s_pi * Xy * Xn + t_pi * Yy * Xn,
        pinn=s_pi * Xn * Xn,
        bulkPi=rng.normal(0, 0.008, n),
        Wx=WxL * Xx + WyL * Yx, Wy=WxL * Xy + WyL * Yy,
        Lambda=rng.uniform(0.14, 0.18, n), aL=rng.uniform(0.55, 0.9, n),
        c0=np.full(n, 15.0), c1=np.full(n, 15.0), c2=np.full(n, 15.0),
        c3=np.full(n, 25.0), c4=np.full(n, 25.0),
    )
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})

    # self-check: the LRF boost must recover the seeded LRF components
    piL = lrf.boost_pimunu_to_lrf(
        b, *(jnp.asarray(cells[k]) for k in
             ("pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
              "piyy", "piyn", "pinn")), jnp.asarray(tau))
    np.testing.assert_allclose(np.asarray(piL[0]), s_pi, atol=1e-12)
    np.testing.assert_allclose(np.asarray(piL[1]), t_pi, atol=1e-12)
    np.testing.assert_allclose(np.asarray(piL[2]), 0.0, atol=1e-12)
    return surf


def test_vah_sampler_matches_smooth_vah():
    sp = species6()
    surf = vah_flow_surface()
    y_cut = 3.0
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=y_cut, sampler_seed=23)

    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    spectra = smooth_spectra_vah(surf, sp, grid,
                                 cfg.replace(operation=1, cell_chunk=16))
    dNdy_smooth = np.asarray(observables.dN_dy(spectra, grid))[:, 0]
    meanpT_smooth = np.asarray(observables.mean_pT(spectra, grid))[:, 0]

    nev = 500
    events = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                              nevents=nev)
    mc = np.concatenate([e["mcid"] for e in events])
    pT = np.concatenate([np.hypot(e["px"], e["py"]) for e in events])

    for i, mcid in enumerate(MCIDS):
        sel = mc == mcid
        n_s = int(sel.sum())
        dNdy = n_s / (2 * y_cut * nev)
        sig = np.sqrt(max(n_s, 1)) / (2 * y_cut * nev)
        assert abs(dNdy - dNdy_smooth[i]) < 5 * sig + 0.02 * dNdy_smooth[i], \
            (mcid, dNdy, dNdy_smooth[i])
        tol = 5 * pT[sel].std() / np.sqrt(n_s) + 0.01 * meanpT_smooth[i]
        assert abs(pT[sel].mean() - meanpT_smooth[i]) < tol, \
            (mcid, pT[sel].mean(), meanpT_smooth[i])

    # pion pT spectrum shape on coarse bins (NOT partial-GL sums -- see
    # bin_fractions_from_grid), with dedicated HIGH-pT tail bins and
    # near-Poisson-only tolerances: the round-1 smooth kernel was 28% low
    # at pT ~ 3.5 GeV (a_L-only eta rescale), which this comparison now
    # resolves -- the mT-dependent rescale makes sampler and smooth agree
    # in the tail
    from oracle import bin_fractions_from_grid
    dNpT = np.asarray(observables.dN_twopipTdpTdy(spectra, grid))[0, :, 0]
    edges = np.array([0.0, 0.3, 0.6, 1.0, 1.5, 2.0, 2.75, 5.0])
    pred = bin_fractions_from_grid(np.asarray(grid.pT), dNpT, edges)
    counts, _ = np.histogram(pT[mc == 1], bins=edges)
    N = counts.sum()
    exp_counts = N * pred
    sig = np.sqrt(np.maximum(exp_counts, 3.0))
    resid = np.abs(counts - exp_counts)
    assert np.all(resid < 5.0 * sig + 0.005 * exp_counts), \
        (counts.tolist(), exp_counts.tolist())


def test_vah_sampler_3d_runs_on_shell():
    """3+1D VAH surface: runs, on-shell, eta from the cells."""
    sp = species6()
    rng = np.random.default_rng(9)
    n = 12
    tau = rng.uniform(2, 5, n)
    z = np.zeros(n)
    cells = dict(
        tau=tau, x=rng.uniform(-3, 3, n), y=rng.uniform(-3, 3, n),
        eta=rng.uniform(-1.5, 1.5, n),
        dat=rng.uniform(0.4, 1.0, n), dax=rng.uniform(-0.1, 0.1, n),
        day=rng.uniform(-0.1, 0.1, n), dan=rng.uniform(-0.01, 0.01, n),
        ux=rng.uniform(-0.4, 0.4, n), uy=rng.uniform(-0.4, 0.4, n),
        un=rng.uniform(-0.02, 0.02, n),
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        pitt=z, pitx=z, pity=z, pitn=z, pixx=z, pixy=z, pixn=z,
        piyy=z, piyn=z, pinn=z, bulkPi=z, Wx=z, Wy=z,
        Lambda=rng.uniform(0.14, 0.18, n), aL=rng.uniform(0.6, 0.9, n),
    )
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    cfg = Config(operation=2, mode=3, dimension=3, df_mode=2,
                 include_shear_deltaf=0, include_bulk_deltaf=0,
                 regulate_deltaf=1, outflow=1, sampler_seed=2)
    events = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                              nevents=1500)
    allm = np.concatenate([e["mass"] for e in events])
    assert allm.size > 600   # yield on this small surface is ~1 hadron/event
    etas = set(np.round(np.asarray(cells["eta"]), 6))
    for e in events[:20]:
        E2 = e["mass"]**2 + e["px"]**2 + e["py"]**2 + e["pz"]**2
        np.testing.assert_allclose(e["E"]**2, E2, rtol=1e-5)
        assert set(np.round(e["eta"], 6)) <= etas


def test_vah_sampler_sharded():
    """Cell-sharded VAH sampling on the virtual 8-device mesh reproduces
    the single-device yields (Poisson superposition over cell shards)."""
    from is3d_tpu.kernels.sample import sample_particles_sharded
    from is3d_tpu.parallel.mesh import default_mesh

    sp = species6()
    surf = vah_flow_surface(n=21, seed=5)   # deliberately not divisible by 8
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=3.0, sampler_seed=77)
    mesh = default_mesh(axis=cfg.mesh_axis)

    nev = 120
    ev_sh = sample_particles_sharded(surf, sp, MCIDS, None, cfg, PLASMA,
                                     mesh, nevents=nev, seed=12)
    ev_1d = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                             nevents=nev, seed=34)
    n_sh = np.array([len(e["mcid"]) for e in ev_sh], dtype=float)
    n_1d = np.array([len(e["mcid"]) for e in ev_1d], dtype=float)
    assert n_sh.sum() > 0
    se = np.sqrt(n_sh.var() / nev + n_1d.var() / nev)
    assert abs(n_sh.mean() - n_1d.mean()) < 5 * se + 1e-9, \
        (n_sh.mean(), n_1d.mean())
    pt_sh = np.concatenate([np.hypot(e["px"], e["py"]) for e in ev_sh])
    pt_1d = np.concatenate([np.hypot(e["px"], e["py"]) for e in ev_1d])
    tol = 5 * np.sqrt(pt_sh.var() / pt_sh.size + pt_1d.var() / pt_1d.size)
    assert abs(pt_sh.mean() - pt_1d.mean()) < tol + 0.01


def test_vah_sampler_df_gate_bit_identical():
    """Mode-2/3 surfaces without c0..c4 (every real VAH file): the gated
    sampler (df chains structurally absent, coefficient rows dropped from
    the per-slot gather) emits BITWISE identical events to the ungated
    one evaluating the chains on exact zeros -- same RNG stream, same
    acceptance comparisons (w_visc = 0.5 either way)."""
    sp = species6()
    surf = vah_flow_surface(n=24, seed=11)
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=3.0, sampler_seed=5)
    ev_g = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                            nevents=40, seed=21)
    ev_u = sample_particles(surf, sp, MCIDS, None, None,
                            cfg.replace(vah_df_gate=0), PLASMA,
                            nevents=40, seed=21)
    assert sum(len(e["mcid"]) for e in ev_g) > 0
    assert len(ev_g) == len(ev_u)
    for a, b in zip(ev_g, ev_u):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_vah_sampler_cell_chunked(smash_table=None):
    """Cell-chunked VAH sampling (modes 2/3 route through
    _vah_cell_scalars_jit in the pre-pass): deterministic, nonzero, and
    statistically consistent with the unchunked run's total yield."""
    sp = species6()
    surf = vah_flow_surface(n=20, seed=5)
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=2.5, sampler_seed=11)
    nev = 200
    ev_u = sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA,
                            nevents=nev)
    ev_c = sample_particles(surf, sp, MCIDS, None, None,
                            cfg.replace(sampler_cell_chunk=8), PLASMA,
                            nevents=nev)
    ev_c2 = sample_particles(surf, sp, MCIDS, None, None,
                             cfg.replace(sampler_cell_chunk=8), PLASMA,
                             nevents=nev)
    n_u = sum(len(e["mcid"]) for e in ev_u)
    n_c = sum(len(e["mcid"]) for e in ev_c)
    assert n_u > 0 and n_c > 0
    assert abs(n_u - n_c) < 5 * (np.sqrt(n_u) + np.sqrt(n_c))
    for a, b in zip(ev_c, ev_c2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_vah_sampler_unregulated_warns():
    """regulate_deltaf=0 on a VAH sampling run emits the clipped-weight
    RuntimeWarning (docs/PHYSICS.md 'VAH sampling and df regulation');
    the default regulated run stays silent."""
    import warnings
    sp = species6()
    surf = vah_flow_surface(n=8, seed=13)
    cfg = Config(operation=2, mode=2, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=0, outflow=1, y_cut=2.0, sampler_seed=9)
    with pytest.warns(UserWarning, match="regulate_deltaf=0"):
        sample_particles(surf, sp, MCIDS, None, None, cfg, PLASMA, nevents=2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sample_particles(surf, sp, MCIDS, None, None,
                         cfg.replace(regulate_deltaf=1), PLASMA, nevents=2)
    # with every residual-df chain disabled, df_tot == 0 exactly and the
    # clip is a no-op -- regulate_deltaf=0 must NOT warn (advisor round 4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sample_particles(surf, sp, MCIDS, None, None,
                         cfg.replace(include_shear_deltaf=0,
                                     include_bulk_deltaf=0),
                         PLASMA, nevents=2)
