"""Resonance decay feed-down: conservation + Monte-Carlo shape oracle.

The reference's decay routine is disabled (exit at
emissionfunction_resonance_decays.cpp:128), so parity targets are physics
identities and an independent Monte-Carlo decay simulation (same methodology
as the reference's documentation/decay test notebooks):

1. yield conservation: each decay R -> 1+2(+3) deposits exactly
   multiplicity * BR * (parent dN/dY) into the daughter dN/dy,
2. MC shape: sample parents from the analytic spectrum, decay isotropically
   in the parent rest frame, boost, histogram the daughter pT spectrum.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels import decays as dk


def parent_spectrum(grid, M, b=3.2, c=3.0, v2=0.2):
    """Analytic boost-invariant parent: exp(c - b MT)(1 + 2 v2 cos(2 Phi))."""
    pT = np.asarray(grid.pT)
    phi = np.asarray(grid.phi)
    MT = np.sqrt(M * M + pT * pT)
    out = np.exp(c - b * MT)[:, None] * (1.0 + 2 * v2 * np.cos(2 * phi))[None, :]
    return out[None, :, :, None]   # (1, P, F, 1)


def dNdy(spec, grid):
    pT = np.asarray(grid.pT)
    w = np.asarray(grid.pT_weight) * pT
    return float(np.einsum("pf,p,f->", spec[:, :, 0], w,
                           np.asarray(grid.phi_weight)))


def feed_two_body(grid, M, m1, m2, branch, dimension=2):
    spec = parent_spectrum(grid, M)
    pT = np.asarray(grid.pT)
    logdN, tc, ts, MT_grid = dk._prepare_parent(spec[0], pT, M)
    Estar = (M * M + m1 * m1 - m2 * m2) / (2 * M)
    pstar = np.sqrt(Estar**2 - m1 * m1)
    pref = 1.0 * M * branch / (8.0 * pstar)
    out = dk._two_body_integral(
        jnp.asarray(logdN), jnp.asarray(tc), jnp.asarray(ts),
        jnp.asarray(MT_grid), jnp.asarray(pT), jnp.asarray(grid.phi),
        jnp.asarray(grid.y), m1 * m1, Estar, pstar, M, dimension)
    return spec, pref * np.asarray(out)


def test_two_body_yield_conservation():
    """rho -> pi pi: daughter dN/dy = BR * parent dN/dY per daughter."""
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    M, m = 0.775, 0.138
    spec, feed = feed_two_body(grid, M, m, m, branch=1.0)
    got = dNdy(feed, grid)
    want = dNdy(spec[0], grid)
    assert abs(got - want) < 0.02 * want, (got, want)


def test_two_body_asymmetric_masses():
    """K* -> K pi: both daughters conserve the parent yield."""
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    M, mK, mpi = 0.892, 0.494, 0.138
    spec, feed_K = feed_two_body(grid, M, mK, mpi, branch=1.0)
    _, feed_pi = feed_two_body(grid, M, mpi, mK, branch=1.0)
    want = dNdy(spec[0], grid)
    assert abs(dNdy(feed_K, grid) - want) < 0.02 * want
    assert abs(dNdy(feed_pi, grid) - want) < 0.02 * want


def test_three_body_yield_conservation():
    """omega -> 3 pi (single pi+ group): dN/dy = BR * parent dN/dY."""
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    M, m = 0.783, 0.138
    spec = parent_spectrum(grid, M)
    pT = np.asarray(grid.pT)
    logdN, tc, ts, MT_grid = dk._prepare_parent(spec[0], pT, M)
    s_plus = (M - m) ** 2
    s_minus = (2 * m) ** 2
    d = 0.0
    Q = dk._q_factor(M, m, m, m)
    pref = 1.0 * M * M * (s_plus - s_minus) * 1.0 / (8.0 * Q)
    out = pref * np.asarray(dk._three_body_integral(
        jnp.asarray(logdN), jnp.asarray(tc), jnp.asarray(ts),
        jnp.asarray(MT_grid), jnp.asarray(pT), jnp.asarray(grid.phi),
        jnp.asarray(grid.y), m * m, M, s_minus, s_plus, d, 2))
    got = dNdy(out, grid)
    want = dNdy(spec[0], grid)
    assert abs(got - want) < 0.03 * want, (got, want)


def test_two_body_shape_vs_monte_carlo():
    """rho0 -> pi+ pi-: integral feed-down pT shape vs MC decay simulation."""
    rng = np.random.default_rng(8)
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    M, m, b, c, v2 = 0.775, 0.138, 3.2, 3.0, 0.2
    spec, feed = feed_two_body(grid, M, m, m, branch=1.0)

    # MC: sample parents from MT exp(-b MT) (1 + 2 v2 cos 2Phi), Y uniform
    N = 2_000_000
    Yr = 8.0
    Y = rng.uniform(-Yr, Yr, N)
    # MT - M ~ mixture sampling via rejection from exponential
    MT = np.empty(N)
    got_n = 0
    while got_n < N:
        k = (N - got_n) * 2
        cand = M + rng.exponential(1.0 / b, k)
        acc = rng.uniform(0, 1, k) < (cand / (M + 3.0 / b))  # envelope ok for MT<M+3/b?
        # use exact rejection: density prop to MT e^{-b MT}; envelope C e^{-b MT}
        # with C = cand_max unknown -> instead accept with MT / (M + 40/b)
        acc = rng.uniform(0, 1, k) < (cand / (M + 40.0 / b))
        sel = cand[acc][: N - got_n]
        MT[got_n:got_n + len(sel)] = sel
        got_n += len(sel)
    Phi = np.empty(N)
    got_n = 0
    while got_n < N:
        k = (N - got_n) * 2
        cand = rng.uniform(0, 2 * np.pi, k)
        acc = rng.uniform(0, 1, k) < (1 + 2 * v2 * np.cos(2 * cand)) / (1 + 2 * v2)
        sel = cand[acc][: N - got_n]
        Phi[got_n:got_n + len(sel)] = sel
        got_n += len(sel)

    PT = np.sqrt(MT**2 - M**2)
    # parent 4-momentum
    P0 = MT * np.cosh(Y)
    Px = PT * np.cos(Phi)
    Py = PT * np.sin(Phi)
    Pz = MT * np.sinh(Y)

    # isotropic decay in rest frame
    Estar = M / 2.0
    pstar = np.sqrt(Estar**2 - m * m)
    cth = rng.uniform(-1, 1, N)
    ph = rng.uniform(0, 2 * np.pi, N)
    sth = np.sqrt(1 - cth**2)
    ps = pstar * np.stack([sth * np.cos(ph), sth * np.sin(ph), cth], 1)
    # boost to lab: p = ps + [(ps.P)/(M(P0+M)) + Estar/M] P_vec
    Pvec = np.stack([Px, Py, Pz], 1)
    psP = np.einsum("ni,ni->n", ps, Pvec)
    coef = psP / (M * (P0 + M)) + Estar / M
    plab = ps + coef[:, None] * Pvec
    E = np.sqrt(m * m + np.einsum("ni,ni->n", plab, plab))
    yd = 0.5 * np.log((E + plab[:, 2]) / (E - plab[:, 2]))
    pTd = np.hypot(plab[:, 0], plab[:, 1])

    # physical parent yield per unit Y for weighting
    from scipy.integrate import quad
    nY = 2 * np.pi * np.exp(c) * quad(lambda x: x * np.exp(-b * x), M, np.inf)[0]
    w = nY * (2 * Yr) / N

    sel = np.abs(yd) < 0.5
    edges = np.array([0.05, 0.15, 0.25, 0.35, 0.5, 0.7, 1.0, 1.4])
    counts, _ = np.histogram(pTd[sel], bins=edges)
    mc = counts * w / np.diff(edges)      # dN/dy/dpT per bin

    # integral side: dN/dy/dpT = pT * int dphi feed(pT, phi)
    pT = np.asarray(grid.pT)
    phiw = np.asarray(grid.phi_weight)
    dphi_int = np.einsum("pf,f->p", feed[:, :, 0], phiw) * pT
    centers = 0.5 * (edges[1:] + edges[:-1])
    integ = np.interp(centers, pT, dphi_int)

    stat = np.sqrt(np.maximum(counts, 1)) * w / np.diff(edges)
    for i in range(len(centers)):
        assert abs(mc[i] - integ[i]) < 5 * stat[i] + 0.04 * integ[i], \
            (i, centers[i], mc[i], integ[i])


def test_driver_rho_feeds_pions(reference_dir):
    """do_resonance_decays on a mini chosen list: rho0 feeds pi+ and pi-."""
    from is3d_tpu.io import pdg
    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    mcids = np.asarray([211, -211, 113])
    S = len(mcids)
    spectra = np.zeros((S, grid.n_pT, grid.n_phi, 1))
    M = float(table.mass[table.index_of_mcid(113)])
    spectra[2] = parent_spectrum(grid, M)[0]
    cfg = Config(dimension=2, do_resonance_decays=1, lightest_particle=111)
    out = dk.do_resonance_decays(spectra, table, mcids, grid, cfg)
    w_parent = dNdy(spectra[2], grid)
    got_pip = dNdy(out[0], grid)
    got_pim = dNdy(out[1], grid)
    # rho0 -> pi+ pi- with BR 1: each pion species gains the parent yield
    assert abs(got_pip - w_parent) < 0.02 * w_parent, (got_pip, w_parent)
    assert abs(got_pim - w_parent) < 0.02 * w_parent
    # parent spectrum itself unchanged
    np.testing.assert_allclose(out[2], spectra[2])


def test_traced_forward_route_matches_host_loop(reference_dir):
    """The accelerator production path (_forward_traced_jit: ONE jitted
    cascade, memoized per (table, chosen, grid, cfg)) must agree with the
    CPU host-loop driver and must reuse the cached program on a second
    call (repeat invocations skip schedule construction + retracing)."""
    from is3d_tpu.io import pdg
    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    grid = native_momentum_grid(dimension=2, n_pT=24, pT_max=3.0, n_phi=12,
                                n_eta=8)
    mcids = np.asarray([211, -211, 321, 113, 223, 313])
    rng = np.random.default_rng(3)
    spectra = rng.gamma(0.4, 1.0, (len(mcids), grid.n_pT, grid.n_phi, 1))
    cfg = Config(dimension=2, do_resonance_decays=1, lightest_particle=111)

    host = dk._do_resonance_decays_impl(spectra, table, mcids, grid, cfg,
                                        jnp.float64)
    fn = dk._forward_traced_jit(table, mcids, grid, cfg, spectra.shape)
    assert fn.n_waves >= 1 and fn.n_channels >= 4
    traced = np.asarray(fn(jnp.asarray(spectra, jnp.float64)))
    # random (unphysically non-falling) spectra drive the MT tail
    # extrapolation to ~1e113, where the two paths' summation orders
    # differ at ~1e-10 relative; 1e-8 is the op-order tolerance
    np.testing.assert_allclose(traced, host, rtol=1e-8, atol=1e-300)

    fn2 = dk._forward_traced_jit(table, mcids, grid, cfg, spectra.shape)
    assert fn2 is fn          # memoized: same schedule + jitted program
    # a different chosen list must NOT hit the same cache entry
    fn3 = dk._forward_traced_jit(table, mcids[:3], grid, cfg,
                                 (3,) + spectra.shape[1:])
    assert fn3 is not fn


def test_api_operation1_decay_overlap(tmp_path, reference_dir):
    """api operation=1 with do_resonance_decays=1: the async decay
    dispatch overlapped with the smooth writers must produce the same
    RunResult.spectra as a direct (blocking) do_resonance_decays on the
    smooth spectra, and both smooth and _resonance_decays writer files
    must land."""
    import os
    from is3d_tpu.api import IS3D
    from is3d_tpu.io import pdg

    chosen = tmp_path / "chosen.dat"
    chosen.write_text("211\n-211\n113\n223\n")
    rng = np.random.default_rng(7)
    n = 10
    cols = dict(
        tau=rng.uniform(1, 4, n), x=rng.uniform(-2, 2, n),
        y=rng.uniform(-2, 2, n), eta=np.zeros(n),
        dat=rng.uniform(0.2, 1.0, n), dax=rng.uniform(-0.2, 0.2, n),
        day=rng.uniform(-0.2, 0.2, n), dan=np.zeros(n),
        ux=rng.uniform(-0.3, 0.3, n), uy=rng.uniform(-0.3, 0.3, n),
        un=np.zeros(n),
        E=rng.uniform(0.25, 0.4, n), T=rng.uniform(0.15, 0.16, n),
        P=rng.uniform(0.04, 0.08, n),
        pixx=np.zeros(n), pixy=np.zeros(n), pixn=np.zeros(n),
        piyy=np.zeros(n), piyn=np.zeros(n), bulkPi=np.zeros(n))

    def run(decays, tag=None, traced=None):
        import os as _os
        if traced is not None:
            _os.environ["IS3D_DECAYS_TRACED"] = traced
        try:
            cfg = Config(operation=1, mode=1, dimension=2, df_mode=1,
                         hrg_eos=1, do_resonance_decays=decays)
            r = IS3D(cfg, data_dir=reference_dir,
                     results_dir=str(tmp_path / f"res{tag or decays}"),
                     chosen_file=str(chosen))
            r.read_fo_surf_from_memory(**cols)
            return r.run_particlization(write_files=True)
        finally:
            _os.environ.pop("IS3D_DECAYS_TRACED", None)

    smooth = run(0)
    decayed = run(1)
    # force the TRACED route (IS3D_DECAYS_TRACED=1): dec_future is then a
    # genuine in-flight jax array on CPU too, so the api's
    # dispatch-before-writers ordering and the blocking np.asarray are
    # exercised, not just the synchronous host-loop collapse
    decayed_async = run(1, tag="1t", traced="1")
    np.testing.assert_allclose(np.asarray(decayed_async.spectra),
                               np.asarray(decayed.spectra),
                               rtol=1e-8, atol=1e-300)
    d = str(tmp_path / "res1")
    assert os.path.exists(f"{d}/dN_pTdpTdphidy.dat")
    assert os.path.exists(f"{d}/dN_pTdpTdphidy_resonance_decays.dat")
    assert os.path.exists(f"{d}/dN_dpTdphidy_resonance_decays.dat")

    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    grid_mcids = np.asarray([211, -211, 113, 223])
    from is3d_tpu.io.tables import load_momentum_grid
    grid = load_momentum_grid(f"{reference_dir}/tables", 2, 1)
    cfg = Config(operation=1, mode=1, dimension=2, df_mode=1, hrg_eos=1,
                 do_resonance_decays=1)
    direct = dk.do_resonance_decays(np.asarray(smooth.spectra), table,
                                    grid_mcids, grid, cfg)
    np.testing.assert_allclose(np.asarray(decayed.spectra), direct,
                               rtol=1e-12, atol=0)


def test_three_body_shape_vs_monte_carlo():
    """omega -> pi+ pi- pi0: integral feed-down pT shape vs a phase-space
    Monte-Carlo decay simulation (flat matrix element, like the kernel)."""
    rng = np.random.default_rng(12)
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=6.0, n_phi=24,
                                n_eta=8)
    M, m1, m2, m3 = 0.783, 0.138, 0.138, 0.135
    b, c, v2 = 3.2, 3.0, 0.0

    spec = parent_spectrum(grid, M, b=b, c=c, v2=v2)
    pT_grid = np.asarray(grid.pT)
    logdN, tc, ts, MT_grid = dk._prepare_parent(spec[0], pT_grid, M)
    s_plus = (M - m1) ** 2
    s_minus = (m2 + m3) ** 2
    d_ = (m2 - m3) ** 2
    Q = dk._q_factor(M, m1, m2, m3)
    pref = 1.0 * M * M * (s_plus - s_minus) * 1.0 / (8.0 * Q)
    feed = pref * np.asarray(dk._three_body_integral(
        jnp.asarray(logdN), jnp.asarray(tc), jnp.asarray(ts),
        jnp.asarray(MT_grid), jnp.asarray(pT_grid), jnp.asarray(grid.phi),
        jnp.asarray(grid.y), m1 * m1, M, s_minus, s_plus, d_, 2))

    # ---- MC: sample parents, decay via s-distribution g(s), isotropic
    N = 1_000_000
    Yr = 8.0
    Y = rng.uniform(-Yr, Yr, N)
    MT = np.empty(N)
    got = 0
    while got < N:
        k = (N - got) * 2
        cand = M + rng.exponential(1.0 / b, k)
        acc = rng.uniform(0, 1, k) < (cand / (M + 40.0 / b))
        sel = cand[acc][: N - got]
        MT[got:got + len(sel)] = sel
        got += len(sel)
    Phi = rng.uniform(0, 2 * np.pi, N)

    # invariant mass^2 of the (2,3) pair from the Dalitz phase-space density
    # rho(s) ~ p*(s) q*(s) sqrt(s)/s = sqrt((a-s)(b-s)(s-c)(s-d))/(2s)
    # (the Q-factor integrand; p* from sqrt((a-s)(b-s)) = 2 M p*)
    a_ = (M + m1) ** 2
    sgrid = np.linspace(s_minus, s_plus, 2000)[1:-1]
    rho = lambda s: np.sqrt(np.maximum(
        (a_ - s) * (s_plus - s) * (s - s_minus) * (s - d_), 0.0)) / s
    rho_max = rho(sgrid).max()
    svals = np.empty(N)
    got = 0
    while got < N:
        k = (N - got) * 3
        cand = rng.uniform(s_minus, s_plus, k)
        acc = rng.uniform(0, rho_max, k) < rho(cand)
        sel = cand[acc][: N - got]
        svals[got:got + len(sel)] = sel
        got += len(sel)

    Estar = (M * M + m1 * m1 - svals) / (2 * M)
    pstar = np.sqrt(np.maximum(Estar**2 - m1 * m1, 0))
    cth = rng.uniform(-1, 1, N)
    ph = rng.uniform(0, 2 * np.pi, N)
    sth = np.sqrt(1 - cth**2)
    ps = pstar[:, None] * np.stack([sth * np.cos(ph), sth * np.sin(ph), cth], 1)

    PT = np.sqrt(MT**2 - M**2)
    P0 = MT * np.cosh(Y)
    Pvec = np.stack([PT * np.cos(Phi), PT * np.sin(Phi), MT * np.sinh(Y)], 1)
    psP = np.einsum("ni,ni->n", ps, Pvec)
    coef = psP / (M * (P0 + M)) + Estar / M
    plab = ps + coef[:, None] * Pvec
    E = np.sqrt(m1 * m1 + np.einsum("ni,ni->n", plab, plab))
    yd = 0.5 * np.log((E + plab[:, 2]) / (E - plab[:, 2]))
    pTd = np.hypot(plab[:, 0], plab[:, 1])

    from scipy.integrate import quad
    nY = 2 * np.pi * np.exp(c) * quad(lambda x: x * np.exp(-b * x), M, np.inf)[0]
    w = nY * (2 * Yr) / N

    sel = np.abs(yd) < 0.5
    edges = np.array([0.05, 0.15, 0.25, 0.35, 0.5, 0.7, 1.0])
    counts, _ = np.histogram(pTd[sel], bins=edges)
    mc = counts * w / np.diff(edges)

    phiw = np.asarray(grid.phi_weight)
    dphi_int = np.einsum("pf,f->p", feed[:, :, 0], phiw) * pT_grid
    centers = 0.5 * (edges[1:] + edges[:-1])
    integ = np.interp(centers, pT_grid, dphi_int)
    stat = np.sqrt(np.maximum(counts, 1)) * w / np.diff(edges)
    for i in range(len(centers)):
        assert abs(mc[i] - integ[i]) < 5 * stat[i] + 0.05 * integ[i], \
            (i, centers[i], mc[i], integ[i])


def test_wave_batching_matches_sequential_cascade(reference_dir):
    """The levelized wave dispatch must reproduce the reference's literal
    heaviest -> lightest sequential cascade exactly, including feed-down
    from *lighter* parents into heavier daughters opened by the width
    shift (those adds land after the heavy daughter's own decay)."""
    from is3d_tpu.io import pdg
    from is3d_tpu.kernels.decays import _do_resonance_decays_impl

    table = pdg.read_resonances(f"{reference_dir}/PDG", 2)
    mcids_all = np.asarray(table.mc_id)
    S = len(mcids_all)
    # moderate subset exercising multi-wave cascades in a few seconds
    keep = sorted(set(range(0, S, 8))
                  | {int(np.nonzero(mcids_all == m)[0][0])
                     for m in (211, -211, 111, 321, -321, 2212, -2212,
                               113, 213, 223, 331, 3122)})
    mcids = mcids_all[keep]

    grid = native_momentum_grid(dimension=2, n_pT=16, n_phi=12, n_y=1)
    pT = np.asarray(grid.pT)
    mass = np.asarray(table.mass)[keep]
    MT = np.sqrt(pT[None, :, None, None] ** 2 + mass[:, None, None, None] ** 2)
    spectra = np.exp(-MT / 0.15) * (
        1 + 0.2 * np.cos(2 * np.asarray(grid.phi))[None, None, :, None])

    cfg = Config(operation=1, dimension=2, lightest_particle=111)
    seq = _do_resonance_decays_impl(spectra, table, mcids, grid, cfg,
                                    jnp.float64, sequential=True)
    wav = _do_resonance_decays_impl(spectra, table, mcids, grid, cfg,
                                    jnp.float64, sequential=False)
    scale = np.abs(seq).max()
    np.testing.assert_allclose(wav, seq, rtol=5e-13, atol=5e-13 * scale)


def test_hat_contraction_matches_gather_interpolation():
    """The gather-free hat-basis evaluation (TPU path) must equal the
    stencil-gather interpolation (CPU path) for both decay topologies and
    both dimensions, including MT-tail, phi-wraparound and |Y|-mask edges."""
    rng = np.random.default_rng(5)
    P, F, NY = 16, 12, 7
    pT = np.sort(rng.uniform(0.05, 3.0, P))
    phi = np.sort(rng.uniform(0.02, 2 * np.pi - 0.02, F))
    for dim, Yn in ((2, 1), (3, NY)):
        y = np.linspace(-3.0, 3.0, Yn) if Yn > 1 else np.array([0.0])
        logdN = jnp.asarray(rng.normal(size=(P, F, Yn)) - 2.0)
        tc = jnp.asarray(rng.normal(size=(F, Yn)))
        ts = jnp.asarray(-np.abs(rng.normal(size=(F, Yn))) - 0.5)
        MTg = jnp.asarray(np.sqrt(pT ** 2 + 0.775 ** 2))
        args = (logdN, tc, ts, MTg, jnp.asarray(pT), jnp.asarray(phi),
                jnp.asarray(y), 0.0196, 0.36, 0.31, 0.775)
        a = np.asarray(dk._two_body_integral(*args, dim, False))
        b = np.asarray(dk._two_body_integral(*args, dim, True))
        np.testing.assert_allclose(b, a, rtol=5e-13, atol=1e-300)
        args3 = (logdN, tc, ts, MTg, jnp.asarray(pT), jnp.asarray(phi),
                 jnp.asarray(y), 0.0196, 0.775, 0.1, 0.36, 0.01)
        a = np.asarray(dk._three_body_integral(*args3, dim, False))
        b = np.asarray(dk._three_body_integral(*args3, dim, True))
        np.testing.assert_allclose(b, a, rtol=5e-13, atol=1e-300)


def test_zero_width_subthreshold_channel_is_closed(reference_dir):
    """A sub-threshold 2-body channel whose parent and daughter widths are
    ALL zero cannot be opened by the width shift; it must be treated as
    closed instead of hanging the pass (trimmed/user tables can contain
    such entries)."""
    import dataclasses
    from is3d_tpu.io import pdg
    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    ti = table.index_of_mcid(113)            # rho0 -> pi+ pi-
    mass = table.mass.copy()
    width = table.width.copy()
    mass[ti] = 0.1                           # below 2 m_pi
    width[ti] = 0.0
    for m in (211, -211):
        width[table.index_of_mcid(m)] = 0.0
    t2 = dataclasses.replace(table, mass=mass, width=width) \
        if dataclasses.is_dataclass(table) else None
    if t2 is None:
        import copy
        t2 = copy.copy(table)
        t2.mass, t2.width = mass, width
    grid = native_momentum_grid(dimension=2, n_pT=8, pT_max=3.0, n_phi=4,
                                n_eta=4)
    mcids = np.asarray([211, -211, 113])
    spectra = np.zeros((3, grid.n_pT, grid.n_phi, 1))
    spectra[2] = 1e-3
    cfg = Config(dimension=2, do_resonance_decays=1, lightest_particle=111)
    out = dk.do_resonance_decays(spectra, t2, mcids, grid, cfg)
    # channel closed: pions gain nothing, and we did not hang
    np.testing.assert_allclose(out[0], spectra[0])


def test_massless_daughter_f32_finite(reference_dir):
    """Regression: photon daughters (mass 0) made the f32 cascade NaN --
    mT == pT exactly, so the naive denom = mT^2 cosh^2 - pT^2 cancels to
    a rounded 0 at small v*DeltaY and MTbar/Phip hit inf/inf.  The
    cancellation-free identities (denom = m^2 + mT^2 sinh^2,
    pstar^2 - mT^2 sinh^2) must keep every f32 output finite AND agree
    with f64 to the documented ~1e-5 wave accuracy."""
    import jax.numpy as jnp
    from is3d_tpu.io import pdg
    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    mcids_all = np.asarray(table.mc_id)
    # photon + a radiative parent population (every 16th species catches
    # several photon channels) + identified particles
    keep = sorted(set(range(0, len(mcids_all), 16))
                  | {int(np.nonzero(mcids_all == m)[0][0])
                     for m in (22, 211, -211, 111, 113, 223, 331)})
    mcids = mcids_all[keep]
    assert 22 in mcids
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=12, n_eta=8)
    mass = np.asarray(table.mass)[keep]
    MT = np.sqrt(np.asarray(grid.pT)[None, :, None, None] ** 2
                 + mass[:, None, None, None] ** 2)
    base = np.broadcast_to(np.exp(-MT / 0.15),
                           (len(keep), grid.n_pT, grid.n_phi, 1)).copy()
    cfg = Config(dimension=2, lightest_particle=111)
    f64 = dk._do_resonance_decays_impl(base.copy(), table, mcids, grid,
                                       cfg, jnp.float64)
    f32 = dk._do_resonance_decays_impl(base.copy(), table, mcids, grid,
                                       cfg, jnp.float32)
    assert np.isfinite(f64).all()
    assert np.isfinite(f32).all()
    i_ph = int(np.nonzero(mcids == 22)[0][0])
    assert np.abs(f64[i_ph] - base[i_ph]).max() > 0   # photon feed-down real
    scale = np.abs(f64).max()
    rel = np.abs(f32 - f64) / np.maximum(np.abs(f64), 1e-9 * scale)
    assert rel.max() < 1e-3, rel.max()
