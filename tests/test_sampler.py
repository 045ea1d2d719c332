"""Monte-Carlo sampler: statistical parity with the smooth spectra.

The reference validates its sampler by binning event-averaged histograms and
overlaying them on the smooth Cooper-Frye output of the same surface
(scripts/compare_sampling_smooth.py; SURVEY.md section 4.1).  These tests do
the same quantitatively: per-species yields, mean pT, and pT-spectrum shape
must agree with the smooth kernel within Monte-Carlo error.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.data import SpeciesArrays
from is3d_tpu.io.surface import Surface, ThermoAverages
from is3d_tpu.io.tables import native_momentum_grid, gauss_laguerre
from is3d_tpu.units import TWO_PI2_HBARC3
from is3d_tpu.physics import thermal
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu.kernels.sample import sample_particles, calculate_total_yield
from is3d_tpu import observables

from test_smooth import smash_table, df_data, pikp_species, random_cells, to_surface  # noqa: F401


PLASMA = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)


def equilibrium_density(mass, deg, sign, baryon, T, alphaB=0.0):
    """Host-side neq (GeV^0 fm^-3) via 32-pt Gauss-Laguerre."""
    r1, w1 = gauss_laguerre(32, alphas=(1,))[1]
    mbar = jnp.asarray(np.atleast_1d(mass)) / T
    out = T**3 / TWO_PI2_HBARC3 * np.asarray(deg) * np.asarray(
        thermal.gauss_thermal(thermal.neq_int, jnp.asarray(r1), jnp.asarray(w1),
                              mbar, alphaB, jnp.asarray(np.atleast_1d(baryon)),
                              jnp.asarray(np.atleast_1d(sign))))
    return out


def species_with_densities(table, T):
    sp = pikp_species(table)
    neq = equilibrium_density(np.asarray(sp.mass), np.asarray(sp.degeneracy),
                              np.asarray(sp.sign), np.asarray(sp.baryon), T)
    return sp.replace(equilibrium_density=jnp.asarray(neq))


MCIDS = np.asarray([211, -211, 321, -321, 2212, -2212], dtype=np.int32)


def small_surface(n=24, seed=4, dimension=2):
    rng = np.random.default_rng(seed)
    cells = random_cells(n, rng, dimension=dimension)
    return to_surface(cells)


# ---------------------------------------------------------------- total yield

def test_total_yield_ideal_single_cell(smash_table, df_data):
    """One cell at rest, ideal: yield = u.dsigma * sum_s neq_s * 2 y_cut."""
    T0 = 0.155
    n = 1
    z = np.zeros(n)
    surf = Surface(tau=jnp.ones(n) * 2.0, x=jnp.asarray(z), y=jnp.asarray(z),
                   eta=jnp.asarray(z), dat=jnp.ones(n) * 0.5,
                   dax=jnp.asarray(z), day=jnp.asarray(z), dan=jnp.asarray(z),
                   ux=jnp.asarray(z), uy=jnp.asarray(z), un=jnp.asarray(z),
                   T=jnp.ones(n) * T0, E=jnp.ones(n) * 0.33,
                   P=jnp.ones(n) * 0.057)
    cfg = Config(operation=2, dimension=2, df_mode=1, y_cut=4.0)
    sp = species_with_densities(smash_table, T0)
    got = calculate_total_yield(surf, sp, df_data, cfg, PLASMA)
    want = 0.5 * float(np.sum(np.asarray(sp.equilibrium_density))) * 2.0 * 4.0
    np.testing.assert_allclose(got, want, rtol=1e-10)


# ------------------------------------------------------------- determinism

def test_sampler_deterministic(smash_table, df_data):
    surf = small_surface()
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=17)
    sp = species_with_densities(smash_table, 0.155)
    ev1 = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                           nevents=3)
    ev2 = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                           nevents=3)
    assert len(ev1) == len(ev2) == 3
    for a, b in zip(ev1, ev2):
        assert a["mcid"].shape == b["mcid"].shape
        np.testing.assert_array_equal(a["mcid"], b["mcid"])
        np.testing.assert_allclose(a["px"], b["px"], rtol=0, atol=0)


def test_sampled_particles_on_shell(smash_table, df_data):
    surf = small_surface(seed=9)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=3)
    sp = species_with_densities(smash_table, 0.155)
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=5)
    allm = np.concatenate([e["mass"] for e in events])
    assert allm.size > 0
    for e in events:
        E2 = e["mass"]**2 + e["px"]**2 + e["py"]**2 + e["pz"]**2
        np.testing.assert_allclose(e["E"]**2, E2, rtol=1e-10)
        # rapidity consistent with (E, pz)
        np.testing.assert_allclose(e["yp"], 0.5 * np.log((e["E"] + e["pz"])
                                                         / (e["E"] - e["pz"])),
                                   rtol=1e-8, atol=1e-10)
        # positions on the tau hypersurface
        np.testing.assert_allclose(e["t"]**2 - e["z"]**2, e["tau"]**2,
                                   rtol=1e-10)


# ----------------------------------------- statistical parity with smooth CF

@pytest.mark.parametrize("df_mode", [1, 2])
def test_sampler_matches_smooth(smash_table, df_data, df_mode):
    """Event-averaged per-species dN/dy and <pT> vs the smooth kernel."""
    surf = small_surface(n=24, seed=11)
    y_cut = 4.0
    cfg = Config(operation=2, dimension=2, df_mode=df_mode,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=y_cut, sampler_seed=42)
    sp = species_with_densities(smash_table, 0.155)

    # smooth side: same df options, fine pT grid
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    smooth_cfg = cfg.replace(operation=1, cell_chunk=32)
    spectra = smooth_spectra(surf, sp, grid, df_data, smooth_cfg)
    dNdy_smooth = np.asarray(observables.dN_dy(spectra, grid))[:, 0]
    meanpT_smooth = np.asarray(observables.mean_pT(spectra, grid))[:, 0]

    nev = 600
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    mcid_all = np.concatenate([e["mcid"] for e in events])
    pT_all = np.concatenate([np.hypot(e["px"], e["py"]) for e in events])

    for i, mcid in enumerate(MCIDS):
        sel = mcid_all == mcid
        n_s = sel.sum()
        dNdy_sampled = n_s / (2.0 * y_cut) / nev
        sigma = np.sqrt(max(n_s, 1)) / (2.0 * y_cut) / nev
        assert abs(dNdy_sampled - dNdy_smooth[i]) < 5.0 * sigma + 0.02 * dNdy_smooth[i], \
            (mcid, dNdy_sampled, dNdy_smooth[i])
        mean_pT_sampled = pT_all[sel].mean()
        tol = 5.0 * pT_all[sel].std() / np.sqrt(n_s) + 0.01 * meanpT_smooth[i]
        assert abs(mean_pT_sampled - meanpT_smooth[i]) < tol, \
            (mcid, mean_pT_sampled, meanpT_smooth[i])


def test_sampler_pT_shape_vs_smooth(smash_table, df_data):
    """Coarse-binned pion pT histogram vs the smooth spectrum prediction."""
    surf = small_surface(n=24, seed=11)
    y_cut = 4.0
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=y_cut, sampler_seed=7)
    sp = species_with_densities(smash_table, 0.155)
    grid = native_momentum_grid(dimension=2, n_pT=64, pT_max=5.0, n_phi=24,
                                n_eta=48)
    spectra = smooth_spectra(surf, sp, grid, df_data,
                             cfg.replace(operation=1, cell_chunk=32))
    # smooth prediction of the pion pT pdf on coarse bins.  The bins must
    # come from an interpolated fine-grid integral: restricting the
    # Gauss-Legendre (node, weight) sums to a sub-interval mis-bins a
    # steep spectrum by tens of percent (oracle.bin_fractions_from_grid)
    from oracle import bin_fractions_from_grid
    dNpT = np.asarray(observables.dN_twopipTdpTdy(spectra, grid))[0, :, 0]
    edges = np.array([0.0, 0.3, 0.6, 1.0, 1.5, 5.0])
    pred = bin_fractions_from_grid(np.asarray(grid.pT), dNpT, edges)

    nev = 600
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    mcid_all = np.concatenate([e["mcid"] for e in events])
    pT_all = np.concatenate([np.hypot(e["px"], e["py"]) for e in events])
    pi = pT_all[mcid_all == 211]
    counts, _ = np.histogram(pi, bins=edges)
    frac = counts / counts.sum()
    sig = np.sqrt(np.maximum(counts, 1)) / counts.sum()
    assert np.all(np.abs(frac - pred) < 5.0 * sig + 0.01), (frac, pred)


@pytest.mark.parametrize("df_mode", [3, 4])
def test_sampler_feqmod_runs_and_reasonable(smash_table, df_data, df_mode):
    """feqmod sampling path: runs, on-shell, and total yield within 15% of
    the smooth kernel (feqmod momentum rescale shifts individual momenta)."""
    surf = small_surface(n=16, seed=13)
    y_cut = 3.0
    cfg = Config(operation=2, dimension=2, df_mode=df_mode,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=y_cut, sampler_seed=5)
    sp = species_with_densities(smash_table, 0.155)
    nev = 400
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    n_tot = sum(len(e["mcid"]) for e in events)
    assert n_tot > 0
    for e in events[:10]:
        E2 = e["mass"]**2 + e["px"]**2 + e["py"]**2 + e["pz"]**2
        np.testing.assert_allclose(e["E"]**2, E2, rtol=1e-10)

    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    spectra = smooth_spectra_feqmod(surf, sp, grid, df_data,
                                    cfg.replace(operation=1, cell_chunk=16))
    yield_smooth = float(np.asarray(
        observables.dN_dy(spectra, grid))[:, 0].sum()) * 2.0 * y_cut
    yield_sampled = n_tot / nev
    assert abs(yield_sampled - yield_smooth) < 0.15 * yield_smooth + \
        5.0 * np.sqrt(n_tot) / nev, (yield_sampled, yield_smooth)


def test_sampler_mode4_strong_bulk_breakdown(smash_table, df_data):
    """df_mode 4 under strong negative bulk: cells where the feqmod
    transform loses positive definiteness (detA <= deta_min) must route to
    the linearized Jonah fallback in the SAMPLER too, mirroring the smooth
    kernel's documented divergence from the reference (which evaluates an
    indefinite transform there).  Checks breakdown cells actually occur,
    sampled events stay finite/on-shell, and the sampled yield tracks the
    smooth kernel, which shares the fallback policy."""
    from is3d_tpu.kernels.sample import _build_cell_data, _laguerre_device
    surf = small_surface(n=16, seed=13)
    surf = surf.replace(bulkPi=-0.9 * surf.P)
    y_cut = 3.0
    cfg = Config(operation=2, dimension=2, df_mode=4,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, y_cut=y_cut, sampler_seed=5)
    sp = species_with_densities(smash_table, 0.155)

    cell = _build_cell_data(surf, sp, df_data, cfg, PLASMA,
                            _laguerre_device(surf.tau.dtype))
    bk = np.asarray(cell["breakdown"])
    assert bk.any(), "strong-bulk surface should trip detA <= deta_min"

    nev = 400
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    n_tot = sum(len(e["mcid"]) for e in events)
    assert n_tot > 0
    for e in events[:10]:
        E2 = e["mass"]**2 + e["px"]**2 + e["py"]**2 + e["pz"]**2
        assert np.isfinite(e["E"]).all()
        np.testing.assert_allclose(e["E"]**2, E2, rtol=1e-10)

    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    spectra = smooth_spectra_feqmod(surf, sp, grid, df_data,
                                    cfg.replace(operation=1, cell_chunk=16))
    yield_smooth = float(np.asarray(
        observables.dN_dy(spectra, grid))[:, 0].sum()) * 2.0 * y_cut
    yield_sampled = n_tot / nev
    assert abs(yield_sampled - yield_smooth) < 0.15 * yield_smooth + \
        5.0 * np.sqrt(n_tot) / nev, (yield_sampled, yield_smooth)


def test_sampler_3d(smash_table, df_data):
    """3+1D surface: runs, on-shell, eta taken from the cells."""
    surf = small_surface(n=24, seed=21, dimension=3)
    cfg = Config(operation=2, dimension=3, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 sampler_seed=2)
    sp = species_with_densities(smash_table, 0.155)
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=20)
    allE = np.concatenate([e["E"] for e in events])
    assert allE.size > 0 and np.isfinite(allE).all()


def test_sampled_dNdX_matches_smooth(smash_table, df_data):
    """Sampled spacetime histograms vs the smooth dN/dX kernel (the
    reference's spacetime cross-validation, compare_sampling_smooth)."""
    from is3d_tpu.kernels.dndx import spacetime_distributions
    from is3d_tpu.histograms import sampler_test_histograms

    surf = small_surface(n=24, seed=11)
    y_cut = 4.0
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=y_cut, sampler_seed=19,
                 tau_min=0.0, tau_max=12.0, tau_bins=12,
                 r_min=0.0, r_max=12.0, r_bins=12,
                 pT_lower_cut=0.0, pT_upper_cut=3.0, pT_bins=30,
                 y_bins=40, eta_bins=40, eta_cut=7.0)
    sp = species_with_densities(smash_table, 0.155)

    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    dX = spacetime_distributions(surf, sp, grid, df_data,
                                 cfg.replace(operation=0, cell_chunk=32))

    nev = 400
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    hist = sampler_test_histograms(events, MCIDS, cfg)

    # compare the pion tau-distribution bin contents where populated
    pi_idx = 0
    smooth_tau = dX["dN_taudtaudy"][pi_idx]      # per (tau_mid dtau) per y
    sampled_tau = hist["dN_taudtaudy"][pi_idx]
    tau_mid = hist["tau_mid"]
    dtau = tau_mid[1] - tau_mid[0]
    counts = sampled_tau * tau_mid * dtau * nev * 2 * y_cut
    for i in range(len(tau_mid)):
        if smooth_tau[i] <= 0 and counts[i] == 0:
            continue
        sig = np.sqrt(max(counts[i], 1)) / (tau_mid[i] * dtau * nev * 2 * y_cut)
        assert abs(sampled_tau[i] - smooth_tau[i]) < 5 * sig + 0.02 * smooth_tau[i], \
            (i, sampled_tau[i], smooth_tau[i])

    smooth_r = dX["dN_twopirdrdy"][pi_idx]
    sampled_r = hist["dN_twopirdrdy"][pi_idx]
    r_mid = hist["r_mid"]
    dr = r_mid[1] - r_mid[0]
    counts_r = sampled_r * 2 * np.pi * r_mid * dr * nev * 2 * y_cut
    for i in range(len(r_mid)):
        if smooth_r[i] <= 0 and counts_r[i] == 0:
            continue
        sig = np.sqrt(max(counts_r[i], 1)) / (2 * np.pi * r_mid[i] * dr * nev
                                              * 2 * y_cut)
        assert abs(sampled_r[i] - smooth_r[i]) < 5 * sig + 0.02 * smooth_r[i], \
            (i, sampled_r[i], smooth_r[i])


def test_sampler_3d_yield_vs_smooth(smash_table, df_data):
    """3+1D: event-averaged total pion yield vs the smooth dN/dy integral."""
    surf = small_surface(n=24, seed=21, dimension=3)
    cfg = Config(operation=2, dimension=3, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 sampler_seed=6)
    sp = species_with_densities(smash_table, 0.155)
    grid = native_momentum_grid(dimension=3, n_pT=48, pT_max=5.0, n_phi=24,
                                n_y=41, y_max=6.0)
    spectra = smooth_spectra(surf, sp, grid, df_data,
                             cfg.replace(operation=1, cell_chunk=32))
    # total yield = int dy dN/dy (trapezoid over the y grid)
    dNdy = np.asarray(observables.dN_dy(spectra, grid))
    yw = np.asarray(grid.y_weight)
    want = float(np.einsum("sy,y->", dNdy, yw))

    nev = 300
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=nev)
    n_tot = sum(len(e["mcid"]) for e in events)
    got = n_tot / nev
    sigma = np.sqrt(n_tot) / nev
    assert abs(got - want) < 5 * sigma + 0.03 * want, (got, want)


def test_exact_yields_chunked_equals_block(smash_table, df_data):
    """The lax.map cell chunking of the exact per-cell yields is exact."""
    import jax.numpy as jnp
    from is3d_tpu.kernels import sample as smp
    from is3d_tpu.kernels.common import prepare_cells
    surf = small_surface(n=23, seed=31)
    sp = species_with_densities(smash_table, 0.155)
    for df_mode in (1, 3, 4):
        cfg = Config(operation=2, dimension=2, df_mode=df_mode,
                     include_shear_deltaf=1, include_bulk_deltaf=1,
                     regulate_deltaf=1, outflow=1)
        lag = smp._laguerre_device(jnp.float64)
        cols = smp._sampler_cols(surf, cfg)
        c = prepare_cells(cols, cfg, df_data)
        if df_mode in (3, 4):
            import numpy as _np
            c["breakdown"] = jnp.asarray(
                _np.random.default_rng(1).random(23) < 0.3)
        else:
            c["breakdown"] = jnp.zeros(23, dtype=bool)
        full = smp._species_yields_exact_block(c, sp, lag, cfg)
        chunked = smp._species_yields_exact(c, sp, lag, cfg, max_block=7)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   rtol=1e-14)


def test_alias_tables_reconstruct_pmf_exactly():
    """_alias_build's (prob, alias) tables realize EXACTLY the input
    categorical: P(v) = (prob[v] + sum_b (1 - prob[b]) [alias[b] = v]) / K
    must equal w_v / W to fp roundoff, for adversarial rows -- zeros
    (masked species), one dominant entry, uniform ties, K = 1."""
    import jax.numpy as jnp
    from is3d_tpu.kernels.sample import _alias_build

    rng = np.random.default_rng(7)
    rows = [
        rng.random(320),
        np.where(rng.random(320) < 0.5, 0.0, rng.random(320)),  # zeros
        np.concatenate([[1e6], rng.random(319) * 1e-6]),        # dominant
        np.ones(320),                                           # ties
        np.concatenate([np.zeros(200), rng.random(120)]),
    ]
    w = np.stack(rows)
    prob, alias = _alias_build(jnp.asarray(w, jnp.float64))
    prob, alias = np.asarray(prob), np.asarray(alias)
    K = w.shape[1]
    for r in range(w.shape[0]):
        got = prob[r].copy()
        np.add.at(got, alias[r], 1.0 - prob[r])
        np.testing.assert_allclose(got / K, w[r] / w[r].sum(),
                                   rtol=1e-12, atol=1e-15, err_msg=str(r))
        assert (prob[r] >= 0).all() and (prob[r] <= 1).all()
        # zero-weight entries are never produced: own prob 0, no inbound
        zero = w[r] == 0.0
        assert (prob[r][zero] == 0.0).all()
        assert not np.isin(alias[r][prob[r] < 1.0], np.nonzero(zero)[0]).any()

    # K = 1 and the all-zero row (uniform fallback; marginal weight 0)
    p1, a1 = _alias_build(jnp.asarray([[3.0]], jnp.float64))
    assert float(p1[0, 0]) == 1.0 and int(a1[0, 0]) == 0
    p0, a0 = _alias_build(jnp.zeros((1, 8), jnp.float64))
    assert np.isfinite(np.asarray(p0)).all()


def test_alias_tables_f32_rounding_bound():
    """Quantify the f32 production path's table rounding (the exactness
    test above runs f64): for adversarial weights -- 1e6 dynamic range,
    60%-zero rows, 512-wide cell blocks (the 2-level cell alias's row
    width at any surface size), 1e12 dominant-entry ratio -- the pmf the
    f32 (prob, alias) tables REALIZE must stay within 1e-6 total
    variation of the exact categorical per row (measured max 2.3e-7),
    with <= 2e-4 relative error on every nonzero entry and zero-weight
    entries exactly unreachable.  At 1e9 sampled hadrons a 1e-6 TV
    mis-allocates ~1e3 hadrons across all species -- two orders below the
    Poisson resolution sqrt(1e9) ~ 3e4 -- so the f32 tables are
    statistically indistinguishable from exact at any feasible event
    count.  This number is the 'up to fp rounding' phrase in
    _alias_build's docstring."""
    import jax.numpy as jnp
    from is3d_tpu.kernels.sample import _alias_build

    rng = np.random.default_rng(42)

    def realized(prob, alias):
        prob = np.asarray(prob, np.float64)
        alias = np.asarray(alias)
        out = np.zeros_like(prob)
        for r in range(prob.shape[0]):
            out[r] = prob[r].copy()
            np.add.at(out[r], alias[r], 1.0 - prob[r])
        return out / prob.shape[1]

    S = 444                                  # full SMASH species count
    w1 = rng.random((200, S)) * 10.0 ** rng.uniform(-6, 0, (200, S))
    w1[rng.random((200, S)) < 0.6] = 0.0     # zero-heavy species rows
    w2 = 10.0 ** rng.uniform(-3, 3, (256, 512))
    w2[rng.random((256, 512)) < 0.3] = 0.0   # wide-range cell blocks
    w3 = np.concatenate([np.full((64, 1), 1e6),
                         rng.random((64, 511)) * 1e-6], axis=1)

    for w in (w1, w2, w3):
        wf = w.astype(np.float32)
        prob, alias = _alias_build(jnp.asarray(wf))
        assert prob.dtype == jnp.float32
        got = realized(prob, alias)
        tgt = wf.astype(np.float64)
        tgt /= tgt.sum(axis=1, keepdims=True)
        tv = 0.5 * np.abs(got - tgt).sum(axis=1).max()
        assert tv < 1e-6, tv
        nz = tgt > 0
        rel = np.abs(got[nz] - tgt[nz]) / tgt[nz]
        assert rel.max() < 2e-4, rel.max()
        assert np.all(got[~nz] == 0.0)       # masked species stay masked


def test_alias_sampler_matches_binary_search_statistically(smash_table,
                                                           df_data):
    """The alias draw (sampler_alias=1, default) and the binary-search
    draw (=0) realize the same (cell, species) distribution: compare
    per-species yields over many events."""
    surf = small_surface(n=16, seed=3)
    sp = species_with_densities(smash_table, 0.155)
    base = Config(operation=2, dimension=2, df_mode=2,
                  include_shear_deltaf=1, include_bulk_deltaf=1,
                  regulate_deltaf=1, outflow=1, sampler_seed=11)
    nev = 400
    counts = {}
    for flag in (0, 1):
        ev = sample_particles(surf, sp, MCIDS, None, df_data,
                              base.replace(sampler_alias=flag), PLASMA,
                              nevents=nev)
        mc = np.concatenate([e["mcid"] for e in ev])
        counts[flag] = np.array([(mc == m).sum() for m in MCIDS], float)
    tot0, tot1 = counts[0].sum(), counts[1].sum()
    sigma = np.sqrt(counts[0] + counts[1] + 1.0)
    diff = np.abs(counts[0] - counts[1])
    assert tot0 > 0 and abs(tot0 - tot1) < 5 * np.sqrt(tot0 + tot1)
    assert (diff < 5 * sigma + 0.02 * (counts[0] + counts[1])).all(), (
        counts[0], counts[1])


def test_event_partition_union_byte_identical(smash_table, df_data):
    """The union of (k, n) event-partition slices equals the full run
    event for event, byte for byte -- the exactness contract the pod
    sampler (api operation=2 under jax.distributed) is built on.  Uneven
    n=3 over 10 events covers ragged slices."""
    surf = small_surface(n=16, seed=12)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 sampler_seed=42)
    sp = species_with_densities(smash_table, 0.155)
    full = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                            nevents=10)
    union = []
    for k in range(3):
        union += sample_particles(surf, sp, MCIDS, None, df_data, cfg,
                                  PLASMA, nevents=10, event_partition=(k, 3))
    assert len(full) == len(union) == 10
    assert sum(len(e["mcid"]) for e in full) > 0
    for a, b in zip(full, union):
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


def test_sampler_tetrad_recompute_equivalent(smash_table, df_data):
    """sampler_gather_tetrad=0 (rebuild the Milne basis per slot from the
    gathered (u, tau) instead of gathering Xt..Zn) must keep every event's
    hadron COUNT and identity exactly (the RNG streams and the keep
    decision never touch the tetrad) and reproduce lab momenta to fp
    roundoff of the same formula."""
    surf = small_surface(n=24, seed=13)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=77)
    sp = species_with_densities(smash_table, 0.155)
    ev_g = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                            nevents=6)
    ev_r = sample_particles(surf, sp, MCIDS, None, df_data,
                            cfg.replace(sampler_gather_tetrad=0), PLASMA,
                            nevents=6)
    assert len(ev_g) == len(ev_r) == 6
    assert sum(len(e["mcid"]) for e in ev_g) > 0
    for a, b in zip(ev_g, ev_r):
        np.testing.assert_array_equal(a["mcid"], b["mcid"])
        for k in ("tau", "x", "y"):           # positions ride the cell index
            np.testing.assert_array_equal(a[k], b[k])
        for k in ("px", "py", "pz", "E"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, atol=1e-7,
                                       err_msg=k)


# ------------------------------------------------- cell-chunked sampling

def test_cell_chunked_deterministic_and_onshell(smash_table, df_data):
    """Forced cell chunking (sampler_cell_chunk=8 on a 24-cell surface =
    3 chunks incl. shape padding): deterministic in (surface, seed,
    chunk plan); every hadron on-shell, on the tau hypersurface, schema
    complete."""
    surf = small_surface(n=20, seed=6)       # 20 cells -> 8+8+4(pad) chunks
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=5, sampler_cell_chunk=8)
    sp = species_with_densities(smash_table, 0.155)
    ev1 = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                           nevents=4)
    ev2 = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                           nevents=4)
    assert len(ev1) == len(ev2) == 4
    assert sum(len(e["mcid"]) for e in ev1) > 0
    from is3d_tpu.kernels.sample import EVENT_FIELDS
    for a, b in zip(ev1, ev2):
        assert set(a) == set(EVENT_FIELDS)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        E2 = a["mass"]**2 + a["px"]**2 + a["py"]**2 + a["pz"]**2
        np.testing.assert_allclose(a["E"]**2, E2, rtol=1e-10)
        np.testing.assert_allclose(a["t"]**2 - a["z"]**2, a["tau"]**2,
                                   rtol=1e-10)


def test_cell_chunked_matches_unchunked_statistically(smash_table, df_data):
    """Chunked sampling is the SAME distribution (Poisson superposition
    over disjoint cell chunks): per-species yields and mean pT agree with
    the unchunked path within combined MC error over 400 events."""
    surf = small_surface(n=24, seed=11)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=4.0, sampler_seed=42)
    sp = species_with_densities(smash_table, 0.155)
    nev = 400
    ev_u = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                            nevents=nev)
    ev_c = sample_particles(surf, sp, MCIDS, None, df_data,
                            cfg.replace(sampler_cell_chunk=7), PLASMA,
                            nevents=nev)
    mc_u = np.concatenate([e["mcid"] for e in ev_u])
    mc_c = np.concatenate([e["mcid"] for e in ev_c])
    pT_u = np.hypot(np.concatenate([e["px"] for e in ev_u]),
                    np.concatenate([e["py"] for e in ev_u]))
    pT_c = np.hypot(np.concatenate([e["px"] for e in ev_c]),
                    np.concatenate([e["py"] for e in ev_c]))
    for mcid in MCIDS:
        n_u, n_c = int((mc_u == mcid).sum()), int((mc_c == mcid).sum())
        sig = np.sqrt(max(n_u, 1)) + np.sqrt(max(n_c, 1))
        assert abs(n_u - n_c) < 5 * sig + 2, (mcid, n_u, n_c)
        if min(n_u, n_c) > 100:
            m_u, m_c = pT_u[mc_u == mcid], pT_c[mc_c == mcid]
            se = (m_u.std() / np.sqrt(n_u) + m_c.std() / np.sqrt(n_c))
            assert abs(m_u.mean() - m_c.mean()) < 5 * se, mcid


def test_cell_chunked_event_partition_union_byte_identical(smash_table,
                                                           df_data):
    """Cell chunking composes with event partitioning: streams key on
    (chunk, GLOBAL event), so the union of event slices byte-equals the
    full chunked run -- pod sampling stays exact on chunked surfaces."""
    surf = small_surface(n=20, seed=12)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 sampler_seed=42, sampler_cell_chunk=8)
    sp = species_with_densities(smash_table, 0.155)
    full = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                            nevents=7)
    union = []
    for k in range(3):
        union += sample_particles(surf, sp, MCIDS, None, df_data, cfg,
                                  PLASMA, nevents=7, event_partition=(k, 3))
    assert len(full) == len(union) == 7
    assert sum(len(e["mcid"]) for e in full) > 0
    for a, b in zip(full, union):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


def test_cell_chunked_total_yield_and_inert_chunk(smash_table, df_data):
    """calculate_total_yield through the chunked scalar pre-pass equals
    the unchunked mean to fp tolerance; a chunk of entirely invalid
    cells (udsigma <= 0) contributes nothing and is skipped without
    disturbing the other chunks' events."""
    surf = small_surface(n=20, seed=8)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 sampler_seed=3)
    sp = species_with_densities(smash_table, 0.155)
    want = calculate_total_yield(surf, sp, df_data, cfg, PLASMA)
    got = calculate_total_yield(surf, sp, df_data,
                                cfg.replace(sampler_cell_chunk=8), PLASMA)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # kill chunk 1 (cells 8..16): dsigma = 0 -> invalid everywhere there
    import jax.numpy as jnp_
    mask = np.ones(20)
    mask[8:16] = 0.0
    surf2 = surf.replace(
        dat=surf.dat * jnp_.asarray(mask), dax=surf.dax * jnp_.asarray(mask),
        day=surf.day * jnp_.asarray(mask), dan=surf.dan * jnp_.asarray(mask))
    ev = sample_particles(surf2, sp, MCIDS, None, df_data,
                          cfg.replace(sampler_cell_chunk=8), PLASMA,
                          nevents=6)
    assert len(ev) == 6
    allx = np.concatenate([e["x"] for e in ev])
    assert allx.size > 0
    # no hadron originates from the killed cells
    dead_x = set(np.asarray(surf.x)[8:16].tolist())
    assert not any(float(x) in dead_x for x in allx)


def test_event_partition_validates():
    import pytest as _pytest
    from is3d_tpu.kernels.sample import sample_particles as sp_fn
    with _pytest.raises(ValueError, match="0 <= k < n"):
        sp_fn(None, None, None, None, None, None, None,
              event_partition=(3, 3))


def test_exact_yields_df_field_contract(smash_table, df_data):
    """YIELDS_DF_FIELDS is the COMPLETE set of DeltafCoefficients fields
    the block reads: with every other field NaN'd, the output stays finite
    and equal.  If a future df term reads an undeclared field, this fails
    (and the chunked path would NaN loudly rather than see silent zeros)."""
    import dataclasses
    import jax.numpy as jnp
    from is3d_tpu.io.deltaf import DeltafCoefficients
    from is3d_tpu.kernels import sample as smp
    from is3d_tpu.kernels.common import prepare_cells
    surf = small_surface(n=11, seed=5)
    sp = species_with_densities(smash_table, 0.155)
    for df_mode in (1, 2, 3, 4):
        cfg = Config(operation=2, dimension=2, df_mode=df_mode,
                     include_shear_deltaf=1, include_bulk_deltaf=1,
                     regulate_deltaf=1, outflow=1)
        lag = smp._laguerre_device(jnp.float64)
        cols = smp._sampler_cols(surf, cfg)
        c = prepare_cells(cols, cfg, df_data)
        c["breakdown"] = jnp.zeros(11, dtype=bool)
        want = smp._species_yields_exact_block(c, sp, lag, cfg)
        nan = jnp.full_like(c["T"], jnp.nan)
        vals = {f.name: nan for f in dataclasses.fields(DeltafCoefficients)}
        for k in smp.YIELDS_DF_FIELDS:
            vals[k] = getattr(c["df"], k)
        c2 = dict(c)
        c2["df"] = DeltafCoefficients(**vals)
        got = smp._species_yields_exact_block(c2, sp, lag, cfg)
        assert np.isfinite(np.asarray(got)).all(), df_mode
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-14)


def test_row_categorical_matches_count_draw():
    """The binary-search species draw equals the count formula
    sum(cum < v) for every S, including powers of two (a one-iteration-
    short search mis-assigns ~1/4 of draws at S = 2^k)."""
    import jax.numpy as jnp
    from is3d_tpu.kernels.sample import _row_categorical
    rng = np.random.default_rng(3)
    for S in (2, 3, 4, 7, 8, 16, 739):
        C = 5
        rows = rng.random((C, S)) + 1e-3
        rowcum = np.cumsum(rows, axis=1)
        N = 4096
        cidx = rng.integers(0, C, N)
        v = rng.random(N) * rowcum[cidx, -1]
        want = (rowcum[cidx] < v[:, None]).sum(axis=1)
        got = np.asarray(_row_categorical(
            jnp.asarray(rowcum), jnp.asarray(cidx, dtype=jnp.int32),
            jnp.asarray(v)))
        np.testing.assert_array_equal(got, want), S


def test_sampler_f16_pack_error_bounds(smash_table, df_data):
    """The f16 D2H packing (cfg.sampler_pack='f16', default) must produce
    the same hadrons as exact f32 transfer with only transfer-rounding
    differences: identical mcids, momenta within 2^-11 relative, positions
    within the f16 quantum, and E exactly on-shell."""
    surf = small_surface(n=16, seed=21)
    sp = species_with_densities(smash_table, 0.155)
    base = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                  include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                  y_cut=2.0, sampler_seed=77)
    ev16 = sample_particles(surf, sp, MCIDS, None, df_data,
                            base.replace(sampler_pack="f16"), PLASMA,
                            nevents=20, seed=77)
    ev32 = sample_particles(surf, sp, MCIDS, None, df_data,
                            base.replace(sampler_pack="f32"), PLASMA,
                            nevents=20, seed=77)
    n16 = sum(len(e["mcid"]) for e in ev16)
    assert n16 == sum(len(e["mcid"]) for e in ev32) and n16 > 50
    for a, b in zip(ev16, ev32):
        np.testing.assert_array_equal(a["mcid"], b["mcid"])
        for k in ("px", "py", "pz"):
            np.testing.assert_allclose(a[k], b[k], rtol=2**-11, atol=1e-6)
        for k in ("tau", "x", "y", "eta"):
            # f16 quantum at |v| <= 32 is 2^-11 * 32
            np.testing.assert_allclose(a[k], b[k], atol=2**-11 * 32)
        # E rebuilt on-shell from the rounded momenta
        np.testing.assert_allclose(
            a["E"], np.sqrt(a["mass"]**2 + a["px"]**2 + a["py"]**2
                            + a["pz"]**2), rtol=1e-6)


# ------------------------------------------- zero-yield and bf16 robustness

def test_zero_yield_surface_returns_schema_complete_events(smash_table,
                                                           df_data, tmp_path):
    """All cells with u.dsigma <= 0 must yield empty events that still
    carry the full EVENT_FIELDS schema (writers/histograms index them
    unconditionally)."""
    from is3d_tpu import writers
    from is3d_tpu.kernels.sample import EVENT_FIELDS
    surf = small_surface(n=8, seed=11)
    surf = surf.replace(dat=-jnp.abs(surf.dat) - 1.0,
                        dax=jnp.zeros_like(surf.dax),
                        day=jnp.zeros_like(surf.day))
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1)
    sp = species_with_densities(smash_table, 0.155)
    events = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                              nevents=3, seed=1)
    assert len(events) == 3
    for e in events:
        assert set(e) == set(EVENT_FIELDS)
        assert all(len(e[k]) == 0 for k in EVENT_FIELDS)
    # downstream consumers accept them
    writers.write_particle_list_oscar(events, str(tmp_path / "o.dat"))


def test_sampler_bf16_surface_upcasts_statistics(smash_table, df_data):
    """bf16 surfaces must not run the sampler's statistical spine in bf16:
    the cell-CDF cumsum saturates with an 8-bit mantissa (cells silently
    stop emitting).  The sampler upcasts to f32 at its boundary."""
    import jax
    from is3d_tpu.kernels.sample import _build_cell_data, _laguerre_device
    surf = small_surface(n=24, seed=4)
    surf_bf16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if v is not None and jnp.issubdtype(v.dtype, jnp.floating) else v,
        surf)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1)
    sp16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), 
                        species_with_densities(smash_table, 0.155))
    cell = _build_cell_data(surf_bf16, sp16, df_data, cfg, PLASMA,
                            _laguerre_device(jnp.float32))
    assert cell["cum_dn"].dtype == jnp.float32
    assert cell["rowcum"].dtype == jnp.float32
    events = sample_particles(surf_bf16, sp16, MCIDS, None, df_data, cfg,
                              PLASMA, nevents=2, seed=3)
    assert sum(len(e["mcid"]) for e in events) > 0


def test_transfer_pack_helpers():
    """Host-side transfer-layout helpers: fused-index bit budget and the
    bucketed slice length (kernels/sample)."""
    from is3d_tpu.kernels.sample import (_index_pack_bits, _pack_fields,
                                         _bucket_len, _transfer_granule)
    from is3d_tpu.config import Config

    # 320 species x 65536 cells (indices 0..65535): 9 + 16 bits -> fused
    cb = _index_pack_bits(320, 65536)
    assert cb == 16
    assert (320 - 1) << cb < 2**31
    # does not fit 31 bits -> separate sidx/cidx fields
    assert _index_pack_bits(600, 2**26) is None
    cfg2 = Config(dimension=2)
    cfg3 = Config(dimension=3)
    assert _pack_fields(cfg2, True) == ("scidx", "eta", "px", "py", "pz")
    assert _pack_fields(cfg3, True) == ("scidx", "px", "py", "pz")
    assert _pack_fields(cfg2, False)[:2] == ("sidx", "cidx")

    # bucketing: rounds up to the granule, caps at capacity, never 0
    g = _transfer_granule(1 << 20)
    assert g == (1 << 20) // 8
    assert _bucket_len(1, 1 << 20, g) == g
    assert _bucket_len(g + 1, 1 << 20, g) == 2 * g
    assert _bucket_len(1 << 20, 1 << 20, g) == 1 << 20
    assert _bucket_len((1 << 20) + 5, 1 << 20, g) == 1 << 20
    assert _bucket_len(0, 1 << 20, g) == g


def test_sampler_separate_index_fields_roundtrip(smash_table, df_data):
    """Events are identical whether the (species, cell) indices ship fused
    or as separate fields: force the fallback by a species/cell count that
    cannot fit 31 bits is impractical in-test, so instead exercise
    _reconstruct_packed on both layouts directly."""
    import jax.numpy as jnp
    from is3d_tpu.kernels.sample import (_reconstruct_packed,
                                         _index_pack_bits)
    from is3d_tpu.config import Config

    rng = np.random.default_rng(5)
    n_h, n_cells, n_sp = 257, 1000, 7
    cfg = Config(dimension=2)
    mcids = np.arange(1, n_sp + 1, dtype=np.int64) * 111
    mass = np.linspace(0.1, 1.9, n_sp)
    cellpos = {k: rng.uniform(1, 9, n_cells) for k in ("tau", "x", "y")}
    sidx = rng.integers(0, n_sp, n_h)
    cidx = rng.integers(0, n_cells, n_h)
    base = dict(eta=rng.normal(0, 1, n_h).astype(np.float32),
                px=rng.normal(0, 1, n_h).astype(np.float32),
                py=rng.normal(0, 1, n_h).astype(np.float32),
                pz=rng.normal(0, 1, n_h).astype(np.float32))

    cb = _index_pack_bits(n_sp, n_cells)
    fused = dict(base, scidx=((sidx.astype(np.int32) << cb)
                              | cidx.astype(np.int32)))
    sep = dict(base, sidx=sidx.astype(np.int16),
               cidx=cidx.astype(np.int32))
    _reconstruct_packed(fused, mcids, mass, cellpos, cfg)
    _reconstruct_packed(sep, mcids, mass, cellpos, cfg)
    for k in ("mcid", "mass", "tau", "x", "y", "eta", "E", "t", "z", "yp"):
        np.testing.assert_array_equal(fused[k], sep[k], err_msg=k)
    np.testing.assert_array_equal(fused["mcid"], mcids[sidx])
    np.testing.assert_array_equal(fused["tau"],
                                  cellpos["tau"][cidx].astype(np.float32))


@pytest.mark.parametrize("dimension", [2, 3])
def test_sampler_positions_exactly_from_cells(smash_table, df_data,
                                              dimension):
    """Every sampled hadron's (tau, x, y[, eta]) must be EXACTLY a surface
    cell's position: round 3 ships positions as a cell index against a
    host-side cell table (no f16 rounding), so set membership is exact.
    In 2+1D eta is per-hadron (sampled rapidity) and only (tau, x, y)
    are cell quantities."""
    surf = small_surface(n=24, seed=21, dimension=dimension)
    cfg = Config(operation=2, dimension=dimension, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, y_cut=3.0, sampler_seed=9)
    species = pikp_species(smash_table)
    mcids = np.array([211, -211, 321], dtype=np.int32)
    events = sample_particles(surf, species, mcids, None, df_data, cfg,
                              PLASMA, nevents=40 if dimension == 2 else 200)
    n_had = sum(len(e["mcid"]) for e in events)
    assert n_had > 100
    names = ("tau", "x", "y") if dimension == 2 else ("tau", "x", "y", "eta")
    cell_vals = {k: np.asarray(getattr(surf, k), np.float64) for k in names}
    # positions must map back to one consistent cell index per hadron
    for e in events:
        if not len(e["mcid"]):
            continue
        idx = None
        for k in names:
            # each value must be exactly some cell's value
            hits = np.isin(np.asarray(e[k], np.float64), cell_vals[k])
            assert hits.all(), k
            col = np.searchsorted(np.sort(cell_vals[k]), e[k])
            assert col.shape == e[k].shape
        # and the tuple must be a real cell (not a mix of two cells)
        key_cell = (cell_vals["tau"] * 1e9 + cell_vals["x"] * 1e3
                    + cell_vals["y"])
        key_had = (np.asarray(e["tau"], np.float64) * 1e9
                   + np.asarray(e["x"], np.float64) * 1e3
                   + np.asarray(e["y"], np.float64))
        assert np.isin(key_had, key_cell).all()
