"""Sampler-test histograms, writers, and ensemble observables."""

import numpy as np

from is3d_tpu.config import Config
from is3d_tpu.histograms import sampler_test_histograms, write_sampler_test
from is3d_tpu.analysis import compute_observables, is_charged


def make_events(rng, nev=4, n=300):
    events = []
    for _ in range(nev):
        mcid = rng.choice([211, -211, 321, 2212], n)
        pT = rng.exponential(0.4, n) + 0.01
        phi = rng.uniform(0, 2 * np.pi, n)
        yp = rng.uniform(-3, 3, n)
        eta = yp + rng.normal(0, 0.1, n)
        m = np.where(np.abs(mcid) == 211, 0.138,
                     np.where(np.abs(mcid) == 321, 0.494, 0.938))
        px, py = pT * np.cos(phi), pT * np.sin(phi)
        mT = np.sqrt(m**2 + pT**2)
        pz = mT * np.sinh(yp)
        E = mT * np.cosh(yp)
        events.append(dict(mcid=mcid, px=px, py=py, pz=pz, E=E, yp=yp,
                           eta=eta, tau=rng.uniform(1, 10, n),
                           x=rng.uniform(-8, 8, n), y=rng.uniform(-8, 8, n),
                           z=np.zeros(n), t=np.zeros(n), mass=m))
    return events


CFG = Config(y_cut=3.0, y_bins=30, eta_cut=4.0, eta_bins=40,
             pT_lower_cut=0.0, pT_upper_cut=3.0, pT_bins=30,
             tau_min=0.0, tau_max=12.0, tau_bins=24,
             r_min=0.0, r_max=12.0, r_bins=24)


def test_histogram_normalizations():
    rng = np.random.default_rng(2)
    events = make_events(rng, nev=4, n=5000)
    mcids = [211, -211, 321, 2212]
    h = sampler_test_histograms(events, mcids, CFG, mean_yield=123.0)
    nev = len(events)
    yw = 2 * CFG.y_cut / CFG.y_bins

    # total pi+ count within the y window recovered from dN/dy
    cat_mcid = np.concatenate([e["mcid"] for e in events])
    cat_yp = np.concatenate([e["yp"] for e in events])
    n_pip = np.sum((cat_mcid == 211) & (np.abs(cat_yp) <= CFG.y_cut))
    np.testing.assert_allclose(h["dN_dy"][0].sum() * yw * nev, n_pip)
    np.testing.assert_allclose(h["dN_dy_avg"][0] * 2 * CFG.y_cut * nev, n_pip)

    # pT-spectrum integral: sum over bins of 2pi pT dN w dy recovers count
    pT = np.hypot(np.concatenate([e["px"] for e in events]),
                  np.concatenate([e["py"] for e in events]))
    sel = (cat_mcid == 211) & (np.abs(cat_yp) <= CFG.y_cut) & \
          (pT >= CFG.pT_lower_cut) & (pT < CFG.pT_upper_cut)
    ptw = (CFG.pT_upper_cut - CFG.pT_lower_cut) / CFG.pT_bins
    total = np.sum(h["dN_2pipTdpTdy"][0] * 2 * np.pi * h["pT_mid"] * ptw
                   * 2 * CFG.y_cut * nev)
    np.testing.assert_allclose(total, sel.sum())

    # vn of uniform-phi events is small in well-populated bins
    populated = h["vn_counts"][0] >= 100
    assert populated.any()
    assert np.nanmax(h["vn"][0][populated]) < 0.2
    assert (h["yield_list"] == 5000).all()


def test_writer_tree(tmp_path):
    rng = np.random.default_rng(3)
    events = make_events(rng, nev=2, n=50)
    mcids = [211, -211, 321, 2212]
    h = sampler_test_histograms(events, mcids, CFG, mean_yield=7.5)
    write_sampler_test(h, mcids, str(tmp_path))
    assert (tmp_path / "dN_dy" / "dN_dy_211_test.dat").exists()
    assert (tmp_path / "vn" / "vn_2212_test.dat").exists()
    lines = (tmp_path / "vn" / "vn_211_test.dat").read_text().splitlines()
    assert len(lines) == CFG.pT_bins
    assert len(lines[0].split("\t")) == 8
    assert (tmp_path / "mean_yield.dat").read_text().strip() == "7.5"
    assert len((tmp_path / "yield_list.dat").read_text().splitlines()) == 3


def test_compute_observables():
    rng = np.random.default_rng(4)
    events = make_events(rng, nev=5, n=400)
    obs = compute_observables(events)
    assert obs["nsamples"] == 5
    cat_mcid = np.concatenate([e["mcid"] for e in events])
    cat_yp = np.concatenate([e["yp"] for e in events])
    want = np.sum((np.abs(cat_mcid) == 211) & (np.abs(cat_yp) < 0.5)) / 5
    np.testing.assert_allclose(obs["dN_dy"]["pion"], want)
    assert obs["flow"]["Qn"].shape == (8,)
    assert obs["pT_fluct"]["N"] >= 0
    assert is_charged([211]).all() and not is_charged([111]).any()
    # |eta| cuts use momentum pseudorapidity from (px,py,pz), not the
    # spacetime 'eta' field: replacing eta with garbage must not change
    # anything, replacing pz must
    ev2 = [dict(e, eta=e["eta"] + 100.0) for e in events]
    obs2 = compute_observables(ev2)
    assert obs2["dNch_deta"] == obs["dNch_deta"]
    assert obs2["flow"]["N"] == obs["flow"]["N"]
    ev3 = [dict(e, pz=e["pz"] + 50.0) for e in events]
    assert compute_observables(ev3)["dNch_deta"] != obs["dNch_deta"]


def test_is_charged_with_particle_table():
    """Exact charges from the PDG table classify charged resonances the
    hard-coded fallback set misses (e.g. N(1440)+ = 12212)."""
    from is3d_tpu.io import pdg
    table = pdg.read_resonances("/root/reference/PDG", hrg_eos=2)
    got = is_charged([12212, 211, 111, 2112], particle_table=table)
    np.testing.assert_array_equal(got, [True, True, False, False])
    # fallback set misclassifies the resonance
    assert not is_charged([12212]).any()


def test_compare_sampling_smooth_3d_uses_midrapidity_node():
    from is3d_tpu.analysis import compare_sampling_smooth
    from is3d_tpu.config import Config
    from is3d_tpu.io.tables import native_momentum_grid
    grid = native_momentum_grid(dimension=3, n_pT=3, n_phi=4, n_y=5)
    iy = int(np.argmin(np.abs(np.asarray(grid.y))))
    assert iy != 0  # the first node is a grid edge, not midrapidity
    S, P, F, Y = 1, 3, 4, 5
    spectra = np.arange(S * P * F * Y, dtype=float).reshape(S, P, F, Y)
    hist = dict(pT_mid=np.zeros(3), dN_2pipTdpTdy=np.zeros((1, 3)),
                dN_dy_avg=np.zeros(1), vn=np.zeros((1, 3, 7)))
    cfg = Config(dimension=3)
    out = compare_sampling_smooth(hist, spectra, grid, [211], 211, cfg)
    from is3d_tpu import observables as obs
    np.testing.assert_array_equal(
        out["dN_2pipTdpTdy_smooth"],
        np.asarray(obs.dN_twopipTdpTdy(spectra, grid))[0, :, iy])
