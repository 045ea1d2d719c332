"""Config, spline, quadrature-table, and PDG loading tests."""

import numpy as np
import pytest

from is3d_tpu.config import Config, load_config, parse_parameter_text
from is3d_tpu.physics.splines import build_natural_cubic
from is3d_tpu.io import tables, pdg


def test_config_parse_reference_file(reference_dir):
    cfg = load_config(path=f"{reference_dir}/iS3D_parameters.dat")
    assert cfg.operation == 2
    assert cfg.mode == 0
    assert cfg.hrg_eos == 2
    assert cfg.dimension == 2
    assert cfg.df_mode == 4
    assert cfg.include_bulk_deltaf == 1
    assert cfg.include_baryon == 0
    assert cfg.T_switch == pytest.approx(0.151)
    assert cfg.min_num_hadrons == pytest.approx(1.0e8)
    assert cfg.max_num_samples == 500
    assert cfg.lightest_particle == 111
    assert cfg.y_cut == pytest.approx(5.0)


def test_config_overrides():
    cfg = load_config(text="operation = 1 # comment\n", overrides={"df_mode": 2})
    assert cfg.operation == 1 and cfg.df_mode == 2
    assert parse_parameter_text("a = 1\njunk line\n# comment\n b= 2") == {
        "a": "1", "b": "2"}


def test_natural_cubic_matches_scipy():
    from scipy.interpolate import CubicSpline as ScipySpline
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 37))
    y = np.sin(x) + 0.1 * rng.normal(size=37)
    ours = build_natural_cubic(x, y)
    ref = ScipySpline(x, y, bc_type="natural")
    xq = np.linspace(x[0], x[-1], 500)
    np.testing.assert_allclose(np.asarray(ours(xq)), ref(xq), rtol=1e-12, atol=1e-12)


def test_gauss_laguerre_matches_reference_table(reference_dir):
    ref = tables.load_gauss_laguerre_file(
        f"{reference_dir}/tables/gla_roots_weights_32_points.txt")
    ours = tables.gauss_laguerre(32, alphas=(0, 1, 2, 3))
    for a in (0, 1, 2, 3):
        np.testing.assert_allclose(ours[a][0], ref[a][0], rtol=1e-10)
        np.testing.assert_allclose(ours[a][1], ref[a][1], rtol=1e-8)


def test_momentum_grid_loading(reference_dir):
    g2 = tables.load_momentum_grid(f"{reference_dir}/tables", dimension=2, operation=1)
    assert g2.n_pT == 32 and g2.n_phi == 24
    assert g2.n_y == 1 and float(g2.y[0]) == 0.0
    assert g2.n_eta == 241
    g3 = tables.load_momentum_grid(f"{reference_dir}/tables", dimension=3, operation=2)
    assert g3.n_y == 21 and g3.n_eta == 1 and float(g3.eta_weight[0]) == 1.0
    # phi Gauss-Legendre weights integrate 1 over [0, 2pi] to 2pi
    assert float(np.sum(np.asarray(g2.phi_weight))) == pytest.approx(2 * np.pi, rel=1e-8)


def test_native_momentum_grid():
    g = tables.native_momentum_grid(dimension=2, n_pT=16, n_phi=12, n_eta=32)
    # GL in phi: integral of cos(phi)^2 over [0,2pi] = pi
    val = float(np.sum(np.cos(np.asarray(g.phi)) ** 2 * np.asarray(g.phi_weight)))
    assert val == pytest.approx(np.pi, rel=1e-10)


def test_pdg_urqmd(reference_dir):
    t = pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=1)
    n_meson = int((t.baryon == 0).sum())
    n_bar = int((t.baryon > 0).sum())
    n_anti = int((t.baryon < 0).sum())
    assert n_bar == n_anti
    assert len(t) == n_meson + n_bar + n_anti
    # pion
    i = t.index_of_mcid(211)
    assert t.mass[i] == pytest.approx(0.138)
    assert t.sign[i] == -1 and t.gspin[i] == 1 and t.baryon[i] == 0
    # proton and auto-generated antiproton
    ip = t.index_of_mcid(2212)
    ia = t.index_of_mcid(-2212)
    assert t.sign[ip] == 1 and t.baryon[ip] == 1
    assert t.baryon[ia] == -1 and t.mass[ia] == t.mass[ip]
    assert t.charge[ia] == -t.charge[ip]
    assert t.stable[ip]


def test_pdg_smash(reference_dir):
    t = pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=2)
    assert int((t.baryon > 0).sum()) == int((t.baryon < 0).sum())
    i = t.index_of_mcid(211)
    assert t.mass[i] == pytest.approx(0.138, abs=0.01)


def test_pdg_smash_box(reference_dir):
    t = pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=3)
    assert len(t) > 0
    assert int((t.baryon > 0).sum()) == int((t.baryon < 0).sum())
    # bosons get sign -1, baryons +1
    assert set(np.unique(t.sign)) <= {-1, 1}


def test_mcid_decode():
    info = pdg.decode_mcid(211)  # pi+
    assert info == dict(gspin=1, baryon=0, sign=-1, has_antiparticle=True)
    info = pdg.decode_mcid(111)  # pi0: nq2 == nq3 -> self-conjugate
    assert not info["has_antiparticle"]
    info = pdg.decode_mcid(2212)  # proton
    assert info["baryon"] == 1 and info["sign"] == 1 and info["gspin"] == 2
    for kzero in (130, 310):  # K0L/K0S: self-conjugate despite nq2 != nq3
        info = pdg.decode_mcid(kzero)
        assert not info["has_antiparticle"] and info["gspin"] == 1


def test_chosen_particles(reference_dir):
    t = pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=1)
    ids = pdg.load_chosen_mcids(f"{reference_dir}/PDG/chosen_particles_pikp.dat")
    assert list(ids) == [211, 321, 2212]
    idx = pdg.chosen_indices(t, ids)
    assert [t.mc_id[i] for i in idx] == [211, 321, 2212]
    idx_sorted = pdg.chosen_indices(t, [321, 111, 211], group_by_mass=True)
    masses = t.mass[idx_sorted]
    assert np.all(np.diff(masses) >= 0)


def test_natural_cubic_three_knots():
    """Exactly 3 knots -> a 1x1 tridiagonal system; _thomas must not
    index an empty upper diagonal."""
    import numpy as np
    import scipy.interpolate as si
    from is3d_tpu.physics.splines import build_natural_cubic, evaluate
    sp = build_natural_cubic([0.0, 1.0, 2.0], [1.0, 2.0, 0.0])
    ref = si.CubicSpline([0, 1, 2], [1, 2, 0], bc_type="natural")
    xq = np.linspace(0.0, 2.0, 9)
    np.testing.assert_allclose(np.asarray(evaluate(sp, xq)), ref(xq),
                               rtol=1e-12)
