"""Surface readers and delta-f coefficient manager tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.units import HBARC
from is3d_tpu.io import surface as surf_io
from is3d_tpu.io import pdg, deltaf
from is3d_tpu.io.surface import read_surface, count_cells


def test_toy_surface_mode1(reference_dir):
    path = f"{reference_dir}/input/surface.dat"
    assert count_cells(path) == 1
    s, avg = read_surface(path, mode=1, dimension=2)
    assert s.n_cells == 1
    assert float(s.tau[0]) == 0.5
    assert float(s.dat[0]) == 1000.0
    # E, T, P converted with hbarC
    assert float(s.E[0]) == pytest.approx(1.839 * HBARC)
    assert float(s.T[0]) == pytest.approx(0.786 * HBARC)
    assert float(s.P[0]) == pytest.approx(0.270 * HBARC)
    # single cell at rest: averages equal the cell values
    assert avg.temperature == pytest.approx(0.786 * HBARC)
    assert avg.energy_density == pytest.approx(1.839 * HBARC)
    assert avg.pressure == pytest.approx(0.270 * HBARC)
    assert avg.baryon_chemical_potential == 0.0


def test_mode0_roundtrip():
    # tau x y eta | da4 | u4 | E T P | pi10 | Pi   (26 cols)
    row = [0.6, 0.1, 0.2, 0.0, 2.0, 0.1, 0.0, 0.0,
           0.0, 0.3, 0.4, 0.0,
           1.5, 0.8, 0.3,
           0.01, 0.002, 0.0, 0.0, 0.03, 0.004, 0.0, 0.05, 0.0, 0.0,
           -0.02]
    text = " ".join(str(v) for v in row)
    s, avg = read_surface(text, mode=0, dimension=2)
    assert float(s.E[0]) == pytest.approx(1.5 * HBARC)
    assert float(s.pixx[0]) == pytest.approx(0.03 * HBARC)
    assert float(s.bulkPi[0]) == pytest.approx(-0.02 * HBARC)
    assert float(s.ux[0]) == 0.3  # u^tau column is discarded, ux follows


def test_mode6_music_new():
    # tau x y eta | da/tau 4 | u4 | E T muB muS muC s | pi10 | Pi  (29 cols)
    tau = 2.0
    row = [tau, 0.0, 0.0, 0.0,
           0.5, 0.1, 0.0, 0.0,
           1.0, 0.0, 0.0, 0.2,
           1.2, 0.75, 0.0, 0.0, 0.0, 6.0,
           0.0] + [0.0] * 9 + [0.0]
    s, avg = read_surface(" ".join(map(str, row)), mode=6, dimension=2)
    assert float(s.dat[0]) == pytest.approx(0.5 * tau)
    assert float(s.un[0]) == pytest.approx(0.2 / tau)
    # P = s*T - E in converted units
    T = 0.75 * HBARC
    E = 1.2 * HBARC
    assert float(s.P[0]) == pytest.approx(6.0 * T - E)
    assert float(s.dan[0]) == 0.0


def test_mode7_hiceventgen():
    tau = 1.5
    vx, vy = 0.3, 0.1
    row = [tau, 1.0, 2.0, 0.0,
           0.4, 0.02, 0.03, 0.0,
           vx, vy, 0.0] + [0.0] * 10 + [0.01, 0.155, 0.4, 0.09, 0.0]
    s, avg = read_surface(" ".join(map(str, row)), mode=7, dimension=2)
    ut = 1.0 / np.sqrt(1 - vx**2 - vy**2)
    assert float(s.ux[0]) == pytest.approx(ut * vx)
    assert float(s.uy[0]) == pytest.approx(ut * vy)
    assert float(s.dat[0]) == pytest.approx(0.4 * tau)
    # GeV units passed through
    assert float(s.T[0]) == pytest.approx(0.155)
    assert float(s.bulkPi[0]) == pytest.approx(0.01)


def test_mode1_warns_mode0_rejects_nonzero_dan_2d(capsys):
    # reference behavior: mode 1 WARNS on nonzero dsigma_eta
    # (commented-out exit, readindata.cpp:357); mode 0 exits (:183-187)
    row = [0.5, 0, 0, 0, 1000.0, 0, 0, 0.5, 0, 0, 0, 1.839, 0.786, 0.270,
           0, 0, 0, 0, 0, 0]
    s, _ = read_surface(" ".join(map(str, row)), mode=1, dimension=2)
    assert s.n_cells == 1 and "dsigma_eta" in capsys.readouterr().out
    from is3d_tpu.io.surface import expected_columns
    n0 = expected_columns(0, False, False)
    row0 = [0.5, 0, 0, 0, 1000.0, 0, 0, 0.5] + [1.0] * (n0 - 8)
    with pytest.raises(ValueError):
        read_surface(" ".join(map(str, row0)), mode=0, dimension=2)


def test_thermo_averages_weighting():
    # two cells with different weights: averages must be dsigma-weighted
    rows = [[0.5, 0, 0, 0, 10.0, 0, 0, 0, 0, 0, 0, 1.0, 0.7, 0.3,
             0, 0, 0, 0, 0, 0],
            [0.5, 0, 0, 0, 30.0, 0, 0, 0, 0, 0, 0, 2.0, 0.9, 0.5,
             0, 0, 0, 0, 0, 0]]
    text = "\n".join(" ".join(map(str, r)) for r in rows)
    _, avg = read_surface(text, mode=1, dimension=2)
    # weights: dsigma_magnitude = |u.dsigma| + sqrt(|(u.ds)^2 - ds.ds|) = 10, 30
    expected_T = (0.7 * 10 + 0.9 * 30) / 40 * HBARC
    assert avg.temperature == pytest.approx(expected_T, rel=1e-12)


# ----------------------------------------------------------------- delta-f

@pytest.fixture(scope="module")
def smash_table(reference_dir):
    return pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=2)


@pytest.fixture(scope="module")
def df_data_smash(reference_dir, smash_table):
    return deltaf.build_deltaf_data(
        f"{reference_dir}/deltaf_coefficients", hrg_eos=2,
        particle_table=smash_table, T_avg=0.155)


def test_deltaf_tables_load(reference_dir):
    T, muB, raw = deltaf.load_deltaf_tables(
        f"{reference_dir}/deltaf_coefficients", hrg_eos=2)
    assert T.shape == (101,) and muB.shape == (81,)
    assert raw["c0"].shape == (81, 101)
    assert T[0] == pytest.approx(0.1) and T[-1] == pytest.approx(0.2)
    # betapi/T^4 must be positive everywhere
    assert np.all(raw["betapi"] > 0)


def test_deltaf_spline_matches_grid_points(df_data_smash):
    # the cubic spline must reproduce the knot values exactly
    data = df_data_smash
    T = data.T_grid
    for name in ("c0", "c2", "F", "betabulk", "betapi"):
        vals = data.splines[name](T)
        np.testing.assert_allclose(np.asarray(vals),
                                   np.asarray(data.tables[name][0]),
                                   rtol=1e-12, atol=1e-14)


def test_evaluate_df_mode2_scaling(df_data_smash):
    T = jnp.asarray(0.155)
    E, P = jnp.asarray(0.3), jnp.asarray(0.05)
    co = deltaf.evaluate_df_coefficients(df_data_smash, 2, False, T,
                                         jnp.asarray(0.0), E, P, jnp.asarray(0.0))
    # raw spline values times T powers
    raw_F = float(df_data_smash.splines["F"](T))
    raw_bp = float(df_data_smash.splines["betapi"](T))
    assert float(co.F) == pytest.approx(raw_F * 0.155)
    assert float(co.betapi) == pytest.approx(raw_bp * 0.155**4)
    assert float(co.betaV) == 1.0
    assert float(co.G) == 0.0


def test_evaluate_df_mode1_shear14(df_data_smash):
    T, E, P = jnp.asarray(0.155), jnp.asarray(0.3), jnp.asarray(0.05)
    co = deltaf.evaluate_df_coefficients(df_data_smash, 1, False, T,
                                         jnp.asarray(0.0), E, P, jnp.asarray(0.0))
    assert float(co.shear14) == pytest.approx(2 * 0.155**2 * 0.35)
    assert float(co.c1) == 0.0 and float(co.c3) == 0.0


def test_jonah_splines(df_data_smash):
    data = df_data_smash
    assert data.z_spline is not None
    # at bulkPi = 0 the modified distribution is the equilibrium one:
    # z(0) = 1, lambda(0) = 0
    z0 = float(data.z_spline(jnp.asarray(0.0)))
    lam0 = float(data.lambda2_spline(jnp.asarray(0.0)))
    assert z0 == pytest.approx(1.0, abs=1e-5)
    assert lam0 == pytest.approx(0.0, abs=1e-6)
    assert float(data.bulkPi_over_Peq_max) > 0


def test_evaluate_df_mode4(df_data_smash):
    T, E, P = jnp.asarray(0.155), jnp.asarray(0.3), jnp.asarray(0.05)
    bulkPi = jnp.asarray(-0.005)  # bulkPi/P = -0.1
    co = deltaf.evaluate_df_coefficients(df_data_smash, 4, False, T,
                                         jnp.asarray(0.0), E, P, bulkPi)
    assert float(co.lam) < 0  # negative bulk pressure -> negative lambda
    assert float(co.z) > 1.0  # narrower distribution -> larger renorm
    dl = float(co.delta_lambda)
    assert dl == pytest.approx(
        -0.005 / (5 * float(co.betapi) - 3 * 0.05 * 0.35 / 0.3))
    assert float(co.delta_z) == pytest.approx(-3 * dl * 0.05 / 0.3)


def test_bilinear_interpolation(df_data_smash):
    data = df_data_smash
    # at a grid point the bilinear value equals the table value
    T = data.T_grid[10]
    muB = data.muB_grid[5]
    co = deltaf.evaluate_df_coefficients(data, 2, True, T, muB,
                                         jnp.asarray(0.3), jnp.asarray(0.05),
                                         jnp.asarray(0.0))
    expected_F = float(data.tables["F"][5, 10]) * float(T)
    assert float(co.F) == pytest.approx(expected_F, rel=1e-12)
    # halfway between grid points: mean of neighbors
    Tm = 0.5 * (data.T_grid[10] + data.T_grid[11])
    co2 = deltaf.evaluate_df_coefficients(data, 2, True, Tm, muB,
                                          jnp.asarray(0.3), jnp.asarray(0.05),
                                          jnp.asarray(0.0))
    expected = 0.5 * (float(data.tables["F"][5, 10]) + float(data.tables["F"][5, 11])) * float(Tm)
    assert float(co2.F) == pytest.approx(expected, rel=1e-12)


def test_particle_densities(reference_dir, smash_table, df_data_smash):
    avg = surf_io.ThermoAverages(0.155, 0.3, 0.05, 0.0, 0.0)
    t = deltaf.compute_particle_densities(smash_table, 2, avg, df_data_smash,
                                          include_baryon=False)
    i = t.index_of_mcid(211)
    # pion equilibrium density at T=155 MeV is ~0.07/fm^3 (known ballpark)
    assert 0.03 < t.equilibrium_density[i] < 0.15
    # all equilibrium densities positive
    assert np.all(t.equilibrium_density > 0)
    # particle/antiparticle symmetric at muB = 0
    ip, ia = t.index_of_mcid(2212), t.index_of_mcid(-2212)
    assert t.equilibrium_density[ip] == pytest.approx(t.equilibrium_density[ia])


def test_mode4_music_old_conversions():
    """mode 4 (old MUSIC): dsigma x tau, u^eta / tau, P = T s - E,
    pi^{. eta} / tau (readindata.cpp:552-686)."""
    import numpy as np
    from is3d_tpu.io.surface import read_surface, expected_columns
    hbarC = 0.197327053
    ncols = expected_columns(4, False, False)
    row = np.arange(1.0, ncols + 1.0)  # tau=1? use tau=2 for visible scaling
    row[0] = 2.0          # tau
    text = " ".join(f"{v:.17e}" for v in row)
    s, avg = read_surface(text, mode=4, dimension=2)
    tau = 2.0
    np.testing.assert_allclose(np.asarray(s.dat)[0], row[4] * tau)
    np.testing.assert_allclose(np.asarray(s.dan)[0], 0.0)   # 2+1D forced 0
    np.testing.assert_allclose(np.asarray(s.un)[0], row[11] / tau)
    E = row[12] * hbarC
    T = row[13] * hbarC
    muB = row[14] * hbarC
    sdens = row[15]
    np.testing.assert_allclose(np.asarray(s.E)[0], E)
    np.testing.assert_allclose(np.asarray(s.P)[0], sdens * T - E, rtol=1e-12)
    # pi^{xeta} and pi^{yeta} divided by tau (pi block starts at col 16)
    np.testing.assert_allclose(np.asarray(s.pixn)[0], row[22] * hbarC / tau)
    np.testing.assert_allclose(np.asarray(s.piyn)[0], row[24] * hbarC / tau)
    assert avg is not None   # mode 4 writes the averages (readindata.cpp:680)


def test_mode3_vah_plpt_layout():
    """mode 3: anisotropic variables read directly, x hbarC
    (readindata.cpp:930-1056)."""
    import numpy as np
    from is3d_tpu.io.surface import read_surface, expected_columns
    hbarC = 0.197327053
    ncols = expected_columns(3, False, False)
    row = np.arange(1.0, ncols + 1.0)
    row[7] = 0.0           # dan = 0 (2+1D)
    text = " ".join(f"{v:.17e}" for v in row)
    s, avg = read_surface(text, mode=3, dimension=2)
    np.testing.assert_allclose(np.asarray(s.E)[0], row[12] * hbarC)
    np.testing.assert_allclose(np.asarray(s.PL)[0], row[14] * hbarC)
    np.testing.assert_allclose(np.asarray(s.PT)[0], row[15] * hbarC)
    np.testing.assert_allclose(np.asarray(s.Wt)[0], row[26] * hbarC)
    np.testing.assert_allclose(np.asarray(s.Lambda)[0], row[30] * hbarC)
    np.testing.assert_allclose(np.asarray(s.aL)[0], row[32])
    # mode 3 never writes the averages FILE upstream, but the in-memory
    # ThermoAverages is computed (P = (PL + 2 PT)/3 trace reconstruction)
    assert avg is not None
    np.testing.assert_allclose(
        avg.pressure, (row[14] + 2 * row[15]) / 3 * hbarC)


def test_bilinear_df_evaluation_vs_scipy(reference_dir):
    """Nonzero-muB coefficient path vs scipy's RegularGridInterpolator.
    (Our bilinear fixes the reference's transposed indexing, which reads
    out of bounds for points_T != points_muB; deltafReader.cpp:404-407.)"""
    import numpy as np
    import jax.numpy as jnp
    from scipy.interpolate import RegularGridInterpolator
    from is3d_tpu.io import deltaf

    T, muB, raw = deltaf.load_deltaf_tables(
        f"{reference_dir}/deltaf_coefficients", 1)
    data = deltaf.build_deltaf_data(f"{reference_dir}/deltaf_coefficients",
                                    1, include_jonah=False)
    rng = np.random.default_rng(3)
    Tq = jnp.asarray(rng.uniform(T[1], T[-2], 40))
    muBq = jnp.asarray(rng.uniform(muB[1], muB[-2], 40))
    E = jnp.asarray(rng.uniform(0.2, 0.4, 40))
    P = jnp.asarray(rng.uniform(0.04, 0.08, 40))

    out = deltaf.evaluate_df_coefficients(data, 1, True, Tq, muBq, E, P,
                                          jnp.zeros(40))
    T4 = np.asarray(Tq) ** 4
    for name, got, unscale in (("c0", out.c0, T4),
                               ("c2", out.c2, T4),
                               ("c3", out.c3, T4),
                               ("c4", out.c4, np.asarray(Tq) ** 5)):
        interp = RegularGridInterpolator((muB, T), raw[name])
        want = interp(np.stack([np.asarray(muBq), np.asarray(Tq)], 1)) / unscale
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                                   err_msg=name)

    out2 = deltaf.evaluate_df_coefficients(data, 2, True, Tq, muBq, E, P,
                                           jnp.zeros(40))
    for name, got, unscale in (("G", out2.G, np.ones(40)),
                               ("F", out2.F, np.asarray(Tq)),
                               ("betaV", out2.betaV, np.asarray(Tq) ** 3),
                               ("betapi", out2.betapi, T4)):
        interp = RegularGridInterpolator((muB, T), raw[name])
        want = interp(np.stack([np.asarray(muBq), np.asarray(Tq)], 1)) * unscale
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                                   err_msg=name)


# -------------------------------- review-fix regressions (io robustness)

def test_load_float_matrix_path_with_spaces(tmp_path):
    import os
    d = tmp_path / "my run"
    d.mkdir()
    p = d / "m.dat"
    p.write_text("1.0 2.0\n3.0 4.0\n")
    from is3d_tpu.io.surface import load_float_matrix
    m = load_float_matrix(str(p))
    np.testing.assert_array_equal(m, [[1.0, 2.0], [3.0, 4.0]])
    # a single numeric token is inline data, not a filename
    np.testing.assert_array_equal(load_float_matrix("3.14"), [[3.14]])


def test_load_float_matrix_infers_columns_past_comment_header():
    from is3d_tpu.io.surface import load_float_matrix
    m = load_float_matrix("# tau x y eta and more header words\n1 2 3\n4 5 6\n")
    assert m.shape == (2, 3)


def test_mode1_nonzero_dan_warns_not_raises(capsys):
    """Reference downgraded the 2+1D dsigma_eta check to a warning for
    modes 1/2/5 (commented-out exit at readindata.cpp:357); only modes
    0 and 3 exit."""
    from is3d_tpu.io.surface import read_surface, expected_columns
    ncols = expected_columns(1, False, False)
    row = [2.0, 0, 0, 0, 0.5, 0, 0, 1e-15] + [0.0] * (ncols - 8)
    row[8 + 0] = 0.0   # ux
    # E T P block positions don't matter for loading; T must be nonzero
    text = " ".join(str(v) for v in row)
    surf, _ = read_surface(text, mode=1, dimension=2)
    assert "dsigma_eta" in capsys.readouterr().out
    assert surf.n_cells == 1


def test_validate_df_range_raises_out_of_table(reference_dir, smash_table):
    from is3d_tpu.io import deltaf as deltaf_io
    dfd = deltaf_io.build_deltaf_data(f"{reference_dir}/deltaf_coefficients",
                                      hrg_eos=2, particle_table=smash_table,
                                      T_avg=0.155)
    T = np.asarray([0.155, 0.05])          # 0.05 below the table
    muB = np.asarray([0.0, 0.0])
    with pytest.raises(ValueError, match="outside the df coefficient table"):
        deltaf_io.validate_df_range(dfd, T, muB)
    deltaf_io.validate_df_range(dfd, np.asarray([0.155]), np.asarray([0.1]))


def test_chosen_indices_skip_missing(smash_table, capsys):
    from is3d_tpu.io.pdg import chosen_indices
    idx = chosen_indices(smash_table, [211, 999999321, -211],
                         skip_missing=True)
    assert len(idx) == 2
    assert "skipped" in capsys.readouterr().out
    with pytest.raises(KeyError):
        chosen_indices(smash_table, [999999321])


def test_numpy_jnp_dispatch_equivalence(df_data_smash):
    """The host setup paths run thermal/spline/bilinear math in numpy (no
    eager JAX compiles); both dispatch paths must agree bitwise-closely and
    return their own array library."""
    import jax
    from is3d_tpu.physics import thermal, splines

    lag_r = np.linspace(0.05, 30.0, 32)
    lag_w = np.exp(-0.3 * lag_r)
    mbar = np.asarray([0.9, 3.2, 7.7])
    baryon = np.asarray([0.0, 1.0, -1.0])
    sign = np.asarray([-1.0, 1.0, 1.0])

    out_np = thermal.gauss_thermal(thermal.J10_int, lag_r, lag_w,
                                   mbar, 0.3, baryon, sign)
    assert isinstance(out_np, np.ndarray)
    out_j = thermal.gauss_thermal(thermal.J10_int, jnp.asarray(lag_r),
                                  jnp.asarray(lag_w), jnp.asarray(mbar),
                                  jnp.asarray(0.3), jnp.asarray(baryon),
                                  jnp.asarray(sign))
    assert isinstance(out_j, jax.Array)
    np.testing.assert_allclose(out_np, np.asarray(out_j), rtol=1e-13)

    # spline: concrete device spline queried with numpy stays numpy
    sp = splines.build_natural_cubic(np.linspace(0.1, 0.2, 11),
                                     np.sin(np.linspace(0.1, 0.2, 11)))
    q = np.asarray([0.1234, 0.101, 0.199])
    r_np = sp(q)
    assert isinstance(r_np, np.ndarray)
    r_j = sp(jnp.asarray(q))
    assert isinstance(r_j, jax.Array)
    np.testing.assert_allclose(r_np, np.asarray(r_j), rtol=1e-13)

    # full coefficient evaluation, scalar numpy state vs jnp state
    for df_mode, baryon_flag in ((1, False), (2, True), (4, False)):
        co_np = deltaf.evaluate_df_coefficients(
            df_data_smash, df_mode, baryon_flag, np.float64(0.152),
            np.float64(0.08), np.float64(0.3), np.float64(0.05),
            np.float64(-0.01))
        co_j = deltaf.evaluate_df_coefficients(
            df_data_smash, df_mode, baryon_flag, jnp.asarray(0.152),
            jnp.asarray(0.08), jnp.asarray(0.3), jnp.asarray(0.05),
            jnp.asarray(-0.01))
        for f in ("c0", "c1", "c2", "c3", "c4", "F", "G", "betabulk",
                  "betaV", "betapi", "lam", "z", "delta_lambda", "delta_z"):
            np.testing.assert_allclose(
                float(getattr(co_np, f)), float(getattr(co_j, f)),
                rtol=1e-12, err_msg=f"df_mode={df_mode} field={f}")
