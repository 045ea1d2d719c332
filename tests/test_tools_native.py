"""Offline coefficient generator parity + native IO parser."""

import numpy as np
import pytest

from is3d_tpu.io import pdg
from is3d_tpu.io.deltaf import load_deltaf_tables
from is3d_tpu.tools.deltaf_generator import (compute_coefficient_tables,
                                             write_tables, generate)
from is3d_tpu.native import fast_parse_doubles, get_fastio


def test_generator_matches_shipped_tables(reference_dir):
    """Regenerate the smash coefficient tables on a sparse (T, muB) subgrid
    and compare against the reference's shipped files.  The shipped files
    are written `fixed` with 6 decimals (deltaf_table.cpp:240-244), i.e.
    quantized to 1e-6 ABSOLUTE -- so the closure criterion is half that
    quantum, not a relative tolerance (round-1 reported "5e-5 of scale"
    before the quantization was identified)."""
    table = pdg.read_resonances(f"{reference_dir}/PDG", 2)
    T, muB, tabs = compute_coefficient_tables(table, T_min=0.1, T_max=0.2,
                                              nT=6, muB_min=0.0, muB_max=0.8,
                                              nmuB=5)
    Tref, muBref, ref = load_deltaf_tables(
        f"{reference_dir}/deltaf_coefficients", 2)
    iT = np.round((T - 0.1) / 0.001).astype(int)
    imu = np.round(muB / 0.01).astype(int)
    np.testing.assert_allclose(Tref[iT], T, atol=1e-12)
    for name in ref:
        sub_ref = ref[name][np.ix_(imu, iT)]
        np.testing.assert_allclose(tabs[name], sub_ref, atol=0.501e-6,
                                   err_msg=name)


def test_deltaf_generator_closes_reference(reference_dir):
    """Closed-loop validation against the reference's own generator binary
    (built from generate_delta_f_coefficients/urqmd/df_vh_dimensionless by
    tools_oracle/build_deltaf_generator.sh, which also proves the binary
    regenerates the SHIPPED urqmd tables byte-identically on this machine).
    Our vectorized generator must match those tables to within half their
    1e-6 fixed-point quantum at every point of a urqmd subgrid."""
    import os
    import subprocess
    script = os.path.join(os.path.dirname(__file__), "..", "tools_oracle",
                          "build_deltaf_generator.sh")
    r = subprocess.run(["bash", script], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    oracle_dir = os.environ.get("OUT", "/tmp/is3d_oracle") + "/deltafgen"
    table = pdg.read_resonances(f"{reference_dir}/PDG", 1)
    T, muB, tabs = compute_coefficient_tables(table, T_min=0.1, T_max=0.2,
                                              nT=6, muB_min=0.0, muB_max=0.8,
                                              nmuB=5)
    iT = np.round((T - 0.1) / 0.001).astype(int)
    imu = np.round(muB / 0.01).astype(int)
    for name in ("c0", "c1", "c2", "c3", "c4", "G", "F", "betabulk",
                 "betaV", "betapi"):
        with open(f"{oracle_dir}/urqmd/{name}.dat") as f:
            nT_f = int(f.readline())
            nmuB_f = int(f.readline())
            f.readline()
            vals = np.loadtxt(f)[:, 2].reshape(nmuB_f, nT_f)
        np.testing.assert_allclose(tabs[name], vals[np.ix_(imu, iT)],
                                   atol=0.501e-6, err_msg=name)


def test_generator_roundtrip_through_loader(reference_dir, tmp_path):
    """Files written by write_tables load back through the runtime loader."""
    table = pdg.read_resonances(f"{reference_dir}/PDG", 2)
    T, muB, tabs = compute_coefficient_tables(table, nT=4, nmuB=3)
    out = tmp_path / "vh" / "smash"
    write_tables(T, muB, tabs, str(out))
    T2, muB2, loaded = load_deltaf_tables(str(tmp_path), 2)
    np.testing.assert_allclose(T2, T, atol=1e-6)
    np.testing.assert_allclose(muB2, muB, atol=1e-6)
    for name in tabs:
        np.testing.assert_allclose(loaded[name], tabs[name], atol=1e-6)


def test_native_parser_matches_python():
    if get_fastio() is None:
        pytest.skip("no native toolchain")
    data = b"1.5 2 3e-4  # trailing comment 99\n4 -5 6\n# comment line\n7 8 9.25\n"
    np.testing.assert_array_equal(
        fast_parse_doubles(data),
        [1.5, 2, 3e-4, 4, -5, 6, 7, 8, 9.25])
    assert fast_parse_doubles(b"1.0 abc") is None
    # a numeric prefix with trailing garbage must be rejected, not split
    # into two tokens or silently truncated
    assert fast_parse_doubles(b"1.0 2abc") is None
    assert fast_parse_doubles(b"1.0 2.5#c\n3") is not None  # '#' ends token


def test_native_parser_in_surface_loader():
    from is3d_tpu.io.surface import load_float_matrix
    rng = np.random.default_rng(0)
    m = rng.normal(size=(37, 8))
    text = "\n".join(" ".join(f"{v:.17e}" for v in r) for r in m)
    got = load_float_matrix(text, ncols=8)
    np.testing.assert_array_equal(got, m)


def test_native_sci_table_byte_parity(tmp_path):
    """write_sci_table (C) must byte-equal the Python fallback loop on
    adversarial values: nan, +-inf, -0.0, denormals, extreme exponents,
    exact halfway-rounding cases -- glibc printf and CPython formatting
    must agree on every one, or the native fast path silently changes
    results files."""
    from is3d_tpu import writers
    from is3d_tpu.native import build as nb

    if nb.get_fastio() is None:
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(0, 1, 400),
        10.0 ** rng.uniform(-300, 300, 400) * rng.choice([-1, 1], 400),
        [np.nan, np.inf, -np.inf, 0.0, -0.0, 5e-324, 1.7976931348623157e308,
         1.5e-8, 2.5e-8, 1.00000000499999995e0,
         # EXACT decimal ties at the 9th significant digit (x.5 doubles):
         # printf and CPython both round half-to-even; the fast formatter
         # must detect these and delegate
         100000000.5, 123456789.5, 123456788.5, -999999999.5,
         # decade-boundary carries
         9.999999996e5, 9.999999994e-7, 1e8, 1e-8],
        rng.normal(0, 1, 190).astype(np.float32).astype(np.float64),
    ])
    rows = vals.reshape(-1, 4)
    header = "a\tb\tc\td\n"

    a = tmp_path / "native.dat"
    assert nb.fast_write_sci_table(str(a), False, header, rows, 7)
    b = tmp_path / "python.dat"
    orig = nb.fast_write_sci_table
    nb.fast_write_sci_table = lambda *args, **kw: False
    try:
        writers._write_sci_table(str(b), header, rows, 7)
    finally:
        nb.fast_write_sci_table = orig
    assert a.read_bytes() == b.read_bytes()


def test_vectorized_writers_match_per_value_loops(tmp_path):
    """The vectorized row builders must reproduce the original per-value
    formatting loops byte for byte -- including the dN_dpTdphidy pT
    Jacobian, which the old loop multiplied under f32 scalar promotion."""
    import jax.numpy as jnp
    from is3d_tpu import writers
    from is3d_tpu.io.tables import native_momentum_grid

    grid = native_momentum_grid(dimension=3, n_pT=5, n_phi=4, n_y=3,
                                dtype=jnp.float32)
    rng = np.random.default_rng(5)
    spectra = rng.gamma(0.3, 2.0, (3, 5, 4, 3)).astype(np.float32)
    mcids = [211, -321, 2212]
    ys = writers._y_values(grid, 3)
    pTs, phis = np.asarray(grid.pT), np.asarray(grid.phi)

    d = str(tmp_path / "new")
    writers.write_dN_pTdpTdphidy(spectra, grid, mcids, 3, d)
    writers.write_dN_dpTdphidy(spectra, grid, mcids, 3, d)

    old = tmp_path / "old_main.dat"
    with open(old, "w") as f:
        for s in range(spectra.shape[0]):
            for iy, y in enumerate(ys):
                for ifp, phip in enumerate(phis):
                    for ipT, pT in enumerate(pTs):
                        f.write(f"{y:.8e}\t{phip:.8e}\t{pT:.8e}\t"
                                f"{spectra[s, ipT, ifp, iy]:.8e}\n")
                    f.write("\n")
    assert (open(f"{d}/dN_pTdpTdphidy.dat").read()
            == old.read_text())

    old_j = tmp_path / "old_jac.dat"
    with open(old_j, "w") as f:
        f.write("y\tphip\tpT\tdN_dpTdphidy\n")
        for s in range(spectra.shape[0]):
            for iy, y in enumerate(ys):
                for ifp, phip in enumerate(phis):
                    for ipT, pT in enumerate(pTs):
                        f.write(f"{y:.8e}\t{phip:.8e}\t{pT:.8e}\t"
                                f"{spectra[s, ipT, ifp, iy] * pT:.8e}\n")
                    f.write("\n")
    assert (open(f"{d}/dN_dpTdphidy.dat").read() == old_j.read_text())


def test_native_oscar_writer_byte_parity(tmp_path):
    """The native OSCAR writer must produce byte-identical files to the
    Python fallback (including empty-event skipping and multi-event
    appends)."""
    import numpy as np
    from is3d_tpu import writers
    from is3d_tpu.native import build as nb

    if nb.get_fastio() is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(3)
    n = 5000
    ev = dict(mcid=rng.integers(-3000, 3000, n),
              t=rng.random(n) * 10, x=rng.normal(0, 5, n),
              y=rng.normal(0, 5, n), z=rng.normal(0, 8, n),
              E=rng.random(n) + 0.1, px=rng.normal(0, 1, n),
              py=rng.normal(0, 1, n), pz=rng.normal(0, 2, n))
    empty = {k: v[:0] for k, v in ev.items()}
    events = [ev, empty, {k: v[:777] for k, v in ev.items()}]

    a = tmp_path / "native.dat"
    writers.write_particle_list_oscar(events, str(a))
    orig = nb.fast_write_oscar_event
    nb.fast_write_oscar_event = lambda *args, **kw: False
    try:
        b = tmp_path / "python.dat"
        writers.write_particle_list_oscar(events, str(b))
    finally:
        nb.fast_write_oscar_event = orig
    assert a.read_bytes() == b.read_bytes()
