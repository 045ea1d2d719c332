"""Differentiable Cooper-Frye (is3d_tpu.diff) vs central finite differences.

All checks run in f64 (conftest) on small random surfaces; AD gradients
must match central finite differences entry-by-entry.  Also pins that the
remat_scan knob leaves the FORWARD pass bit-identical (jax.checkpoint is
an AD-only transform).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io import pdg, deltaf
from is3d_tpu.io.surface import Surface
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu import diff

from test_smooth import random_cells, to_surface, pikp_species
from test_vah import make_vah_cells
from test_polzn import make_surface as make_polzn_surface, PLASMA, _species


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def smash_table(reference_dir):
    return pdg.read_resonances(f"{reference_dir}/PDG", hrg_eos=2)


@pytest.fixture(scope="module")
def df_data(reference_dir, smash_table):
    return deltaf.build_deltaf_data(f"{reference_dir}/deltaf_coefficients",
                                    hrg_eos=2, particle_table=smash_table,
                                    T_avg=0.155)


GRID = native_momentum_grid(dimension=2, n_pT=6, n_phi=6, n_eta=24)
CFG = Config(operation=1, mode=1, dimension=2, df_mode=2,
             include_shear_deltaf=1, include_bulk_deltaf=1,
             regulate_deltaf=1, outflow=1, cell_chunk=4)


def fd_entry(fn, surface, field, i, eps=None):
    """Central finite difference of scalar fn(surface) in one entry."""
    x = getattr(surface, field)
    if eps is None:
        eps = 3.0e-6 * max(1.0, abs(float(x[i])))
    up = surface.replace(**{field: x.at[i].add(+eps)})
    dn = surface.replace(**{field: x.at[i].add(-eps)})
    return (float(fn(up)) - float(fn(dn))) / (2.0 * eps)


# ------------------------------------------------------------------- tests

def test_linear_df_grad_matches_fd(smash_table, df_data):
    """d(sum dN/dy)/d(field) vs finite differences, df_mode 2 with shear,
    bulk, regulation, outflow, and the mT-adaptive eta remap all ON."""
    rng = np.random.default_rng(7)
    surf = to_surface(random_cells(6, rng, dimension=2))
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)
    scalar = lambda s: jnp.sum(diff.dN_dy_j(smap(s), GRID))

    wrt = ("T", "ux", "uy", "bulkPi", "pixx", "pixy", "dat", "dax", "tau")
    value, grads = diff.surface_value_and_grad(scalar, surf, wrt)
    assert float(value) > 0.0
    assert set(grads) == set(wrt)

    for field in wrt:
        for i in (0, 4):
            want = fd_entry(scalar, surf, field, i)
            got = float(grads[field][i])
            np.testing.assert_allclose(
                got, want, rtol=5e-5, atol=1e-12,
                err_msg=f"d/d{field}[{i}]")


def test_grad_of_vn_and_mean_pT(smash_table, df_data):
    """Composite calibration-style observable: v2 + <pT>, checked vs FD."""
    rng = np.random.default_rng(8)
    surf = to_surface(random_cells(5, rng, dimension=2))
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)

    def scalar(s):
        spec = smap(s)
        return (jnp.sum(diff.vn_j(spec, GRID, 2))
                + 0.1 * jnp.sum(diff.mean_pT_j(spec, GRID)))

    _, grads = diff.surface_value_and_grad(scalar, surf, ("ux", "pixy"))
    for field in ("ux", "pixy"):
        want = fd_entry(scalar, surf, field, 2)
        np.testing.assert_allclose(float(grads[field][2]), want, rtol=5e-5,
                                   err_msg=field)


def test_grad_finite_under_saturated_regulator(smash_table, df_data):
    """Cells driven into |df| > 1 regulation and u.dsigma < 0 masking must
    give finite (subgradient) gradients, never NaN."""
    rng = np.random.default_rng(9)
    cells = random_cells(6, rng, dimension=2)
    cells["bulkPi"] = np.full(6, 0.2)          # deep regulation
    cells["dat"][0] = -2.0                     # one masked cell
    surf = to_surface(cells)
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)
    scalar = lambda s: jnp.sum(diff.dN_dy_j(smap(s), GRID))
    _, grads = diff.surface_value_and_grad(
        scalar, surf, ("T", "bulkPi", "dat"))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k


def test_vah_grad_matches_fd():
    """VAH spectra gradients w.r.t. (Lambda, aL, ux, dat) vs FD."""
    rng = np.random.default_rng(11)
    cells = make_vah_cells(5, rng, dimension=2)
    surf = Surface(**{k: jnp.asarray(v) for k, v in cells.items()})
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, outflow=1, cell_chunk=2)
    grid = native_momentum_grid(dimension=2, n_pT=5, n_phi=6, n_eta=24)
    z = jnp.zeros(1)
    from is3d_tpu.data import SpeciesArrays
    sp = SpeciesArrays(mass=jnp.asarray([0.139]), sign=jnp.asarray([-1.0]),
                       degeneracy=jnp.asarray([1.0]),
                       baryon=jnp.asarray([0.0]), equilibrium_density=z,
                       bulk_density=z, diff_density=z)
    smap = diff.spectra_fn(sp, grid, None, cfg)
    scalar = lambda s: jnp.sum(diff.dN_dy_j(smap(s), grid))
    _, grads = diff.surface_value_and_grad(
        scalar, surf, ("Lambda", "aL", "ux", "dat"))
    for field in ("Lambda", "aL", "ux", "dat"):
        want = fd_entry(scalar, surf, field, 1)
        np.testing.assert_allclose(float(grads[field][1]), want, rtol=5e-5,
                                   err_msg=field)


def test_polzn_grad_wrt_vorticity_matches_fd():
    """Gradient of the normalized Lambda polarization w.r.t. the thermal
    vorticity components and flow vs FD."""
    rng = np.random.default_rng(12)
    surf, _ = make_polzn_surface(5, rng, dimension=2)
    grid = native_momentum_grid(dimension=2, n_pT=4, n_phi=4, n_eta=10,
                                eta_mT_rescale=False)
    cfg = Config(mode=5, dimension=2, cell_chunk=2)
    sp = _species(1.11568, 1.0)
    pmap = diff.polarization_fn(sp, grid, cfg, PLASMA)
    scalar = lambda s: jnp.sum(pmap(s)["Sy_over_Snorm"])
    _, grads = diff.surface_value_and_grad(scalar, surf, ("wtx", "wxn", "ux"))
    for field in ("wtx", "wxn", "ux"):
        want = fd_entry(scalar, surf, field, 3)
        np.testing.assert_allclose(float(grads[field][3]), want, rtol=5e-5,
                                   err_msg=field)


def test_vjp_one_hot_equals_grad_of_bin(smash_table, df_data):
    """surface_vjp with a one-hot cotangent == grad of that spectra bin."""
    rng = np.random.default_rng(13)
    surf = to_surface(random_cells(4, rng, dimension=2))
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)

    spec, pull = diff.surface_vjp(smap, surf, ("T", "ux"))
    hot = jnp.zeros_like(spec).at[1, 2, 3, 0].set(1.0)
    g_vjp = pull(hot)

    scalar = lambda s: smap(s)[1, 2, 3, 0]
    _, g = diff.surface_value_and_grad(scalar, surf, ("T", "ux"))
    for k in ("T", "ux"):
        np.testing.assert_allclose(np.asarray(g_vjp[k]), np.asarray(g[k]),
                                   rtol=1e-12, err_msg=k)


def test_remat_scan_forward_bit_identical(smash_table, df_data):
    """cfg.remat_scan must not change one bit of the forward spectra."""
    from is3d_tpu.kernels.smooth import smooth_spectra
    rng = np.random.default_rng(14)
    surf = to_surface(random_cells(9, rng, dimension=2))
    species = pikp_species(smash_table)
    a = np.asarray(smooth_spectra(surf, species, GRID, df_data, CFG))
    b = np.asarray(smooth_spectra(surf, species, GRID, df_data,
                                  CFG.replace(remat_scan=1)))
    assert (a == b).all()


def test_gradient_descent_recovers_temperature(smash_table, df_data):
    """End-to-end calibration demo: a 3% perturbation of the per-cell
    freeze-out temperature field is recovered by Adam on a relative
    spectra-mismatch loss (the use-case the reference serves only through
    finite differences over full re-runs)."""
    import optax

    rng = np.random.default_rng(16)
    cells = random_cells(5, rng, dimension=2)
    surf = to_surface(cells)
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)
    target = smap(surf)
    T_true = jnp.asarray(cells["T"])

    def loss_fn(T):
        spec = smap(surf.replace(T=T))
        rel = (spec - target) / (target + 1e-30)
        return jnp.mean(rel * rel)

    opt = optax.adam(2e-4)
    T = T_true * (1.0 + 0.03 * jnp.asarray(rng.uniform(-1, 1, 5)))
    err0 = float(jnp.max(jnp.abs(T - T_true)))
    state = opt.init(T)

    import jax

    @jax.jit
    def step(T, state):
        loss, g = jax.value_and_grad(loss_fn)(T)
        updates, state = opt.update(g, state)
        return optax.apply_updates(T, updates), state, loss

    loss = None
    for _ in range(300):
        T, state, loss = step(T, state)
    err = float(jnp.max(jnp.abs(T - T_true)))
    assert err < 0.2 * err0, (err0, err, float(loss))


def test_sharded_grad_matches_single_device(smash_table, df_data):
    """Gradients through the mesh path (shard_map + psum over the 8-device
    CPU mesh) must match the single-device gradients."""
    from is3d_tpu.parallel.mesh import default_mesh

    rng = np.random.default_rng(17)
    surf = to_surface(random_cells(10, rng, dimension=2))
    species = pikp_species(smash_table)
    scalar_1 = lambda s, m=None: jnp.sum(diff.dN_dy_j(
        diff.spectra_fn(species, GRID, df_data, CFG, mesh=m)(s), GRID))

    v1, g1 = diff.surface_value_and_grad(
        lambda s: scalar_1(s), surf, ("T", "ux", "bulkPi"))
    mesh = default_mesh(8)
    v8, g8 = diff.surface_value_and_grad(
        lambda s: scalar_1(s, mesh), surf, ("T", "ux", "bulkPi"))
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-12)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=1e-11, err_msg=k)


@pytest.mark.parametrize("df_mode", [3, 4])
def test_feqmod_grad_matches_fd(smash_table, df_data, df_mode):
    """feqmod (Mike / Jonah) spectra gradients vs FD.  The differentiable
    path runs the both-branch kernel with the host-side breakdown
    partition disabled (diff.py), so the map is one traced jnp program."""
    rng = np.random.default_rng(18 + df_mode)
    surf = to_surface(random_cells(5, rng, dimension=2))
    species = pikp_species(smash_table)
    cfg = CFG.replace(df_mode=df_mode)
    smap = diff.spectra_fn(species, GRID, df_data, cfg)
    scalar = lambda s: jnp.sum(diff.dN_dy_j(smap(s), GRID))

    wrt = ("T", "ux", "bulkPi", "pixy", "dat")
    value, grads = diff.surface_value_and_grad(scalar, surf, wrt)
    assert float(value) > 0.0
    for field in wrt:
        for i in (0, 3):
            want = fd_entry(scalar, surf, field, i)
            np.testing.assert_allclose(
                float(grads[field][i]), want, rtol=5e-5, atol=1e-12,
                err_msg=f"df_mode={df_mode} d/d{field}[{i}]")


def test_feqmod_diff_forward_matches_production(smash_table, df_data):
    """The differentiable feqmod map (partition off, remat on) must give
    the production forward spectra: jax.checkpoint is AD-only and the
    partition only changes summation grouping (both reduce through the
    canonical group tree)."""
    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    rng = np.random.default_rng(21)
    surf = to_surface(random_cells(7, rng, dimension=2))
    species = pikp_species(smash_table)
    cfg = CFG.replace(df_mode=3)
    a = np.asarray(diff.spectra_fn(species, GRID, df_data, cfg)(surf))
    b = np.asarray(smooth_spectra_feqmod(surf, species, GRID, df_data, cfg))
    assert (a == b).all()


def test_feqmod_sharded_grad_matches_single_device(smash_table, df_data):
    """feqmod gradients through the mesh path == single-device."""
    from is3d_tpu.parallel.mesh import default_mesh

    rng = np.random.default_rng(22)
    surf = to_surface(random_cells(9, rng, dimension=2))
    species = pikp_species(smash_table)
    cfg = CFG.replace(df_mode=3)
    scalar = lambda s, m=None: jnp.sum(diff.dN_dy_j(
        diff.spectra_fn(species, GRID, df_data, cfg, mesh=m)(s), GRID))

    v1, g1 = diff.surface_value_and_grad(lambda s: scalar(s), surf,
                                         ("T", "ux"))
    v8, g8 = diff.surface_value_and_grad(
        lambda s: scalar(s, default_mesh(8)), surf, ("T", "ux"))
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-12)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=1e-11, err_msg=k)


def test_wrt_absent_field_raises(smash_table, df_data):
    rng = np.random.default_rng(15)
    cells = random_cells(3, rng, dimension=2)
    for k in ("Vx", "Vy", "Vn"):
        cells.pop(k)
    surf = to_surface(cells)
    species = pikp_species(smash_table)
    smap = diff.spectra_fn(species, GRID, df_data, CFG)
    scalar = lambda s: jnp.sum(diff.dN_dy_j(smap(s), GRID))
    with pytest.raises(ValueError, match="Vx"):
        diff.surface_value_and_grad(scalar, surf, ("Vx",))


# --------------------------------------------------- differentiable decays

def test_traced_feed_down_matches_production(smash_table):
    """resonance_feed_down_traced must reproduce do_resonance_decays on a
    multi-channel subset (same schedule, same wave kernels; the traced
    path only swaps the host-numpy glue for jnp)."""
    from is3d_tpu.kernels import decays as dk
    table = smash_table
    mcids = np.asarray([211, -211, 111, 113, 223, 331])
    grid = native_momentum_grid(dimension=2, n_pT=24, pT_max=5.0, n_phi=12,
                                n_eta=8)
    mass = np.array([float(table.mass[table.index_of_mcid(int(m))])
                     for m in mcids])
    MT = np.sqrt(np.asarray(grid.pT)[None, :, None, None] ** 2
                 + mass[:, None, None, None] ** 2)
    spectra = np.exp(-MT / 0.15) * (
        1 + 0.2 * np.cos(2 * np.asarray(grid.phi))[None, None, :, None])
    cfg = Config(dimension=2, lightest_particle=111)
    prod = dk.do_resonance_decays(spectra.copy(), table, mcids, grid, cfg)
    traced = np.asarray(dk.resonance_feed_down_traced(
        jnp.asarray(spectra), table, mcids, grid, cfg))
    assert np.abs(prod - spectra).max() > 0        # feed-down happened
    np.testing.assert_allclose(traced, prod, rtol=1e-10, atol=1e-300)
    # remat off must give the same values (checkpoint is AD-only)
    traced2 = np.asarray(dk.resonance_feed_down_traced(
        jnp.asarray(spectra), table, mcids, grid, cfg, remat=False))
    np.testing.assert_array_equal(traced, traced2)


def test_decayed_spectra_grad_matches_fd(smash_table, df_data):
    """Gradients of POST-feed-down pion dN/dy with respect to surface
    fields (diff.decayed_spectra_fn: smooth CF + the traced cascade in
    one reverse pass) vs central finite differences.  The cascade's
    contribution is real: the loss includes the rho0 -> pi pi feed-down,
    whose parent spectrum moves with the surface."""
    from is3d_tpu.data import SpeciesArrays
    ids = [211, -211, 113]
    idx = pdg.chosen_indices(smash_table, ids)
    mcids = smash_table.mc_id[idx]
    z = jnp.zeros(len(idx))
    sp = SpeciesArrays(
        mass=jnp.asarray(smash_table.mass[idx]),
        sign=jnp.asarray(smash_table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(smash_table.gspin[idx]),
        baryon=jnp.asarray(smash_table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=z, bulk_density=z, diff_density=z)
    i_rho = int(np.where(mcids == 113)[0][0])
    i_pi = [int(np.where(mcids == m)[0][0]) for m in (211, -211)]

    rng = np.random.default_rng(19)
    surf = to_surface(random_cells(5, rng, dimension=2))
    grid = native_momentum_grid(dimension=2, n_pT=12, pT_max=4.0, n_phi=6,
                                n_eta=16)
    cfg = CFG.replace(lightest_particle=111)

    base = diff.spectra_fn(sp, grid, df_data, cfg)
    fn_map = diff.decayed_spectra_fn(sp, grid, df_data, cfg, smash_table,
                                     mcids)

    def pion_dndy(decayed):
        return jnp.sum(diff.dN_dy_j(decayed, grid)[jnp.asarray(i_pi)])

    scalar = lambda s: pion_dndy(fn_map(s))
    # the feed-down must contribute to the loss (rho yield nonzero)
    undec = pion_dndy(base(surf))
    assert float(scalar(surf)) > 1.02 * float(undec)

    value, grads = diff.surface_value_and_grad(scalar, surf, ("T", "ux"))
    assert np.isfinite(value)
    for field in ("T", "ux"):
        g = np.asarray(grads[field])
        assert np.isfinite(g).all(), field
        for i in (0, 3):
            fd = fd_entry(scalar, surf, field, i)
            got = float(g[i])
            assert abs(got - fd) < 5e-4 * max(abs(fd), abs(got), 1e-8), \
                (field, i, got, fd)
    # and the gradient genuinely flows THROUGH the cascade: compare with
    # the no-decay loss gradient wrt T -- they must differ measurably
    _, g0 = diff.surface_value_and_grad(lambda s: pion_dndy(base(s)),
                                        surf, ("T",))
    rel = np.abs(np.asarray(grads["T"]) - np.asarray(g0["T"]))
    assert rel.max() > 1e-3 * np.abs(np.asarray(grads["T"])).max()


def test_decayed_spectra_sharded_grad_matches_single(smash_table, df_data):
    """decayed_spectra_fn with a device mesh: the forward shards the
    Cooper-Frye pass over cells (canonical tree -> bit-identical spectra)
    and the cascade runs on the replicated result; the reverse pass
    differentiates through shard_map + psum + the traced cascade.
    Gradients must match the single-device map."""
    from is3d_tpu.data import SpeciesArrays
    from is3d_tpu.parallel.mesh import default_mesh
    ids = [211, -211, 113]
    idx = pdg.chosen_indices(smash_table, ids)
    mcids = smash_table.mc_id[idx]
    z = jnp.zeros(len(idx))
    sp = SpeciesArrays(
        mass=jnp.asarray(smash_table.mass[idx]),
        sign=jnp.asarray(smash_table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(smash_table.gspin[idx]),
        baryon=jnp.asarray(smash_table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=z, bulk_density=z, diff_density=z)
    rng = np.random.default_rng(23)
    surf = to_surface(random_cells(6, rng, dimension=2))
    grid = native_momentum_grid(dimension=2, n_pT=10, pT_max=4.0, n_phi=6,
                                n_eta=12)
    cfg = CFG.replace(lightest_particle=111)

    def scalar_of(fn_map):
        return lambda s: jnp.sum(diff.dN_dy_j(fn_map(s), grid))

    f1 = scalar_of(diff.decayed_spectra_fn(sp, grid, df_data, cfg,
                                           smash_table, mcids))
    fm = scalar_of(diff.decayed_spectra_fn(sp, grid, df_data, cfg,
                                           smash_table, mcids,
                                           mesh=default_mesh(4)))
    v1, g1 = diff.surface_value_and_grad(f1, surf, ("T", "bulkPi"))
    vm, gm = diff.surface_value_and_grad(fm, surf, ("T", "bulkPi"))
    np.testing.assert_allclose(float(vm), float(v1), rtol=1e-12)
    for k in g1:
        np.testing.assert_allclose(np.asarray(gm[k]), np.asarray(g1[k]),
                                   rtol=1e-10, err_msg=k)
