"""Runtime invariants as real asserts (the reference only has soft prints:
viscous_correction.cpp:31-59,103-119,152-159) + the in-memory API path."""

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.physics import lrf
from is3d_tpu.config import Config

from test_smooth import smash_table, df_data, random_cells  # noqa: F401


@pytest.fixture(scope="module")
def cells():
    rng = np.random.default_rng(77)
    return {k: jnp.asarray(v) for k, v in
            random_cells(200, rng, dimension=3).items()}


def test_tetrad_orthonormality(cells):
    tau = cells["tau"]
    ut = lrf.u_tau(cells["ux"], cells["uy"], cells["un"], tau)
    basis = lrf.milne_basis(ut, cells["ux"], cells["uy"], cells["un"], tau)
    res = lrf.basis_orthonormality_residual(basis, ut, cells["ux"],
                                            cells["uy"], cells["un"], tau)
    assert float(jnp.max(res)) < 1e-12


def test_pimunu_reconstruction_orthogonal_traceless(cells):
    tau = cells["tau"]
    tau2 = tau * tau
    ux, uy, un = cells["ux"], cells["uy"], cells["un"]
    ut = lrf.u_tau(ux, uy, un, tau)
    pitt, pitx, pity, pitn, pinn = lrf.reconstruct_pimunu(
        cells["pixx"], cells["pixy"], cells["pixn"], cells["piyy"],
        cells["piyn"], ut, ux, uy, un, tau)
    pixx, pixy, pixn = cells["pixx"], cells["pixy"], cells["pixn"]
    piyy, piyn = cells["piyy"], cells["piyn"]
    # trace: pi^t_t - pi^x_x - pi^y_y - tau^2 pi^nn = 0
    trace = pitt - pixx - piyy - tau2 * pinn
    np.testing.assert_allclose(np.asarray(trace), 0.0, atol=1e-13)
    # orthogonality pi^{mu nu} u_nu = 0, all four components
    for row in [
        pitt * ut - pitx * ux - pity * uy - tau2 * pitn * un,
        pitx * ut - pixx * ux - pixy * uy - tau2 * pixn * un,
        pity * ut - pixy * ux - piyy * uy - tau2 * piyn * un,
        pitn * ut - pixn * ux - piyn * uy - tau2 * pinn * un,
    ]:
        np.testing.assert_allclose(np.asarray(row), 0.0, atol=1e-13)


def test_lrf_pi_traceless_and_magnitude(cells):
    tau = cells["tau"]
    ux, uy, un = cells["ux"], cells["uy"], cells["un"]
    ut = lrf.u_tau(ux, uy, un, tau)
    basis = lrf.milne_basis(ut, ux, uy, un, tau)
    pitt, pitx, pity, pitn, pinn = lrf.reconstruct_pimunu(
        cells["pixx"], cells["pixy"], cells["pixn"], cells["piyy"],
        cells["piyn"], ut, ux, uy, un, tau)
    piL = lrf.boost_pimunu_to_lrf(basis, pitt, pitx, pity, pitn,
                                  cells["pixx"], cells["pixy"], cells["pixn"],
                                  cells["piyy"], cells["piyn"], pinn, tau)
    # LRF trace is zero by construction; check the invariant
    # pi.pi = pi_munu pi^munu is frame independent
    tau2 = tau * tau
    pi_pi_lab = (pitt**2 + cells["pixx"]**2 + cells["piyy"]**2
                 + tau2**2 * pinn**2
                 + 2 * (-pitx**2 - pity**2 - tau2 * pitn**2
                        + cells["pixy"]**2 + tau2 * cells["pixn"]**2
                        + tau2 * cells["piyn"]**2))
    pixxL, pixyL, pixzL, piyyL, piyzL, pizzL = piL
    pi_pi_lrf = (pixxL**2 + piyyL**2 + pizzL**2
                 + 2 * (pixyL**2 + pixzL**2 + piyzL**2))
    np.testing.assert_allclose(np.asarray(pi_pi_lrf), np.asarray(pi_pi_lab),
                               rtol=1e-9, atol=1e-18)


def test_Vmu_orthogonality(cells):
    tau = cells["tau"]
    rng = np.random.default_rng(5)
    Vx = jnp.asarray(rng.normal(0, 0.01, 200))
    Vy = jnp.asarray(rng.normal(0, 0.01, 200))
    Vn = jnp.asarray(rng.normal(0, 0.003, 200))
    ux, uy, un = cells["ux"], cells["uy"], cells["un"]
    ut = lrf.u_tau(ux, uy, un, tau)
    Vt = lrf.complete_Vmu(Vx, Vy, Vn, ut, ux, uy, un, tau)
    udotV = Vt * ut - Vx * ux - Vy * uy - tau * tau * Vn * un
    np.testing.assert_allclose(np.asarray(udotV), 0.0, atol=1e-14)


def test_lab_boost_preserves_energy(cells):
    """u.p in the lab equals the LRF energy after boost_pLRF_to_lab."""
    tau = cells["tau"]
    ux, uy, un = cells["ux"], cells["uy"], cells["un"]
    ut = lrf.u_tau(ux, uy, un, tau)
    basis = lrf.milne_basis(ut, ux, uy, un, tau)
    rng = np.random.default_rng(6)
    E = jnp.asarray(rng.uniform(0.2, 2.0, 200))
    px = jnp.asarray(rng.normal(0, 0.4, 200))
    py = jnp.asarray(rng.normal(0, 0.4, 200))
    pz2 = E**2 - px**2 - py**2
    keep = np.asarray(pz2) > 0.01
    pz = jnp.sqrt(jnp.where(pz2 > 0, pz2, 1.0))
    ptau, plx, ply, pn = lrf.boost_pLRF_to_lab(basis, ut, ux, uy, un,
                                               E, px, py, pz)
    pdotu = ptau * ut - plx * ux - ply * uy - tau * tau * pn * un
    np.testing.assert_allclose(np.asarray(pdotu)[keep], np.asarray(E)[keep],
                               rtol=1e-10)


# --------------------------------------------------- in-memory API (JETSCAPE)

def test_memory_api_matches_file_path(tmp_path, reference_dir):
    """read_fo_surf_from_memory (21 columns, reference iS3D.cpp:27-72) gives
    the same spectra as loading an equivalent mode-1 surface file."""
    from is3d_tpu.api import IS3D
    from is3d_tpu.config import Config
    rng = np.random.default_rng(8)
    n = 7
    cols = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n), eta=np.zeros(n),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n), dan=np.zeros(n),
        ux=rng.uniform(-0.5, 0.5, n), uy=rng.uniform(-0.5, 0.5, n),
        un=rng.uniform(-0.02, 0.02, n),
        E=rng.uniform(0.25, 0.4, n), T=rng.uniform(0.148, 0.162, n),
        P=rng.uniform(0.04, 0.08, n),
        pixx=rng.normal(0, 0.003, n), pixy=rng.normal(0, 0.002, n),
        pixn=rng.normal(0, 0.001, n), piyy=rng.normal(0, 0.003, n),
        piyn=rng.normal(0, 0.001, n), bulkPi=rng.normal(0, 0.002, n),
    )
    cfg = Config(operation=1, mode=1, dimension=2, df_mode=2, hrg_eos=1,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=8)

    # memory path
    run_mem = IS3D(cfg, data_dir=reference_dir,
                   results_dir=str(tmp_path / "mem"),
                   chosen_file="chosen_particles_pikp.dat")
    run_mem.read_fo_surf_from_memory(**cols)
    res_mem = run_mem.run_particlization(write_files=False)

    # file path: serialize as a mode-1 surface (hbarC-divided raw columns)
    hbarC = 0.197327053
    order = ["tau", "x", "y", "eta", "dat", "dax", "day", "dan",
             "ux", "uy", "un"]
    raw = [cols[k] for k in order]
    raw += [cols["E"] / hbarC, cols["T"] / hbarC, cols["P"] / hbarC]
    raw += [cols[k] / hbarC for k in ("pixx", "pixy", "pixn", "piyy", "piyn")]
    raw += [cols["bulkPi"] / hbarC]
    mat = np.stack(raw, axis=1)
    surf_dir = tmp_path / "input"
    surf_dir.mkdir()
    np.savetxt(surf_dir / "surface.dat", mat, fmt="%.17e")
    run_file = IS3D(cfg, data_dir=reference_dir,
                    results_dir=str(tmp_path / "file"),
                    chosen_file="chosen_particles_pikp.dat")
    run_file.read_fo_surf_from_file(str(surf_dir / "surface.dat"),
                                    write_averages=False)
    res_file = run_file.run_particlization(write_files=False)

    np.testing.assert_allclose(res_mem.spectra, res_file.spectra,
                               rtol=1e-10, atol=1e-20)
    np.testing.assert_array_equal(res_mem.mcids, res_file.mcids)
