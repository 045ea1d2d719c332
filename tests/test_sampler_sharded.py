"""Multi-chip (cell-sharded) sampler on the virtual 8-device mesh."""

import numpy as np

from is3d_tpu.config import Config
from is3d_tpu.kernels.sample import sample_particles, sample_particles_sharded
from is3d_tpu.parallel.mesh import default_mesh

from test_sampler import small_surface, species_with_densities, MCIDS, PLASMA
from test_smooth import smash_table, df_data  # noqa: F401


def test_sharded_sampler_statistics(smash_table, df_data):
    """Sharded sampling must reproduce the single-device yields within
    Monte-Carlo error (identical target distribution by Poisson
    superposition), and be deterministic for a fixed seed."""
    surf = small_surface(n=43, seed=14)   # deliberately not divisible by 8
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=23)
    sp = species_with_densities(smash_table, 0.155)
    mesh = default_mesh(axis=cfg.mesh_axis)

    nev = 200
    ev_sh = sample_particles_sharded(surf, sp, MCIDS, df_data, cfg, PLASMA,
                                     mesh, nevents=nev, seed=23)
    ev_1d = sample_particles(surf, sp, MCIDS, None, df_data, cfg, PLASMA,
                             nevents=nev, seed=51)

    n_sh = np.array([len(e["mcid"]) for e in ev_sh], dtype=float)
    n_1d = np.array([len(e["mcid"]) for e in ev_1d], dtype=float)
    assert n_sh.sum() > 0
    # same mean yield within 5 sigma
    se = np.sqrt(n_sh.var() / nev + n_1d.var() / nev)
    assert abs(n_sh.mean() - n_1d.mean()) < 5 * se + 1e-9, \
        (n_sh.mean(), n_1d.mean())

    # same species mix (pion fraction)
    mc_sh = np.concatenate([e["mcid"] for e in ev_sh])
    mc_1d = np.concatenate([e["mcid"] for e in ev_1d])
    f_sh = (np.abs(mc_sh) == 211).mean()
    f_1d = (np.abs(mc_1d) == 211).mean()
    assert abs(f_sh - f_1d) < 0.03

    # mean pT agreement
    pt_sh = np.concatenate([np.hypot(e["px"], e["py"]) for e in ev_sh])
    pt_1d = np.concatenate([np.hypot(e["px"], e["py"]) for e in ev_1d])
    tol = 5 * np.sqrt(pt_sh.var() / pt_sh.size + pt_1d.var() / pt_1d.size)
    assert abs(pt_sh.mean() - pt_1d.mean()) < tol + 0.01

    # determinism
    ev_sh2 = sample_particles_sharded(surf, sp, MCIDS, df_data, cfg, PLASMA,
                                      mesh, nevents=3, seed=23)
    np.testing.assert_array_equal(ev_sh[0]["mcid"], ev_sh2[0]["mcid"])
    np.testing.assert_array_equal(ev_sh[0]["px"], ev_sh2[0]["px"])


def test_sharded_sampler_on_shell(smash_table, df_data):
    surf = small_surface(n=16, seed=9)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=3.0, sampler_seed=2)
    sp = species_with_densities(smash_table, 0.155)
    mesh = default_mesh(axis=cfg.mesh_axis)
    events = sample_particles_sharded(surf, sp, MCIDS, df_data, cfg, PLASMA,
                                      mesh, nevents=4, seed=2)
    for e in events:
        if len(e["mcid"]) == 0:
            continue
        E2 = e["mass"]**2 + e["px"]**2 + e["py"]**2 + e["pz"]**2
        np.testing.assert_allclose(e["E"]**2, E2, rtol=1e-10)


def test_sharded_sampler_events_decay(smash_table, df_data):
    """The MC decay cascade consumes sharded-sampler events unchanged
    (same EVENT_FIELDS schema): mesh-sampled rho0s decay to stable pions
    with per-event four-momentum conserved."""
    import jax.numpy as jnp
    from is3d_tpu.io import pdg
    from is3d_tpu.data import SpeciesArrays
    from is3d_tpu.kernels.mc_decays import decay_events, build_decay_tables
    from test_sampler import small_surface, equilibrium_density, PLASMA

    ids = np.asarray([211, -211, 113], dtype=np.int32)
    idx = pdg.chosen_indices(smash_table, ids)
    sp = SpeciesArrays(
        mass=jnp.asarray(smash_table.mass[idx]),
        sign=jnp.asarray(smash_table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(smash_table.gspin[idx]),
        baryon=jnp.asarray(smash_table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=jnp.zeros(len(idx)),
        bulk_density=jnp.zeros(len(idx)),
        diff_density=jnp.zeros(len(idx)))
    neq = equilibrium_density(np.asarray(sp.mass), np.asarray(sp.degeneracy),
                              np.asarray(sp.sign), np.asarray(sp.baryon),
                              0.155)
    sp = sp.replace(equilibrium_density=jnp.asarray(neq))
    mcids = smash_table.mc_id[idx].astype(np.int32)

    surf = small_surface(n=16, seed=5)
    cfg = Config(operation=2, dimension=2, df_mode=1, y_cut=3.0,
                 sampler_seed=9)
    mesh = default_mesh(axis=cfg.mesh_axis)
    events = sample_particles_sharded(surf, sp, mcids, df_data, cfg, PLASMA,
                                      mesh, nevents=20, seed=31)
    n_rho = sum(int((e["mcid"] == 113).sum()) for e in events)
    assert n_rho > 0
    p4_before = [np.array([e[k].sum() for k in ("E", "px", "py", "pz")])
                 for e in events]

    out = decay_events(events, smash_table, seed=77)
    tabs = build_decay_tables(smash_table)
    stable_ids = set(tabs.mc_id[tabs.stable].tolist())
    assert len(out) == len(events)
    for e, p4 in zip(out, p4_before):
        assert set(np.unique(e["mcid"])) <= stable_ids
        np.testing.assert_allclose(
            np.array([e[k].sum() for k in ("E", "px", "py", "pz")]), p4,
            rtol=1e-6, atol=1e-6)
