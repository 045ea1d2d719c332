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
