"""Ensemble-batched Cooper-Frye (is3d_tpu.batch): stacking, parity with the
single-surface kernels, event-axis sharding, and gradients through the
batch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from is3d_tpu.batch import (stack_surfaces, smooth_spectra_batched,
                            batched_spectra_fn, empty_like_surface)
from is3d_tpu.config import Config
from is3d_tpu.io.surface import Surface
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.parallel.mesh import default_mesh
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)

from test_vah import make_vah_cells


GRID = native_momentum_grid(dimension=2, n_pT=6, n_phi=5, n_eta=10)
SPECIES = synthetic_species(5)
BASE_CFG = Config(operation=1, mode=1, dimension=2, df_mode=2,
                  include_shear_deltaf=1, include_bulk_deltaf=1,
                  regulate_deltaf=1, outflow=1, cell_chunk=8)
SIZES = (17, 9, 23)


def _ensemble(seeds=(3, 4, 5), sizes=SIZES):
    return [synthetic_surface(n, dimension=2, seed=s)
            for n, s in zip(sizes, seeds)]


def _single(surface, cfg, df_data):
    if cfg.df_mode in (1, 2):
        from is3d_tpu.kernels.smooth import smooth_spectra
        return smooth_spectra(surface, SPECIES, GRID, df_data, cfg)
    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    return smooth_spectra_feqmod(surface, SPECIES, GRID, df_data, cfg)


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_batched_rows_match_single(df_mode):
    """Each batched row reproduces the single-surface kernel on that
    surface (different cell counts per event; padding is inert)."""
    cfg = BASE_CFG.replace(df_mode=df_mode)
    df_data = synthetic_deltaf_data()
    surfaces = _ensemble()
    stacked = stack_surfaces(surfaces)
    assert stacked.tau.shape == (3, max(SIZES))

    out = smooth_spectra_batched(stacked, SPECIES, GRID, df_data, cfg)
    assert out.shape[0] == 3
    for e, s in enumerate(surfaces):
        ref = np.asarray(_single(s, cfg, df_data))
        np.testing.assert_allclose(np.asarray(out[e]), ref,
                                   rtol=1e-12, atol=1e-300)


def test_batched_vah_rows_match_single():
    rng = np.random.default_rng(11)
    cfg = Config(operation=1, mode=2, dimension=2, df_mode=4,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=0, outflow=1, cell_chunk=8)
    surfaces = [Surface(**{k: jnp.asarray(v) for k, v in
                           make_vah_cells(n, rng).items()})
                for n in (7, 13)]
    stacked = stack_surfaces(surfaces)
    out = smooth_spectra_batched(stacked, SPECIES, GRID, None, cfg)

    from is3d_tpu.kernels.vah import smooth_spectra_vah
    for e, s in enumerate(surfaces):
        ref = np.asarray(smooth_spectra_vah(s, SPECIES, GRID, cfg))
        np.testing.assert_allclose(np.asarray(out[e]), ref,
                                   rtol=1e-12, atol=1e-300)


def test_event_axis_sharding_matches_single_device():
    """The mesh path shards whole events (no collectives) and matches the
    unsharded batch; a non-divisible event count raises; an all-zero-dsigma
    padding event contributes an exactly-zero row."""
    cfg = BASE_CFG
    df_data = synthetic_deltaf_data()
    surfaces = _ensemble((3, 4, 5), (17, 9, 23))
    surfaces.append(empty_like_surface(surfaces[0]))
    stacked = stack_surfaces(surfaces)

    base = np.asarray(
        smooth_spectra_batched(stacked, SPECIES, GRID, df_data, cfg))
    assert np.all(base[3] == 0.0)

    mesh = default_mesh(4, axis=cfg.mesh_axis)
    out = np.asarray(smooth_spectra_batched(stacked, SPECIES, GRID, df_data,
                                            cfg, mesh=mesh))
    np.testing.assert_allclose(out, base, rtol=1e-12, atol=1e-300)

    bad = stack_surfaces(surfaces[:3])
    with pytest.raises(ValueError, match="does not divide"):
        smooth_spectra_batched(bad, SPECIES, GRID, df_data, cfg, mesh=mesh)


def test_stack_mixed_optional_blocks_raises():
    a = synthetic_surface(5, dimension=2, seed=0)
    b = synthetic_surface(5, dimension=2, seed=1).replace(bulkPi=None)
    with pytest.raises(ValueError, match="bulkPi"):
        stack_surfaces([a, b])
    with pytest.raises(ValueError, match="pad_to"):
        stack_surfaces([a], pad_to=3)


def test_batched_polarization_rows_match_single():
    """polarization_batched reproduces per-event spin_polarization with
    per-event average temperatures, unsharded and event-sharded."""
    from is3d_tpu.batch import polarization_batched
    from is3d_tpu.kernels.polzn import spin_polarization
    from is3d_tpu.io.surface import ThermoAverages
    from test_polzn import make_surface

    rng = np.random.default_rng(21)
    cfg = Config(operation=1, mode=5, dimension=2, df_mode=1,
                 include_shear_deltaf=0, include_bulk_deltaf=0,
                 regulate_deltaf=0, outflow=1, cell_chunk=8)
    surfaces = [make_surface(n, rng)[0] for n in (6, 11)]
    T_avg = np.array([0.151, 0.158])
    stacked = stack_surfaces(surfaces)

    out = polarization_batched(stacked, SPECIES, GRID, cfg, T_avg)
    for e, s in enumerate(surfaces):
        ref = spin_polarization(
            s, SPECIES, GRID, cfg,
            ThermoAverages(T_avg[e], 0.3, 0.05, 0.0, 0.0))
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k][e]),
                                       np.asarray(ref[k]),
                                       rtol=1e-12, atol=1e-300, err_msg=k)

    mesh = default_mesh(2, axis=cfg.mesh_axis)
    out_m = polarization_batched(stacked, SPECIES, GRID, cfg, T_avg,
                                 mesh=mesh)
    for k in out:
        np.testing.assert_allclose(np.asarray(out_m[k]),
                                   np.asarray(out[k]),
                                   rtol=1e-12, atol=1e-300, err_msg=k)


def test_api_run_ensemble(tmp_path, reference_dir):
    """IS3D.run_ensemble: one batched pass over a mixed file-path / Surface
    ensemble matches per-event run_particlization, writes per-event results
    trees, and shards the event axis when the IS3D carries a mesh."""
    from is3d_tpu.api import IS3D
    from is3d_tpu.testing import synthetic_surface_cells

    cfg = Config(operation=1, mode=1, dimension=2, df_mode=2, hrg_eos=1,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=8)
    hbarC = 0.197327053

    # event 0: a mode-1 surface file
    cells_a = synthetic_surface_cells(9, dimension=2, seed=3)
    order = ["tau", "x", "y", "eta", "dat", "dax", "day", "dan",
             "ux", "uy", "un"]
    raw = [cells_a[k] for k in order]
    raw += [cells_a["E"] / hbarC, cells_a["T"] / hbarC, cells_a["P"] / hbarC]
    raw += [cells_a[k] / hbarC
            for k in ("pixx", "pixy", "pixn", "piyy", "piyn")]
    raw += [cells_a["bulkPi"] / hbarC]
    path_a = tmp_path / "surface_a.dat"
    np.savetxt(path_a, np.stack(raw, axis=1), fmt="%.17e")

    # event 1: an in-memory Surface (optional blocks matched to what the
    # mode-1 reader leaves None, so the ensemble stacks)
    cells_b = synthetic_surface_cells(14, dimension=2, seed=4)
    surf_b = synthetic_surface(14, dimension=2, seed=4).replace(
        muB=None, nB=None, Vx=None, Vy=None, Vn=None)

    kw = dict(data_dir=reference_dir,
              chosen_file="chosen_particles_pikp.dat")
    run = IS3D(cfg, results_dir=str(tmp_path / "ens"), **kw)
    results = run.run_ensemble([str(path_a), surf_b])
    assert len(results) == 2

    single_a = IS3D(cfg, results_dir=str(tmp_path / "a"), **kw)
    single_a.read_fo_surf_from_file(str(path_a), write_averages=False)
    ref_a = single_a.run_particlization(write_files=False)
    single_b = IS3D(cfg, results_dir=str(tmp_path / "b"), **kw)
    single_b.read_fo_surf_from_memory(**cells_b)
    ref_b = single_b.run_particlization(write_files=False)

    np.testing.assert_allclose(results[0].spectra, ref_a.spectra,
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(results[1].spectra, ref_b.spectra,
                               rtol=1e-12, atol=1e-300)

    # per-event results trees in the reference formats
    for e in (0, 1):
        f = tmp_path / "ens" / f"event_{e}" / "dN_pTdpTdphidy.dat"
        assert f.exists() and f.stat().st_size > 0

    # event-axis sharding through the IS3D mesh
    run_m = IS3D(cfg, results_dir=str(tmp_path / "ens_m"),
                 mesh=default_mesh(2, axis=cfg.mesh_axis), **kw)
    results_m = run_m.run_ensemble([str(path_a), surf_b], write_files=False)
    for rm, r in zip(results_m, results):
        np.testing.assert_allclose(rm.spectra, r.spectra,
                                   rtol=1e-12, atol=1e-300)


def test_api_run_ensemble_mode5_and_stale_dirs(tmp_path, reference_dir):
    """run_ensemble on mode-5 surfaces also computes batched polarization
    (each event normalized with its own averaged T, matching per-event
    run_particlization), writes S*.dat per event, and a rerun with fewer
    events cleans the stale event_<i> trees."""
    from is3d_tpu.api import IS3D
    from is3d_tpu.io.surface import surface_averages
    from test_polzn import make_surface

    rng = np.random.default_rng(5)
    cfg = Config(operation=1, mode=5, dimension=2, df_mode=1, hrg_eos=1,
                 include_shear_deltaf=0, include_bulk_deltaf=0,
                 regulate_deltaf=0, outflow=1, cell_chunk=8)
    surfs = [make_surface(n, rng)[0] for n in (5, 8)]
    kw = dict(data_dir=reference_dir,
              chosen_file="chosen_particles_pikp.dat")
    run = IS3D(cfg, results_dir=str(tmp_path / "ens"), **kw)
    results = run.run_ensemble(surfs)

    for e, s in enumerate(surfs):
        single = IS3D(cfg, results_dir=str(tmp_path / f"s{e}"), **kw)
        single.surface, single.averages = s, surface_averages(s)
        ref = single.run_particlization(write_files=False)
        np.testing.assert_allclose(results[e].spectra, ref.spectra,
                                   rtol=1e-12, atol=1e-300)
        for k in ref.polarization:
            np.testing.assert_allclose(results[e].polarization[k],
                                       ref.polarization[k],
                                       rtol=1e-12, atol=1e-300, err_msg=k)

    assert (tmp_path / "ens" / "event_1" / "St.dat").exists()

    # rerun with 1 event: event_1's owned outputs must disappear
    run.run_ensemble(surfs[:1])
    assert not (tmp_path / "ens" / "event_1" / "St.dat").exists()
    assert not (tmp_path / "ens" / "event_1" /
                "dN_pTdpTdphidy.dat").exists()
    assert (tmp_path / "ens" / "event_0" / "dN_pTdpTdphidy.dat").exists()


def test_gradients_flow_through_batch():
    """d(sum over the ensemble)/dT on a stacked batch equals the sum of the
    per-surface gradients -- ensemble calibration losses differentiate in
    one reverse pass."""
    cfg = BASE_CFG
    df_data = synthetic_deltaf_data()
    surfaces = _ensemble((7, 8), (6, 11))
    stacked = stack_surfaces(surfaces)
    fn = batched_spectra_fn(SPECIES, GRID, df_data, cfg)

    def loss_batched(T):
        return jnp.sum(fn(stacked.replace(T=T)))

    g_batch = jax.grad(loss_batched)(stacked.T)

    for e, s in enumerate(surfaces):
        def loss_one(T):
            from is3d_tpu.kernels.smooth import smooth_spectra
            return jnp.sum(smooth_spectra(
                s.replace(T=T), SPECIES, GRID, df_data,
                cfg.replace(remat_scan=1)))
        g_one = jax.grad(loss_one)(s.T)
        n = s.n_cells
        np.testing.assert_allclose(np.asarray(g_batch[e, :n]),
                                   np.asarray(g_one), rtol=1e-10)
        # pad-cell gradients are exactly zero (masked out of every sum)
        assert np.all(np.asarray(g_batch[e, n:]) == 0.0)
