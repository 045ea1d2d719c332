"""Oversampling / ensemble driver."""

import os

import numpy as np

from is3d_tpu.config import Config
from is3d_tpu.ensemble import oversample_run, ensemble_seeds

from test_sampler import (small_surface, species_with_densities, MCIDS,
                          PLASMA)
from test_smooth import smash_table, df_data  # noqa: F401


def test_ensemble_seeds_distinct():
    s = ensemble_seeds(7, 64)
    assert len(set(s)) == 64
    assert s == ensemble_seeds(7, 64)        # deterministic
    assert s != ensemble_seeds(8, 64)


def test_oversample_run(tmp_path, smash_table, df_data):
    surf = small_surface(n=16, seed=3)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=2.0, oversample=1, min_num_hadrons=2000,
                 max_num_samples=50)
    sp = species_with_densities(smash_table, 0.155)
    out = str(tmp_path / "oversampling")
    nb, total, ntot = oversample_run(surf, sp, MCIDS, df_data, cfg, PLASMA,
                                     out_dir=out, events_per_batch=10,
                                     base_seed=5)
    assert nb >= 1 and total > 0 and ntot > 0
    assert os.path.exists(f"{out}/results_0/particle_list_osc.dat")
    # number of batches consistent with the oversampling formula
    import math
    nev = min(math.ceil(cfg.min_num_hadrons / ntot), cfg.max_num_samples)
    assert nb == math.ceil(nev / 10)


def test_oversample_resume(tmp_path, smash_table, df_data):
    """Interrupting after some batches and resuming must reproduce the
    uninterrupted run's files exactly (deterministic per-batch seeds +
    manifest checkpoint)."""
    import json
    import pytest

    surf = small_surface(n=16, seed=3)
    cfg = Config(operation=2, dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 y_cut=2.0, oversample=1, min_num_hadrons=1500,
                 max_num_samples=50)
    sp = species_with_densities(smash_table, 0.155)

    # reference: uninterrupted run
    full = str(tmp_path / "full")
    nb_full, tot_full, _ = oversample_run(surf, sp, MCIDS, df_data, cfg,
                                          PLASMA, out_dir=full,
                                          events_per_batch=10, base_seed=5)
    assert nb_full >= 2

    # interrupted run: only the first batch (cap via max_batches)
    part = str(tmp_path / "part")
    oversample_run(surf, sp, MCIDS, df_data, cfg, PLASMA, out_dir=part,
                   events_per_batch=10, base_seed=5, max_batches=1)
    m = json.load(open(f"{part}/manifest.json"))
    assert len(m["batches"]) == 1

    # resume completes the remaining batches without redoing batch 0
    mtime0 = os.path.getmtime(f"{part}/results_0/particle_list_osc.dat")
    nb, tot, _ = oversample_run(surf, sp, MCIDS, df_data, cfg, PLASMA,
                                out_dir=part, events_per_batch=10,
                                base_seed=5)
    assert nb == nb_full and tot == tot_full
    assert os.path.getmtime(f"{part}/results_0/particle_list_osc.dat") == mtime0
    for i in range(nb_full):
        a = open(f"{full}/results_{i}/particle_list_osc.dat").read()
        b = open(f"{part}/results_{i}/particle_list_osc.dat").read()
        assert a == b, f"batch {i} differs after resume"

    # refusal on mismatched parameters
    with pytest.raises(ValueError, match="refusing to resume"):
        oversample_run(surf, sp, MCIDS, df_data, cfg, PLASMA, out_dir=part,
                       events_per_batch=20, base_seed=5)
    with pytest.raises(ValueError, match="resume=True"):
        oversample_run(surf, sp, MCIDS, df_data, cfg, PLASMA, out_dir=part,
                       events_per_batch=10, base_seed=5, resume=False)
