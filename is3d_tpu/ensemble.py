"""Ensemble / oversampling drivers.

The reference's scale-out story is process-level: oversample.sh reruns the
binary N times into oversampling/results_i, and
run_multithread_sampling_iS3D.py spawns ncores sandboxed worker processes
(SURVEY.md section 2 row 18).  The TPU-native sampler is already vectorized
over events, so one process saturates a chip; these drivers reproduce the
reference's *output layouts* and add deterministic seed handling:

* ``oversample_run``: sample a target hadron count in event batches and write
  each batch to results_<i>/ (oversample.sh layout),
* ``ensemble_seeds``: independent, collision-free seeds for multi-host
  launches (each host calls sample_particles with its own seed, events
  concatenate across hosts over DCN -- no collective needed, matching the
  reference's share-nothing design).
"""

from __future__ import annotations

import os

import numpy as np

from .kernels.sample import sample_particles, calculate_total_yield
from . import writers


def ensemble_seeds(base_seed: int, n_workers: int) -> list:
    """Independent per-worker seeds via numpy's SeedSequence spawning."""
    ss = np.random.SeedSequence(base_seed)
    return [int(child.generate_state(1)[0] % (2**31))
            for child in ss.spawn(n_workers)]


def oversample_run(surface, species, mcids, df_data, cfg, plasma,
                   out_dir: str = "oversampling", events_per_batch: int = 100,
                   base_seed: int = 0, max_batches: int = 1000):
    """Sample until cfg.min_num_hadrons hadrons (or max limits), writing one
    OSCAR file per batch into <out_dir>/results_<i>/ (oversample.sh layout).

    Returns (n_batches, total_hadrons, mean_yield)."""
    ntot = abs(calculate_total_yield(surface, species, df_data, cfg, plasma))
    n_events_needed = int(np.ceil(cfg.min_num_hadrons / max(ntot, 1e-30)))
    n_events_needed = min(n_events_needed, cfg.max_num_samples)

    total = 0
    batch = 0
    seeds = ensemble_seeds(base_seed, max_batches)
    remaining = n_events_needed
    while remaining > 0 and batch < max_batches:
        nev = min(events_per_batch, remaining)
        events = sample_particles(surface, species, mcids, None, df_data,
                                  cfg, plasma, nevents=nev,
                                  seed=seeds[batch])
        d = os.path.join(out_dir, f"results_{batch}")
        os.makedirs(d, exist_ok=True)
        writers.write_particle_list_oscar(
            events, os.path.join(d, "particle_list_osc.dat"))
        total += sum(len(e["mcid"]) for e in events)
        remaining -= nev
        batch += 1
    return batch, total, ntot
