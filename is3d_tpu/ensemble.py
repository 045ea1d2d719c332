"""Ensemble / oversampling drivers.

The reference's scale-out story is process-level: oversample.sh reruns the
binary N times into oversampling/results_i, and
run_multithread_sampling_iS3D.py spawns ncores sandboxed worker processes
(SURVEY.md section 2 row 18).  The TPU-native sampler is already vectorized
over events, so one process saturates a chip; these drivers reproduce the
reference's *output layouts* and add deterministic seed handling:

* ``oversample_run``: sample a target hadron count in event batches and write
  each batch to results_<i>/ (oversample.sh layout), checkpointed through a
  manifest.json so an interrupted run resumes from the next incomplete
  batch (the reference has no in-process restartability; its only recovery
  is that each shell-script rerun lands in its own directory),
* ``ensemble_seeds``: independent, collision-free seeds for multi-host
  launches (each host calls sample_particles with its own seed, events
  concatenate across hosts over DCN -- no collective needed, matching the
  reference's share-nothing design).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .kernels.sample import sample_particles, calculate_total_yield
from . import writers


def ensemble_seeds(base_seed: int, n_workers: int) -> list:
    """Independent per-worker seeds via numpy's SeedSequence spawning."""
    ss = np.random.SeedSequence(base_seed)
    return [int(child.generate_state(1)[0] % (2**31))
            for child in ss.spawn(n_workers)]


def _write_manifest(path: str, manifest: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)          # atomic on POSIX


def oversample_run(surface, species, mcids, df_data, cfg, plasma,
                   out_dir: str = "oversampling", events_per_batch: int = 100,
                   base_seed: int = 0, max_batches: int = 1000,
                   resume: bool = True):
    """Sample until cfg.min_num_hadrons hadrons (or max limits), writing one
    OSCAR file per batch into <out_dir>/results_<i>/ (oversample.sh layout).

    Checkpoint/resume: <out_dir>/manifest.json records the run parameters
    and every completed batch (events, hadrons, output file).  A rerun
    with ``resume=True`` (default) skips batches whose manifest entry AND
    output file exist and continues with the next deterministic per-batch
    seed; the resumed run's total output is identical to an uninterrupted
    one.  A manifest from different (base_seed, events_per_batch) refuses
    to resume rather than silently mixing streams.

    Returns (n_batches, total_hadrons, mean_yield)."""
    ntot = abs(calculate_total_yield(surface, species, df_data, cfg, plasma))
    n_events_needed = int(np.ceil(cfg.min_num_hadrons / max(ntot, 1e-30)))
    n_events_needed = min(n_events_needed, cfg.max_num_samples)

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {"base_seed": base_seed, "events_per_batch": events_per_batch,
                "n_events_needed": n_events_needed, "batches": {}}
    if os.path.exists(manifest_path):
        if not resume:
            raise ValueError(
                f"{manifest_path} exists; pass resume=True to continue the "
                "run or choose a fresh out_dir")
        with open(manifest_path) as f:
            prev = json.load(f)
        # n_events_needed is pinned too: it derives from min_num_hadrons
        # and the computed mean yield, so a changed target (or a yield
        # that reproduces differently across backends) must refuse rather
        # than silently truncate or regenerate completed batches
        if (prev.get("base_seed") != base_seed
                or prev.get("events_per_batch") != events_per_batch
                or prev.get("n_events_needed") != n_events_needed):
            raise ValueError(
                f"{manifest_path} was written with base_seed="
                f"{prev.get('base_seed')}, events_per_batch="
                f"{prev.get('events_per_batch')}, n_events_needed="
                f"{prev.get('n_events_needed')} (now {n_events_needed}); "
                "refusing to resume with different parameters (would "
                "silently mix sample streams)")
        manifest = prev

    # deterministic batch plan: the event count of batch i depends only on
    # (n_events_needed, events_per_batch), so a resumed run re-derives the
    # identical plan and can re-run ANY batch -- including one whose
    # manifest entry survives but whose output file was lost -- with its
    # original event count and seed
    plan = []
    left = n_events_needed
    while left > 0 and len(plan) < max_batches:
        plan.append(min(events_per_batch, left))
        left -= plan[-1]

    seeds = ensemble_seeds(base_seed, max_batches)
    total = 0
    for batch, nev in enumerate(plan):
        done = manifest["batches"].get(str(batch))
        if (done is not None and done["events"] == nev
                and os.path.exists(done["file"])):
            total += done["hadrons"]
            continue
        events = sample_particles(surface, species, mcids, None, df_data,
                                  cfg, plasma, nevents=nev,
                                  seed=seeds[batch])
        d = os.path.join(out_dir, f"results_{batch}")
        os.makedirs(d, exist_ok=True)
        out_file = os.path.join(d, "particle_list_osc.dat")
        writers.write_particle_list_oscar(events, out_file)
        n_had = sum(len(e["mcid"]) for e in events)
        manifest["batches"][str(batch)] = {
            "events": nev, "hadrons": n_had, "file": out_file,
            "seed": seeds[batch]}
        _write_manifest(manifest_path, manifest)
        total += n_had
    return len(plan), total, ntot
