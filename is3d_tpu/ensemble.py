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
    """Independent per-worker seeds via numpy's SeedSequence spawning.

    63-bit seeds (jax.random.key takes int64): a 31-bit reduction would
    give a ~2e-4 birthday-collision chance over a 1000-batch plan, and a
    colliding pair of batches would produce byte-identical, double-counted
    sample streams."""
    ss = np.random.SeedSequence(base_seed)
    return [int(child.generate_state(2, dtype=np.uint64)[0] % (2**63))
            for child in ss.spawn(n_workers)]


def _write_manifest(path: str, manifest: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)          # atomic on POSIX


def oversample_run(surface, species, mcids, df_data, cfg, plasma,
                   out_dir: str = "oversampling", events_per_batch: int = 100,
                   base_seed: int = 0, max_batches: int = 1000,
                   resume: bool = True, worker_id: int = 0,
                   n_workers: int = 1, mesh=None, particle_table=None):
    """Sample until cfg.min_num_hadrons hadrons (or max limits), writing one
    OSCAR file per batch into <out_dir>/results_<i>/ (oversample.sh layout).

    Checkpoint/resume: <out_dir>/manifest.json records the run parameters
    and every completed batch (events, hadrons, output file).  A rerun
    with ``resume=True`` (default) skips batches whose manifest entry AND
    output file exist and continues with the next deterministic per-batch
    seed; the resumed run's total output is identical to an uninterrupted
    one.  A manifest from different (base_seed, events_per_batch) refuses
    to resume rather than silently mixing streams.

    Multi-process/multi-host: with ``n_workers > 1`` this process handles
    only the batches with ``batch % n_workers == worker_id`` and records
    them in its own manifest_worker<k>.json (no cross-process file
    contention; batch seeds stay identical to a single-worker run, so the
    union of all workers' output equals the single-process run file for
    file).  Use multiprocess_oversample to spawn the workers and merge,
    or run workers on separate hosts against a shared filesystem -- the
    share-nothing TPU-native analog of the reference's
    run_multithread_sampling_iS3D.py sandboxed process pool.

    With ``cfg.do_resonance_decays`` and a ``particle_table``, every batch
    is run through the event-level MC decay cascade (kernels/mc_decays.py)
    before writing, under its own deterministic per-batch seed -- resumed
    runs reproduce decayed batches byte-identically, and the flag is pinned
    in the manifest so decayed and undecayed batches cannot mix.

    Returns (n_batches, total_hadrons, mean_yield); totals cover only this
    worker's batches when n_workers > 1."""
    do_decays = bool(getattr(cfg, "do_resonance_decays", 0))
    if do_decays and particle_table is None:
        raise ValueError("cfg.do_resonance_decays=1 needs particle_table= "
                         "(the full ParticleTable the decay channels come "
                         "from)")
    ntot = abs(calculate_total_yield(surface, species, df_data, cfg, plasma))
    n_events_needed = int(np.ceil(cfg.min_num_hadrons / max(ntot, 1e-30)))
    n_events_needed = min(n_events_needed, cfg.max_num_samples)

    os.makedirs(out_dir, exist_ok=True)
    manifest_name = ("manifest.json" if n_workers == 1
                     else f"manifest_worker{worker_id}.json")
    manifest_path = os.path.join(out_dir, manifest_name)
    # mesh sharding changes the per-batch random stream (per-shard key
    # folding), so it is pinned like the other stream parameters
    mesh_shards = 0 if mesh is None else int(mesh.shape[cfg.mesh_axis])
    # stream-identity tags: the sampler draw path (alias tables vs binary
    # search consume different Threefry substreams) and the MC-decay keying
    # scheme are both part of "which bytes does batch i produce"; a resumed
    # run must refuse on a mismatch exactly like a changed base_seed would
    from .kernels.mc_decays import DECAY_STREAM_VERSION
    sampler_alias = int(getattr(cfg, "sampler_alias", 0))
    decay_stream = DECAY_STREAM_VERSION if do_decays else 0
    manifest = {"base_seed": base_seed, "events_per_batch": events_per_batch,
                "n_events_needed": n_events_needed, "batches": {},
                "worker_id": worker_id, "n_workers": n_workers,
                "mesh_shards": mesh_shards, "max_batches": max_batches,
                "decays": int(do_decays), "sampler_alias": sampler_alias,
                "decay_stream": decay_stream}
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
                or prev.get("n_events_needed") != n_events_needed
                or prev.get("worker_id", 0) != worker_id
                or prev.get("n_workers", 1) != n_workers
                or prev.get("mesh_shards", 0) != mesh_shards
                or prev.get("decays", 0) != int(do_decays)
                or prev.get("sampler_alias") != sampler_alias
                or prev.get("decay_stream", 0) != decay_stream):
            raise ValueError(
                f"{manifest_path} was written with base_seed="
                f"{prev.get('base_seed')}, events_per_batch="
                f"{prev.get('events_per_batch')}, n_events_needed="
                f"{prev.get('n_events_needed')} (now {n_events_needed}), "
                f"worker {prev.get('worker_id', 0)}/"
                f"{prev.get('n_workers', 1)}, decays="
                f"{prev.get('decays', 0)} (now {int(do_decays)}), "
                f"sampler_alias={prev.get('sampler_alias')} "
                f"(now {sampler_alias}), decay_stream="
                f"{prev.get('decay_stream', 0)} (now {decay_stream}); "
                "refusing to resume with different parameters (would "
                "silently mix sample streams)")
        manifest = prev
        # max_batches is a run-length cap, not a stream parameter: batch
        # seeds/contents don't depend on it, so resuming with a different
        # cap is legitimate (it is how interrupted runs are tested); keep
        # the manifest's recorded value current for merge_manifests
        manifest["max_batches"] = max_batches

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
        if batch % n_workers != worker_id:
            continue
        done = manifest["batches"].get(str(batch))
        if (done is not None and done["events"] == nev
                and os.path.exists(done["file"])):
            total += done["hadrons"]
            continue
        events = sample_particles(surface, species, mcids, None, df_data,
                                  cfg, plasma, nevents=nev,
                                  seed=seeds[batch], mesh=mesh)
        if do_decays:
            # the decay seed derives from the batch's sampler seed through
            # an independent SeedSequence branch: a pure function of
            # (base_seed, batch), so it survives a resume with a different
            # max_batches cap (which legitimately changes the plan length
            # but must not change any batch's streams) and never aliases
            # the sampler's own Threefry streams
            from .kernels.mc_decays import decay_events, derive_decay_seed
            events = decay_events(events, particle_table, cfg,
                                  seed=derive_decay_seed(seeds[batch]))
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


def merge_manifests(out_dir: str, n_workers: int) -> dict:
    """Merge per-worker manifests into <out_dir>/manifest.json.

    Validates that all workers ran with consistent parameters and that the
    union of their batch sets covers the deterministic plan (reporting any
    holes).  Returns the merged manifest dict (keys: base_seed,
    events_per_batch, n_events_needed, n_workers, batches, total_hadrons,
    complete, missing_batches)."""
    merged = None
    for k in range(n_workers):
        # a single-worker run writes the plain manifest.json name
        name = ("manifest.json" if n_workers == 1
                else f"manifest_worker{k}.json")
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):
            raise FileNotFoundError(f"missing worker manifest: {path}")
        with open(path) as f:
            m = json.load(f)
        if merged is None:
            merged = {key: m[key] for key in
                      ("base_seed", "events_per_batch", "n_events_needed")}
            merged.update(n_workers=n_workers, batches={},
                          max_batches=m.get("max_batches", 1000),
                          mesh_shards=m.get("mesh_shards", 0),
                          decays=m.get("decays", 0),
                          sampler_alias=m.get("sampler_alias"),
                          decay_stream=m.get("decay_stream", 0))
        else:
            for key in ("base_seed", "events_per_batch", "n_events_needed",
                        "max_batches", "mesh_shards", "decays",
                        "sampler_alias", "decay_stream"):
                # mesh_shards/decays/decay_stream default to 0 for pre-flag
                # manifests -- a decayed worker must NOT merge silently
                # with an old undecayed one
                have = (m.get(key, 0)
                        if key in ("mesh_shards", "decays", "decay_stream")
                        else m.get(key, merged.get(key)))
                if have != merged.get(key):
                    raise ValueError(
                        f"worker {k} manifest disagrees on {key}: "
                        f"{have} != {merged.get(key)}")
        if m.get("n_workers", 1) != n_workers:
            raise ValueError(
                f"worker {k} ran with n_workers={m.get('n_workers', 1)}, "
                f"expected {n_workers}")
        merged["batches"].update(m["batches"])

    # re-derive the batch plan -- with the same max_batches cap the workers
    # applied -- and report holes
    plan = []
    left = merged["n_events_needed"]
    while left > 0 and len(plan) < merged["max_batches"]:
        plan.append(min(merged["events_per_batch"], left))
        left -= plan[-1]
    missing = [b for b in range(len(plan))
               if str(b) not in merged["batches"]
               or not os.path.exists(merged["batches"][str(b)]["file"])]
    # count only batches inside the re-derived plan whose output file still
    # exists: stale entries from an earlier run with a larger max_batches,
    # or batches whose file was deleted (they are in missing_batches and
    # will be regenerated), must not inflate the yield
    missing_set = set(missing)
    merged["total_hadrons"] = sum(v["hadrons"]
                                  for b, v in merged["batches"].items()
                                  if int(b) < len(plan)
                                  and int(b) not in missing_set)
    merged["complete"] = not missing
    merged["missing_batches"] = missing
    _write_manifest(os.path.join(out_dir, "manifest.json"), merged)
    return merged


def multiprocess_oversample(run_dir: str, out_dir: str, n_workers: int = 2,
                            events_per_batch: int = 100, base_seed: int = 0,
                            overrides: dict | None = None,
                            platform: str | None = None,
                            mesh_devices: int | None = None,
                            host_devices: int | None = None,
                            timeout: float = 3600.0,
                            stagger_cold_start: bool = True) -> dict:
    """Spawn ``n_workers`` sampler worker processes over disjoint batch
    ranges of the same oversampling plan and merge their manifests.

    Each worker is an independent process (its own JAX backend / TPU chip)
    that loads the surface from ``run_dir`` (reference file layout:
    iS3D_parameters.dat, input/, PDG/, tables/, deltaf_coefficients/),
    computes the identical deterministic batch plan, and processes batches
    with ``batch % n_workers == worker_id`` -- the TPU-native equivalent of
    the reference's run_multithread_sampling_iS3D.py sandboxed process
    pool (share-nothing; per-batch output files; no collectives).  Crashed
    or killed workers can simply be re-launched: per-batch checkpointing
    in the worker manifests makes the rerun resume where it stopped.

    With ``stagger_cold_start`` (default), worker 0 is launched alone and
    the rest only once its first batch lands (or it exits): the sampler's
    phase-A compile is ~3 min machine-cold on the serving TPU backend, and
    simultaneously-launched workers would each pay it redundantly because
    none finds a persistent-cache entry until the first compile finishes.
    After worker 0's first batch the cache is populated and the remaining
    workers start warm.  On a warm machine the stagger costs one short
    batch of worker-0 solo time.

    Returns the merged manifest (see merge_manifests)."""
    import subprocess
    import sys

    args_common = [f"run_dir={run_dir}", f"out_dir={out_dir}",
                   f"n_workers={n_workers}",
                   f"events_per_batch={events_per_batch}",
                   f"base_seed={base_seed}"]
    if platform:
        args_common.append(f"platform={platform}")
    if mesh_devices:
        # each worker shards its cell axis over its local chips
        args_common.append(f"mesh_devices={mesh_devices}")
    if host_devices:
        args_common.append(f"host_devices={host_devices}")
    for k, v in (overrides or {}).items():
        args_common.append(f"{k}={v}")

    import time as _time

    def _spawn(w):
        cmd = [sys.executable, "-m", "is3d_tpu.ensemble_worker",
               f"worker_id={w}", *args_common]
        return subprocess.Popen(cmd)

    deadline = _time.monotonic() + timeout
    procs = [_spawn(0)]
    if n_workers > 1 and stagger_cold_start:
        # wait for worker 0's first completed batch (see docstring)
        m0 = os.path.join(out_dir, "manifest_worker0.json")
        while _time.monotonic() < deadline:
            if procs[0].poll() is not None:
                break               # worker 0 done/failed; launch the rest
            try:
                with open(m0) as f:
                    if json.load(f).get("batches"):
                        break
            except (OSError, ValueError):
                pass                # not written yet / mid-rewrite
            _time.sleep(0.5)
    procs += [_spawn(w) for w in range(1, n_workers)]
    try:
        rcs = [p.wait(timeout=max(1.0, deadline - _time.monotonic()))
               for p in procs]
    except subprocess.TimeoutExpired:
        # one shared deadline for the whole pool; kill every straggler so
        # no orphan worker keeps appending batches to out_dir
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait()
        raise RuntimeError(
            f"oversample worker pool exceeded {timeout:.0f} s; all workers "
            "killed -- re-launch multiprocess_oversample to resume from "
            "the per-batch checkpoints")
    bad = [(w, rc) for w, rc in enumerate(rcs) if rc != 0]
    if bad:
        raise RuntimeError(
            f"oversample worker(s) failed (worker, rc): {bad}; re-launch "
            "multiprocess_oversample to resume from the per-batch "
            "checkpoints")
    return merge_manifests(out_dir, n_workers)
