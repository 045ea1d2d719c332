"""High-level run orchestration: the IS3D-class equivalent.

Mirrors the reference's IS3D library API (reference: src/cpp/iS3D.{h,cpp}):
construct from a parameter file + data directories, feed a freeze-out surface
from file or from memory, run particlization, and read back results (smooth
spectra / observables, or sampled particle event lists) -- plus idiomatic
extras: everything is also available as arrays in memory, and multi-chip
execution is a `mesh=` argument away.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config, load_config
from .data import species_from_table
from .io import pdg as pdg_io
from .io import deltaf as deltaf_io
from .io.surface import read_surface, surface_from_arrays, ThermoAverages
from .io.tables import load_momentum_grid, native_momentum_grid, gauss_laguerre
from . import writers


_CHOSEN_FILES = {1: "chosen_particles_urqmd_v3.3+.dat",
                 2: "chosen_particles.dat",
                 3: "chosen_particles_box.dat"}


@dataclass
class RunResult:
    spectra: Optional[np.ndarray] = None        # (S, PT, PHI, Y)
    mcids: Optional[np.ndarray] = None
    events: Optional[list] = None               # sampled particle lists
    dN_dX: Optional[dict] = None                # spacetime distributions
    polarization: Optional[dict] = None
    averages: Optional[ThermoAverages] = None


class IS3D:
    """End-to-end runner.

    Typical use (file mode, reference layout)::

        run = IS3D.from_run_dir(".")            # expects iS3D_parameters.dat,
        result = run.run_particlization()       # input/, PDG/, tables/, ...

    JETSCAPE-style memory mode::

        run = IS3D(cfg, data_dir=...)
        run.read_fo_surf_from_memory(tau=..., x=..., ..., bulkPi=...)
        result = run.run_particlization()
    """

    def __init__(self, cfg: Config, data_dir: str = ".",
                 results_dir: Optional[str] = None, mesh=None,
                 chosen_file: Optional[str] = None):
        from .utils import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        self.cfg = cfg
        self.data_dir = data_dir
        self.results_dir = results_dir or os.path.join(data_dir, "results")
        self.mesh = mesh
        self.chosen_file = chosen_file
        self.surface = None
        self.averages: Optional[ThermoAverages] = None
        self._dtype = jnp.float64 if cfg.precision == "f64" else (
            jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32)
        if cfg.precision == "f64":
            import jax
            if not jax.config.jax_enable_x64:
                # be explicit instead of letting every jnp.asarray emit a
                # truncation warning: without x64 the arrays ARE f32
                print("[is3d_tpu] precision=f64 requested but jax x64 is "
                      "disabled; computing in f32 (enable with "
                      "JAX_ENABLE_X64=1 -- f64 is recommended on CPU only; "
                      "it is emulated and slow on TPU)")
                self._dtype = jnp.float32

    # ------------------------------------------------------------ loading

    @classmethod
    def from_run_dir(cls, run_dir: str = ".", overrides: Optional[dict] = None,
                     **kw) -> "IS3D":
        cfg = load_config(path=os.path.join(run_dir, "iS3D_parameters.dat"),
                          overrides=overrides)
        return cls(cfg, data_dir=run_dir, **kw)

    def read_fo_surf_from_file(self, path: Optional[str] = None,
                               write_averages: bool = True):
        path = path or os.path.join(self.data_dir, "input/surface.dat")
        self.surface, self.averages = read_surface(
            path, mode=self.cfg.mode, dimension=self.cfg.dimension,
            include_baryon=bool(self.cfg.include_baryon),
            include_baryondiff=bool(self.cfg.include_baryondiff_deltaf),
            dtype=self._dtype)
        import jax
        if write_averages and self.averages is not None \
                and self.cfg.mode in (0, 1, 4, 6, 7) \
                and not (self._pod() and jax.process_index()):
            # side-channel file compatibility (reference:
            # readindata.cpp:313-316 <-> Plasma::load_thermodynamic_averages);
            # pod processes share the run dir, so only process 0 writes it
            self.averages.write(os.path.join(
                self.data_dir, "average_thermodynamic_quantities.dat"))
        return self

    def read_fo_surf_from_memory(self, **columns):
        """21-column VH memory interface (reference: iS3D.cpp:27-72), plus any
        further Surface fields.  Units: GeV / GeV fm^-3 (already converted)."""
        self.surface = surface_from_arrays(dtype=self._dtype, **columns)
        from .io.surface import surface_averages
        self.averages = surface_averages(self.surface)
        return self

    # ------------------------------------------------------------ pipeline

    def _prepare(self):
        import jax
        # Run the whole prepare phase on the host CPU device: it is dozens
        # of tiny table/spline/quadrature ops, and on a remote serving
        # backend each would pay its own dispatch round-trip (~0.1-0.4 s
        # apiece -- measured ~50 s of prepare on the toy surface).  The
        # compute kernels transfer these small arrays once when they
        # dispatch.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            (particle_table, df_data, species, chosen_mcids, grid,
             plasma) = self._prepare_impl()
            if jax.default_backend() != "cpu":
                # demote every array to host numpy: CPU-committed jax
                # arrays would pull the jitted kernels onto the CPU
                # backend, while numpy (uncommitted) inputs are placed on
                # the accelerator inside each kernel's own dispatch --
                # zero extra round-trips either way
                tonp = lambda t: jax.tree.map(np.asarray, t)
                df_data, species, grid = tonp((df_data, species, grid))
                self.surface = tonp(self.surface)
        return particle_table, df_data, species, chosen_mcids, grid, plasma

    def _maybe_fill_vah_coefficients(self):
        """Opt-in (cfg.vah_coefficient_tables): fill MISSING per-cell VAH
        residual-df coefficients c0..c4 on mode-2/3 surfaces from the
        shipped deltaf_coefficients/vah tables, bilinearly interpolated in
        (Lambda, aL).  The reference ships these tables but its C++ build
        never loads them (the kernel reads zero-filled FO_surf fields,
        emissionfunction.cpp:1409-1417); the interpolation follows the one
        component that ever consumed them, src/cuda/deltafReader.cu:208-283.
        User-supplied columns always win; with the option off (default)
        absent columns stay zero and the vah_df_gate drops the chains."""
        cfg = self.cfg
        if not (cfg.vah_coefficient_tables and cfg.mode in (2, 3)):
            return
        s = self.surface
        if s is None or s.Lambda is None or s.aL is None:
            return
        missing = [k for k in ("c0", "c1", "c2", "c3", "c4")
                   if getattr(s, k) is None]
        if not missing:
            return
        tables = deltaf_io.load_vah_coefficient_tables(
            os.path.join(self.data_dir, "deltaf_coefficients"))
        coeffs = deltaf_io.interpolate_vah_coefficients(
            tables, np.asarray(s.Lambda), np.asarray(s.aL))
        self.surface = s.replace(
            **{k: jnp.asarray(coeffs[k], dtype=s.tau.dtype)
               for k in missing})

    def _prepare_impl(self):
        cfg = self.cfg
        if self.surface is None:
            self.read_fo_surf_from_file()
        self._maybe_fill_vah_coefficients()

        particle_table = pdg_io.read_resonances(
            os.path.join(self.data_dir, "PDG"), cfg.hrg_eos)

        avg = self.averages
        df_data = deltaf_io.build_deltaf_data(
            os.path.join(self.data_dir, "deltaf_coefficients"), cfg.hrg_eos,
            particle_table=particle_table, T_avg=avg.temperature,
            include_jonah=True, dtype=self._dtype)
        deltaf_io.compute_particle_densities(
            particle_table, cfg.df_mode, avg, df_data,
            include_baryon=bool(cfg.include_baryon))
        if (cfg.include_baryon and cfg.df_mode in (1, 2, 3)
                and cfg.mode not in (2, 3) and self.surface.muB is not None):
            # the nonzero-muB bilinear path silently extrapolates under
            # jit; fail host-side like the reference (deltafReader.cpp:425)
            deltaf_io.validate_df_range(df_data,
                                        np.asarray(self.surface.T),
                                        np.asarray(self.surface.muB))

        chosen_name = self.chosen_file or _CHOSEN_FILES[cfg.hrg_eos]
        chosen_path = os.path.join(self.data_dir, "PDG", chosen_name)
        if os.path.exists(chosen_path):
            mcids = pdg_io.load_chosen_mcids(chosen_path)
        else:  # fall back to every species in the table
            mcids = particle_table.mc_id
        idx = pdg_io.chosen_indices(particle_table, mcids,
                                    group_by_mass=bool(cfg.group_particles),
                                    skip_missing=True)
        species = species_from_table(particle_table, idx, dtype=self._dtype)
        chosen_mcids = particle_table.mc_id[idx]

        tables_dir = os.path.join(self.data_dir, "tables")
        if os.path.isdir(tables_dir):
            grid = load_momentum_grid(tables_dir, cfg.dimension, cfg.operation,
                                      dtype=self._dtype)
            if cfg.mode in (2, 3) and cfg.dimension == 2:
                # VAH surfaces: enable the mT-adaptive eta-node remap even
                # on file-table grids.  Fixed nodes under-resolve the
                # narrow anisotropic integrand at high pT (up to ~6e-2 at
                # the pT grid edge); there is no reference-output parity
                # to preserve for VAH -- the reference's VAH kernel is
                # dead code (emissionfunction.cpp:1650-1656) -- unlike
                # the VH kernels, whose table-grid runs keep fixed-node
                # reference semantics.
                grid = grid.replace(eta_mT_rescale=True)
        else:
            grid = native_momentum_grid(cfg.dimension, dtype=self._dtype)

        # QGP state used inside calculate_spectra honors set_FO_temperature
        # (reference: emissionfunction.cpp:1318-1321); the df/jonah tables
        # above intentionally use the raw surface averages, like iS3D.cpp.
        plasma = avg
        if cfg.set_FO_temperature:
            plasma = ThermoAverages(cfg.T_switch, avg.energy_density,
                                    avg.pressure, avg.baryon_chemical_potential,
                                    avg.net_baryon_density)
        return particle_table, df_data, species, chosen_mcids, grid, plasma

    def run_particlization(self, write_files: bool = True,
                           timer=None) -> RunResult:
        from .utils import PhaseTimer
        timer = timer or PhaseTimer(verbose=False)
        cfg = self.cfg
        # pod operation=2 write path: EVERY process writes its event-slice
        # part file (then process 0 merges), so it keeps the caller's flag
        want_files = write_files
        if self._pod():
            # multi-process pod (jax.distributed): deterministic kernels
            # route through parallel/multihost.py (bit-identical results,
            # replicated on every process); only process 0 writes files
            import jax
            write_files = write_files and jax.process_index() == 0
        if write_files:
            # the spectra writers append (reference ios_base::app parity);
            # a rerun into the same results_dir must not duplicate blocks
            writers.clean_results_dir(self.results_dir)
        with timer.phase("prepare (io, pdg, deltaf)"):
            (particle_table, df_data, species, mcids, grid,
             plasma) = self._prepare()
        self.timer = timer

        result = RunResult(mcids=np.asarray(mcids), averages=self.averages)

        if cfg.mode == 5:
            # thermal-vorticity spin polarization (reference:
            # emissionfunction.cpp:1675 and polzn_kernels.cpp).  The
            # reference's MODE-5 polarization call is dead code -- MODE 5 is
            # swallowed by the VH branch at emissionfunction.cpp:1503, so the
            # reference actually runs the ordinary operation (smooth spectra /
            # dN_dX / sampler) on the vorticity surface.  We do both: compute
            # the polarization the paper advertises, then fall through to the
            # operation dispatch for reference parity.
            if self._pod():
                from .parallel.multihost import spin_polarization_pod
                pol = spin_polarization_pod(self.surface, species, grid, cfg,
                                            plasma, mesh=self.mesh)
            else:
                from .kernels.polzn import spin_polarization
                pol = spin_polarization(self.surface, species, grid, cfg,
                                        plasma, mesh=self.mesh)
            result.polarization = {k: np.asarray(v) for k, v in pol.items()}
            if write_files:
                os.makedirs(self.results_dir, exist_ok=True)
                writers.write_polarization(pol["St"], pol["Sx"], pol["Sy"],
                                           pol["Sn"], pol["Snorm"], grid,
                                           cfg.dimension, self.results_dir)

        if cfg.operation == 1:
            with timer.phase("smooth spectra"):
                spectra = self._smooth_spectra(species, grid, df_data)
                result.spectra = np.asarray(spectra)
            # pipeline overlap: dispatch the (device-resident) decay
            # cascade BEFORE the CPU-bound smooth writers run, so the
            # device computes feed-down while the host formats files;
            # the later np.asarray blocks (kernels/decays
            # .do_resonance_decays_async)
            dec_future = None
            if cfg.do_resonance_decays:
                from .kernels.decays import do_resonance_decays_async
                with timer.phase("resonance decays dispatch"):
                    dec_future = do_resonance_decays_async(
                        np.asarray(result.spectra), particle_table,
                        np.asarray(mcids), grid, cfg)
            if write_files:
                # pass the MATERIALIZED numpy spectra, not the device
                # array: jnp ops inside the writers (transposes,
                # observables) would queue on the accelerator stream
                # BEHIND the just-dispatched cascade and re-serialize the
                # overlap this branch exists to create
                self._write_smooth_files(result.spectra, grid, mcids,
                                         self.results_dir)
            if dec_future is not None:
                with timer.phase("resonance decays"):
                    decayed = np.asarray(dec_future, dtype=np.float64)
                result.spectra = decayed
                if write_files:
                    self._write_decay_files(decayed, grid, mcids,
                                            self.results_dir)
        elif cfg.operation == 0:
            # modes 2-3 route to the VAH emission function inside
            # spacetime_distributions -- a capability the reference lacks
            # entirely (its whole MODE-2 kernel block is commented out,
            # emissionfunction.cpp:1644-1673, and it never had a VAH dN/dX
            # kernel even in dead code)
            with timer.phase("dN/dX spacetime"):
                if self._pod():
                    from .parallel.multihost import spacetime_distributions_pod
                    result.dN_dX = spacetime_distributions_pod(
                        self.surface, species, grid, df_data, cfg,
                        mesh=self.mesh)
                else:
                    from .kernels.dndx import spacetime_distributions
                    result.dN_dX = spacetime_distributions(
                        self.surface, species, grid, df_data, cfg,
                        mesh=self.mesh)
            if write_files:
                os.makedirs(self.results_dir, exist_ok=True)
                writers.write_spacetime_distributions(result.dN_dX, mcids,
                                                      self.results_dir)
        elif cfg.operation == 2:
            # modes 2-3 route to the anisotropic (f_a) sampler inside
            # sample_particles -- a capability the reference lacks (its
            # sample_dN_pTdpTdphidy_VAH_PL is a stub,
            # sampling_kernels.cpp:1231-1239)
            pod = self._pod()
            from .kernels.sample import sample_particles, calculate_total_yield
            part = ((jax.process_index(), jax.process_count()) if pod
                    else None)
            if pod and want_files:
                # fail fast BEFORE the sampling run: both the OSCAR
                # part-file merge and the test_sampler histogram gather
                # need results_dir on a filesystem every process sees
                self._check_pod_shared_fs()
            sample_info = {}
            with timer.phase("sampler"):
                # pod mode: disjoint contiguous GLOBAL event ranges per
                # process (sampling is share-nothing over events -- the
                # reference's whole multi-machine story,
                # scripts/run_multithread_sampling_iS3D.py).  Per-event
                # streams are keyed by the global event index, so the
                # process-ordered union of slices is byte-identical to the
                # single-process run.  Each process samples on its own
                # chip(s); no collectives.
                result.events = sample_particles(
                    self.surface, species, np.asarray(mcids), grid, df_data,
                    cfg, plasma, particle_table,
                    mesh=None if pod else self.mesh, event_partition=part,
                    info=sample_info)
            if cfg.do_resonance_decays and not cfg.test_sampler:
                # event-level MC decay cascade (kernels/mc_decays.py) -- the
                # sampled twin of the smooth feed-down on operation 1.  The
                # reference has no such capability (it hands events to an
                # external afterburner); test_sampler mode keeps raw
                # resonances so its histograms compare against the
                # undecayed mean yield.
                from .kernels.mc_decays import decay_events, derive_decay_seed
                from .kernels.sample import _resolve_seed
                with timer.phase("MC resonance decays"):
                    # NOT the sampler's seed itself: the cascade's lineage
                    # fold_in over the global event index would alias the
                    # sampler's per-event Threefry streams.  ONE shared
                    # decay seed serves every pod process: lineage keys
                    # are (global event, in-event ordinal, decay path), so
                    # the merged pod events are BYTE-identical to the
                    # single-process run -- event_offset carries each
                    # slice's global start into the keying.
                    result.events = decay_events(
                        result.events, particle_table, cfg,
                        seed=derive_decay_seed(_resolve_seed(None, cfg)),
                        event_offset=sample_info.get("event_lo", 0))
            if pod and want_files and cfg.test_sampler:
                # pod validation histograms (round-5): gather every
                # process's event slice to process 0 (the merged list is
                # byte-identical to a single-process run's by the global
                # event-stream keying), bin it as ONE list, write -- the
                # written histograms byte-equal the single-process run's.
                os.makedirs(self.results_dir, exist_ok=True)
                events_global = self._gather_pod_events(result.events)
                if jax.process_index() == 0:
                    from .histograms import (sampler_test_histograms,
                                             write_sampler_test)
                    mean_yield = calculate_total_yield(
                        self.surface, species, df_data, cfg, plasma)
                    hist = sampler_test_histograms(events_global, mcids,
                                                   cfg, mean_yield)
                    write_sampler_test(hist, mcids, self.results_dir)
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(
                    "is3d_pod_test_sampler_written")
            elif pod and want_files:
                # all processes participate (part write + barrier + merge)
                os.makedirs(self.results_dir, exist_ok=True)
                self._write_pod_oscar(result.events)
            elif write_files:
                os.makedirs(self.results_dir, exist_ok=True)
                if cfg.test_sampler:
                    from .histograms import (sampler_test_histograms,
                                             write_sampler_test)
                    mean_yield = calculate_total_yield(
                        self.surface, species, df_data, cfg, plasma)
                    hist = sampler_test_histograms(result.events, mcids, cfg,
                                                   mean_yield)
                    write_sampler_test(hist, mcids, self.results_dir)
                else:
                    writers.write_particle_list_oscar(
                        result.events,
                        os.path.join(self.results_dir, "particle_list_osc.dat"))
        else:
            raise ValueError(f"operation must be 0, 1 or 2, got {cfg.operation}")

        return result

    def _check_pod_shared_fs(self):
        """Pod-mode sampling with file output requires results_dir on a
        SHARED filesystem (process 0 merges every process's part file,
        docs/MULTIHOST.md).  Probe it with a marker file before the
        sampling run: process 0 writes, everyone checks, and the verdicts
        are allgathered so every process raises together instead of
        process 1..n-1 discovering a FileNotFoundError only at the
        post-sampling merge barrier."""
        from jax.experimental import multihost_utils
        marker = os.path.join(self.results_dir, ".is3d_pod_fs_probe")
        if jax.process_index() == 0:
            os.makedirs(self.results_dir, exist_ok=True)
            with open(marker, "w") as f:
                f.write(str(jax.process_count()))
        multihost_utils.sync_global_devices("is3d_pod_fs_probe_written")
        ok = os.path.exists(marker)
        all_ok = multihost_utils.process_allgather(
            np.asarray([ok], dtype=bool))
        multihost_utils.sync_global_devices("is3d_pod_fs_probe_checked")
        if jax.process_index() == 0 and os.path.exists(marker):
            os.remove(marker)
        if not bool(np.all(all_ok)):
            bad = [i for i, v in enumerate(np.ravel(all_ok)) if not v]
            raise RuntimeError(
                f"pod sampling with write_files: results_dir "
                f"'{self.results_dir}' is not visible to process(es) {bad} "
                "-- the part-file merge requires a shared filesystem.  "
                "Point results_dir at shared storage, or run with "
                "write_files=False and write each process's event slice "
                "yourself (docs/MULTIHOST.md, 'Shared filesystem "
                "requirement').")

    def _gather_pod_events(self, events_local):
        """Gather per-process event slices to process 0 through npz part
        files on the shared results_dir (slices are contiguous in process
        order, so concatenation in process order IS the global event
        list).  Returns the global list on process 0, None elsewhere."""
        from jax.experimental import multihost_utils
        from .kernels.sample import EVENT_FIELDS
        p, n_proc = jax.process_index(), jax.process_count()
        part = os.path.join(self.results_dir,
                            f".test_sampler_part{p}of{n_proc}.npz")
        counts = np.asarray([len(e["mcid"]) for e in events_local],
                            dtype=np.int64)
        flat = {k: (np.concatenate([np.asarray(e[k]) for e in events_local])
                    if events_local else
                    np.zeros(0, np.int64 if k == "mcid" else np.float64))
                for k in EVENT_FIELDS}
        np.savez(part, counts=counts, **flat)
        multihost_utils.sync_global_devices("is3d_pod_gather_parts")
        events = None
        if p == 0:
            events = []
            for k in range(n_proc):
                f = os.path.join(self.results_dir,
                                 f".test_sampler_part{k}of{n_proc}.npz")
                if not os.path.exists(f):
                    raise FileNotFoundError(
                        f"pod event gather: missing part file {f} after the "
                        "write barrier -- a process failed to write its "
                        "event slice")
                with np.load(f) as z:
                    offs = np.concatenate([[0], np.cumsum(z["counts"])])
                    cols = {key: z[key] for key in EVENT_FIELDS}
                    for e in range(len(z["counts"])):
                        lo, hi = int(offs[e]), int(offs[e + 1])
                        events.append({key: cols[key][lo:hi]
                                       for key in EVENT_FIELDS})
        multihost_utils.sync_global_devices("is3d_pod_gather_read")
        os.remove(part)
        return events

    def _write_pod_oscar(self, events_local):
        """Pod-mode particle-list write: every process writes its event
        slice to its own part file, a pod barrier orders the writes, and
        process 0 concatenates the parts (in process order = global event
        order) into the reference-named particle_list_osc.dat, refusing on
        a missing part (hole check).  OSCAR events are self-delimiting
        '# N' blocks (writers.write_particle_list_oscar), so concatenation
        IS the merge -- with undecayed events the merged file is
        byte-identical to a single-process run's."""
        from jax.experimental import multihost_utils
        p, n_proc = jax.process_index(), jax.process_count()
        # entry barrier: process 0 cleans results_dir before sampling; no
        # part may be written until every process is past its own sampling
        # (and hence process 0 past the clean)
        multihost_utils.sync_global_devices("is3d_pod_oscar_start")
        part = os.path.join(self.results_dir,
                            f"particle_list_osc.part{p}of{n_proc}.dat")
        writers.write_particle_list_oscar(events_local, part)
        multihost_utils.sync_global_devices("is3d_pod_oscar_parts")
        if p == 0:
            out = os.path.join(self.results_dir, "particle_list_osc.dat")
            parts = [os.path.join(self.results_dir,
                                  f"particle_list_osc.part{k}of{n_proc}.dat")
                     for k in range(n_proc)]
            missing = [f for f in parts if not os.path.exists(f)]
            if missing:
                raise FileNotFoundError(
                    f"pod OSCAR merge: missing part file(s) {missing} after "
                    "the write barrier -- a process failed to write its "
                    "event slice")
            tmp = out + ".tmp"
            import shutil
            with open(tmp, "wb") as fo:
                for f in parts:
                    # stream, don't slurp: production event lists can be
                    # multi-GB per process (advisor round 4)
                    with open(f, "rb") as fi:
                        shutil.copyfileobj(fi, fo, 1 << 22)
            os.replace(tmp, out)
            for f in parts:
                os.remove(f)
        # all processes wait for the merge so a caller's post-run file read
        # is safe on every host
        multihost_utils.sync_global_devices("is3d_pod_oscar_merged")

    def _write_smooth_files(self, spectra, grid, mcids, results_dir):
        cfg = self.cfg
        os.makedirs(results_dir, exist_ok=True)
        writers.write_dN_pTdpTdphidy(spectra, grid, mcids, cfg.dimension,
                                     results_dir)
        writers.write_continuous_vn(spectra, grid, mcids, cfg.dimension,
                                    results_dir)
        writers.write_dN_dy(spectra, grid, mcids, cfg.dimension, results_dir,
                            compat_dndy=bool(cfg.reference_compat_dndy))
        writers.write_dN_dphidy(spectra, grid, mcids, cfg.dimension,
                                results_dir)
        writers.write_dN_twopipTdpTdy(spectra, grid, mcids, cfg.dimension,
                                      results_dir)

    def _write_decay_files(self, decayed, grid, mcids, results_dir):
        cfg = self.cfg
        writers.write_dN_pTdpTdphidy(jnp.asarray(decayed), grid, mcids,
                                     cfg.dimension, results_dir,
                                     suffix="_resonance_decays")
        writers.write_dN_dpTdphidy(jnp.asarray(decayed), grid, mcids,
                                   cfg.dimension, results_dir,
                                   suffix="_resonance_decays")

    def run_ensemble(self, surfaces, write_files: bool = True,
                     pad_to: Optional[int] = None, timer=None) -> list:
        """Smooth spectra for an ENSEMBLE of freeze-out surfaces in one
        batched program (is3d_tpu.batch) -- the event-by-event workflow the
        reference serves with one process per event
        (scripts/run_multithread_sampling_iS3D.py) collapsed into a single
        compiled pass.  Operation 1 only.

        ``surfaces``: a list of surface-file paths and/or ``Surface``
        objects (all events share this run's mode/dimension/df config).
        With ``mesh=`` on the IS3D, the EVENT axis is sharded across the
        mesh (whole events per device, no collectives) -- note this differs
        from ``run_particlization``, which shards the CELL axis; the event
        count must then divide the mesh size.

        The delta-f data is prepared ONCE from the first event's
        sigma-weighted thermo averages: for operation 1 those averages
        only enter the Jonah (df_mode 4) z/lambda splines through T_avg,
        and one centrality's events share the freeze-out state by
        construction (the reference's per-event processes would rebuild
        identical tables from each event's own file).  Every event's
        (T, muB) range is still validated against the df tables.

        Mode-5 (vorticity) surfaces get the batched spin polarization as
        well, each event normalized with its own averaged temperature --
        mirroring run_particlization, which computes polarization and then
        falls through to the operation dispatch.

        Per-event results trees go to ``<results_dir>/event_<i>/`` in the
        reference formats (stale ``event_*`` trees from a previous, larger
        ensemble in the same results_dir are cleaned); returns one
        RunResult per event, in order.
        """
        from .utils import PhaseTimer
        from .io.surface import surface_averages
        from .batch import stack_surfaces, smooth_spectra_batched
        timer = timer or PhaseTimer(verbose=False)
        cfg = self.cfg
        if cfg.operation != 1:
            raise ValueError("run_ensemble batches smooth spectra "
                             "(operation 1); for sampling ensembles use "
                             "ensemble.multiprocess_oversample")
        if self._pod():
            raise ValueError("run_ensemble is single-process; in a pod, "
                             "give each process its own event range instead")

        loaded, averages = [], []
        with timer.phase("load surfaces"):
            for s in surfaces:
                if isinstance(s, (str, os.PathLike)):
                    surf, avg = read_surface(
                        s, mode=cfg.mode, dimension=cfg.dimension,
                        include_baryon=bool(cfg.include_baryon),
                        include_baryondiff=bool(cfg.include_baryondiff_deltaf),
                        dtype=self._dtype)
                else:
                    surf, avg = s, surface_averages(s)
                loaded.append(surf)
                averages.append(avg)
        if not loaded:
            raise ValueError("run_ensemble needs at least one surface")

        self.surface, self.averages = loaded[0], averages[0]
        with timer.phase("prepare (io, pdg, deltaf)"):
            (particle_table, df_data, species, mcids, grid,
             _plasma) = self._prepare()
        self.timer = timer

        # _prepare range-checked only the first event's (T, muB) against
        # the df coefficient tables; the bilinear eval silently
        # extrapolates under jit, so check the rest host-side too
        if (cfg.include_baryon and cfg.df_mode in (1, 2, 3)
                and cfg.mode not in (2, 3)):
            for surf in loaded[1:]:
                if surf.muB is not None:
                    deltaf_io.validate_df_range(df_data,
                                                np.asarray(surf.T),
                                                np.asarray(surf.muB))

        if write_files:
            # a previous, larger ensemble may have written more event_<i>
            # trees into this results_dir; clean them so globs over
            # event_*/ see only this run
            import glob
            for d in glob.glob(os.path.join(self.results_dir, "event_*")):
                tail = os.path.basename(d)[len("event_"):]
                if tail.isdigit() and int(tail) >= len(loaded):
                    writers.clean_results_dir(d)  # owned files only
                    try:
                        os.rmdir(d)  # gone entirely if nothing else inside
                    except OSError:
                        pass  # user files live there; leave the directory

        with timer.phase("stack + batched spectra"):
            stacked = stack_surfaces(loaded, pad_to=pad_to,
                                     dtype=self._dtype)
            spectra = np.asarray(smooth_spectra_batched(
                stacked, species, grid, df_data, cfg, mesh=self.mesh))

        polarization = None
        if cfg.mode == 5:
            from .batch import polarization_batched
            T_avg = np.asarray([cfg.T_switch if cfg.set_FO_temperature
                                else a.temperature for a in averages])
            with timer.phase("batched polarization"):
                pol = polarization_batched(stacked, species, grid, cfg,
                                           T_avg, mesh=self.mesh)
                polarization = {k: np.asarray(v) for k, v in pol.items()}

        results = []
        for e in range(len(loaded)):
            res = RunResult(spectra=spectra[e], mcids=np.asarray(mcids),
                            averages=averages[e])
            event_dir = os.path.join(self.results_dir, f"event_{e}")
            if polarization is not None:
                res.polarization = {k: v[e] for k, v in polarization.items()}
            if write_files:
                writers.clean_results_dir(event_dir)
                self._write_smooth_files(jnp.asarray(spectra[e]), grid,
                                         mcids, event_dir)
                if polarization is not None:
                    p = res.polarization
                    writers.write_polarization(
                        p["St"], p["Sx"], p["Sy"], p["Sn"], p["Snorm"],
                        grid, cfg.dimension, event_dir)
            if cfg.do_resonance_decays:
                from .kernels.decays import do_resonance_decays
                with timer.phase(f"resonance decays (event {e})"):
                    res.spectra = do_resonance_decays(
                        spectra[e], particle_table, np.asarray(mcids), grid,
                        cfg)
                if write_files:
                    self._write_decay_files(res.spectra, grid, mcids,
                                            event_dir)
            results.append(res)
        return results

    def _pod(self) -> bool:
        import jax
        return jax.process_count() > 1

    def _smooth_spectra(self, species, grid, df_data):
        cfg = self.cfg
        if self._pod():
            from .parallel import multihost
            if cfg.mode in (2, 3):
                return multihost.smooth_spectra_vah_pod(
                    self.surface, species, grid, cfg, mesh=self.mesh)
            return multihost.smooth_spectra_pod(
                self.surface, species, grid, df_data, cfg, mesh=self.mesh)
        if cfg.mode in (2, 3):
            # anisotropic hydro surface -> VAH kernel (the reference's call
            # site is commented out, emissionfunction.cpp:1650-1656; we wire
            # it properly)
            from .kernels.vah import smooth_spectra_vah
            return smooth_spectra_vah(self.surface, species, grid, cfg,
                                      mesh=self.mesh)
        if self.mesh is not None:
            from .parallel.mesh import smooth_spectra_sharded
            return smooth_spectra_sharded(self.surface, species, grid,
                                          df_data, cfg, mesh=self.mesh)
        if cfg.df_mode in (1, 2):
            from .kernels.smooth import smooth_spectra
            return smooth_spectra(self.surface, species, grid, df_data, cfg)
        from .kernels.feqmod import smooth_spectra_feqmod
        return smooth_spectra_feqmod(self.surface, species, grid, df_data, cfg)
