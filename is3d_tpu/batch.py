"""Ensemble-batched Cooper-Frye: many freeze-out surfaces in ONE program.

No reference counterpart: the reference (derekeverett/iS3D) processes one
surface per process, so event-by-event hydro studies (the code's main use,
thousands of hydro events per centrality bin) pay a full process launch +
I/O + dispatch per event (scripts/run_multithread_sampling_iS3D.py spawns
one sandboxed process per core).  On TPU the natural shape is the
opposite: stack the ensemble on an event axis, compile the emission pass
ONCE, and let `jax.vmap` turn the per-surface kernels into a single
(E x cells x momentum) program -- small surfaces stop being
dispatch-bound, and the event axis is embarrassingly parallel across a
device mesh (no collectives: each chip owns whole events).

This composes with `is3d_tpu.diff`: gradients flow through the batch, so a
calibration loss summed over an ensemble of surfaces differentiates in one
reverse pass (the per-event reverse passes are batched too).

Padding contract: surfaces of unequal cell count are padded to a common
length with the same benign fills the chunk padding uses
(kernels/common.pad_and_chunk: tau/T/E/P/Lambda/aL = 1, everything else
0).  A padded cell has dsigma_mu = 0, hence u.dsigma = 0, hence it fails
the kernels' validity mask (u.dsigma > 0, prepare_cells) -- padded cells
contribute exactly nothing, by the same mechanism the reference's
FO_chunk remainder handling relies on.

feqmod note: the host-side breakdown partition (a concrete-value perf
optimization, kernels/feqmod._feqmod_spectra_dispatch) cannot run under
vmap tracing, so the batched path disables it and runs the both-branch
kernel -- identical physics, same as is3d_tpu.diff (see its docstring).

Bit parity: a batched row is the same math as the single-surface kernel on
the identically-padded surface, but vmap compiles a different (batched)
program, so agreement is to roundoff (tested <= 1e-12 relative in f64),
not bit-exact.  Single-surface runs keep their bit-stability contract
untouched -- this module never replaces them.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .data import SpeciesArrays
from .io.surface import Surface
from .io.tables import MomentumGrid
from .io.deltaf import DeltafData

from .kernels.common import PAD_ONE_COLUMNS as _ONE_FILL


def stack_surfaces(surfaces: Sequence[Surface], pad_to: int | None = None,
                   dtype=None) -> Surface:
    """Stack an ensemble of surfaces into one Surface with (E, C) leaves.

    Surfaces may have different cell counts; each is padded to
    ``pad_to`` (default: the largest count) with benign fills (module
    docstring).  Every surface must carry the same set of optional blocks
    (a field present on some events and absent on others has no sound
    batched meaning -- that is a config error, not a zero).

    All columns are cast to ``dtype`` (default: the first surface's dtype)
    -- without a common dtype, one f64 event among f32 ones would silently
    promote the whole stacked program to (TPU-emulated, slow) f64.
    """
    if not surfaces:
        raise ValueError("stack_surfaces needs at least one surface")
    n_max = max(s.n_cells for s in surfaces)
    if pad_to is None:
        pad_to = n_max
    if pad_to < n_max:
        raise ValueError(f"pad_to={pad_to} < largest surface ({n_max} cells)")
    if dtype is None:
        dtype = jnp.asarray(surfaces[0].tau).dtype

    out = {}
    for f in dataclasses.fields(Surface):
        vals = [getattr(s, f.name) for s in surfaces]
        have = [v is not None for v in vals]
        if not any(have):
            out[f.name] = None
            continue
        if not all(have):
            raise ValueError(
                f"cannot stack: field '{f.name}' is present on some "
                f"surfaces and None on others")
        fill = 1.0 if f.name in _ONE_FILL else 0.0
        cols = []
        for v in vals:
            v = jnp.asarray(v, dtype=dtype)
            pad = pad_to - v.shape[0]
            if pad:
                v = jnp.concatenate(
                    [v, jnp.full((pad,), fill, dtype=dtype)])
            cols.append(v)
        out[f.name] = jnp.stack(cols)
    return Surface(**out)


def _batch_capped_cfg(cfg: Config, species: SpeciesArrays,
                      grid: MomentumGrid, n_events: int,
                      accumulators: int = 1) -> Config:
    """Divide the per-event scan-chunk budget by the event count.

    The kernels bound their (chunk x species x momentum) block to a
    per-step element budget (kernels/common.effective_chunk), but under
    vmap the materialized block is n_events x that -- without this cap a
    batched run with few reduce groups asks XLA for a block the HBM cannot
    hold (measured: 550 GB at E = 64, reduce_groups = 1).  Same budget
    constants, same block size per step as the single-surface path.
    """
    from .kernels.common import chunk_element_budget
    per_cell = (accumulators * species.n_species * grid.n_pT * grid.n_phi
                * (grid.n_eta if cfg.dimension == 2 else grid.n_y))
    cap = max(1, chunk_element_budget() // max(1, per_cell * n_events))
    return cfg.replace(cell_chunk=min(cfg.cell_chunk, cap))


def batched_spectra_fn(species: SpeciesArrays, grid: MomentumGrid,
                       df_data: DeltafData | None, cfg: Config,
                       n_events: int | None = None) -> Callable:
    """The (E, C)-stacked-surface -> (E, S, PT, PHI, Y) spectra map.

    Dispatches like the production API (api.py / diff.spectra_fn): VAH
    surfaces (mode 2/3) to the VAH kernel, otherwise linear df (modes 1-2)
    or feqmod (modes 3-4, breakdown partition disabled under vmap -- module
    docstring).  The returned callable is pure jnp: jit it, shard its
    input's event axis over a mesh, or differentiate through it.

    Pass ``n_events`` (the stacked leading-axis size) so the per-step
    memory budget accounts for the mapped axis (_batch_capped_cfg);
    without it the caller's cfg.cell_chunk is trusted as-is.

    ``cfg.remat_scan`` is forced on (as in diff.spectra_fn): reverse-mode
    AD through the batch must not store E x n_chunks emission blocks, and
    the experimental Pallas kernel (which ignores remat and has no VJP)
    is thereby never selected.  Forward results are bit-unchanged (pinned
    by test_remat_scan_forward_bit_identical).
    """
    feqmod = cfg.mode not in (2, 3) and cfg.df_mode in (3, 4)
    if n_events is not None:
        # match each kernel's own per_cell accounting (feqmod budgets 4
        # accumulator-sized blocks per cell, kernels/feqmod.py)
        cfg = _batch_capped_cfg(cfg, species, grid, n_events,
                                accumulators=4 if feqmod else 1)
    cfg = cfg.replace(remat_scan=1)
    if cfg.mode in (2, 3):
        from .kernels.vah import smooth_spectra_vah

        def one(surface):
            return smooth_spectra_vah(surface, species, grid, cfg)
    elif cfg.df_mode in (3, 4):
        from .kernels.feqmod import smooth_spectra_feqmod
        from .io.tables import laguerre_device
        fcfg = cfg.replace(feqmod_partition=0)
        laguerre = laguerre_device()

        def one(surface):
            return smooth_spectra_feqmod(surface, species, grid, df_data,
                                         fcfg, laguerre=laguerre)
    else:
        from .kernels.smooth import smooth_spectra

        def one(surface):
            return smooth_spectra(surface, species, grid, df_data, cfg)

    return jax.vmap(one)


def smooth_spectra_batched(stacked: Surface, species: SpeciesArrays,
                           grid: MomentumGrid, df_data: DeltafData | None,
                           cfg: Config, mesh=None) -> jnp.ndarray:
    """Spectra for a stacked ensemble, shape (E, S, n_pT, n_phi, n_y_out).

    With ``mesh`` the EVENT axis is sharded across the mesh's
    ``cfg.mesh_axis`` dimension -- ensemble parallelism with zero
    collectives (each device computes whole events; contrast the
    single-surface mesh path, parallel/mesh.py, which shards cells and
    psums).  The event count must divide evenly; pad the ensemble with a
    throwaway surface if needed (its rows are exact zeros when all its
    dsigma components are zero).
    """
    E = stacked.tau.shape[0]
    n_ev = _events_per_device(E, cfg, mesh)
    fn = batched_spectra_fn(species, grid, df_data, cfg, n_events=n_ev)
    if mesh is None:
        return jax.jit(fn)(stacked)
    return _event_sharded(fn, cfg, mesh, stacked)


def _events_per_device(E: int, cfg: Config, mesh) -> int:
    """Events each device holds -- the divisor for the per-step memory
    budget (with a mesh, each device's block is E/n_dev x chunk, not
    E x chunk)."""
    if mesh is None:
        return E
    return max(1, E // mesh.shape[cfg.mesh_axis])


def _event_sharded(fn: Callable, cfg: Config, mesh, *args):
    """Run a vmapped ensemble map with the EVENT axis (every argument's
    leading axis) sharded over ``mesh``'s ``cfg.mesh_axis`` dimension --
    whole events per device, zero collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    n_dev = mesh.shape[cfg.mesh_axis]
    E = jax.tree.leaves(args[0])[0].shape[0]
    if E % n_dev:
        raise ValueError(
            f"event count {E} does not divide the {n_dev}-device mesh; "
            f"pad the ensemble (stack_surfaces with empty_like_surface "
            f"throwaway events) to a multiple of {n_dev}")
    shard = NamedSharding(mesh, P(cfg.mesh_axis))
    args = jax.tree.map(lambda x: jax.device_put(x, shard), args)
    return jax.jit(fn, out_shardings=shard)(*args)


def polarization_batched(stacked: Surface, species: SpeciesArrays,
                         grid: MomentumGrid, cfg: Config, T_avg,
                         mesh=None) -> dict:
    """Spin polarization (mode-5 surfaces) for a stacked ensemble: the dict
    of spin_polarization outputs with a leading event axis.

    ``T_avg``: the sigma-weighted average temperature per event, shape
    (E,) (or a scalar shared by all events) -- the per-event value the
    single-surface path reads from its Plasma/ThermoAverages (the f0 in
    the polarization integrand uses the surface-averaged T, not per-cell
    T; polzn.py module docstring).  Mesh semantics as in
    smooth_spectra_batched: whole events per device, no collectives.
    """
    import types
    from .kernels.polzn import spin_polarization
    E = stacked.tau.shape[0]
    T_avg = jnp.broadcast_to(jnp.asarray(T_avg, stacked.tau.dtype), (E,))
    pcfg = _batch_capped_cfg(cfg, species, grid,
                             _events_per_device(E, cfg, mesh),
                             accumulators=5)  # polzn carries 5 sums
    pcfg = pcfg.replace(remat_scan=1)

    def one(surface, T):
        return spin_polarization(surface, species, grid, pcfg,
                                 types.SimpleNamespace(temperature=T))

    fn = jax.vmap(one)
    if mesh is None:
        return jax.jit(fn)(stacked, T_avg)
    return _event_sharded(fn, cfg, mesh, stacked, T_avg)


def empty_like_surface(surface: Surface) -> Surface:
    """A throwaway padding event: same blocks/cell count as ``surface``,
    every dsigma component zero (so every cell fails the u.dsigma > 0
    validity mask and the event's spectra are exact zeros), benign fills
    elsewhere.  Use to round an ensemble up to a mesh-divisible size."""
    def fill(name, v):
        if v is None:
            return None
        v = jnp.asarray(v)
        return (jnp.ones_like(v) if name in _ONE_FILL
                else jnp.zeros_like(v))
    kw = {f.name: fill(f.name, getattr(surface, f.name))
          for f in dataclasses.fields(Surface)}
    return Surface(**kw)
