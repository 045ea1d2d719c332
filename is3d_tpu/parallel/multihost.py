"""Multi-host execution: shard the cell axis across processes over DCN.

The reference has no distributed backend at all -- its cross-machine story
is independent sampler processes with per-process working directories
(scripts/run_multithread_sampling_iS3D.py; SURVEY.md section 2, parallelism
inventory item 3-4).  That story is covered by ensemble.multiprocess_oversample
(sampling is embarrassingly parallel: events never cross process boundaries,
so no collective is needed).  What a process-per-run model CANNOT do is put
one very large smooth-spectra surface across more chips than one host owns.
This module adds that: a jax.distributed multi-host path where

* every process initializes the same global mesh over all chips of the pod
  slice (ICI within a host, DCN across hosts),
* each process loads only its contiguous slice of the surface cell axis
  (``process_cell_slice``), assembled into global arrays with
  ``jax.make_array_from_process_local_data``,
* the reduction reuses grouped_cell_reduce's canonical group tree
  (parallel/mesh.py) -- the shard_map body and the sequential group fold are
  the same code, so multi-host results are BIT-IDENTICAL to the single-host
  and single-device results for any process/device count
  (tests/test_multihost.py asserts exact equality for a 2-process x
  2-device CPU pod against the in-process path).

Replicated inputs (species tables, momentum grid, df coefficient splines)
are passed as host-local numpy/jax arrays identical on every process; only
the surface is sharded.  The spectra accumulator is psum-combined by the
canonical fold and returned replicated, so every process holds the full
result and any of them can write outputs.

feqmod (df_mode 3/4) keeps the same load-only-your-slice contract as every
other path: the breakdown routing happens per chunk INSIDE the compiled
kernel (kernels/feqmod.routed_switch), from flags computed in-program on
each device's own cells -- there is no global host-side partition decision
to agree on, so no process ever needs another process's columns.  (Until
round 3 the feqmod dispatch compacted cells by a host-side probe and
therefore required the FULL columns on every process; the in-kernel
routing removed that scaling liability.)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from .mesh import (canonical_groups, _grouped_shard_run, _pad_cols_to,
                   _tree_fold)


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kwargs) -> None:
    """Join the jax.distributed pod.  Must run before any other JAX call in
    the process (backend init is one-shot).  Thin wrapper so callers don't
    import jax.distributed themselves."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def pod_active() -> bool:
    """True when this process is part of a multi-process pod (api.IS3D uses
    this to route the deterministic kernels through the multi-host paths
    and to restrict file writing to process 0)."""
    return jax.process_count() > 1


def global_mesh(axis: str = "cells") -> Mesh:
    """1-D mesh over every device in the pod (all processes)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def _padded_layout(cfg: Config, n_global: int, mesh: Mesh) -> tuple[int, int]:
    """(padded global cell count, group size) of the canonical tree for this
    global surface on this mesh -- same arithmetic as grouped_cell_reduce."""
    axis = cfg.mesh_axis
    G, gs = canonical_groups(cfg, n_global)
    n_dev = mesh.shape[axis]
    G_pad = -(-G // n_dev) * n_dev
    return G_pad * gs, gs


def _process_extent(cfg: Config, n_global: int,
                    mesh: Mesh) -> tuple[int, int, int]:
    """This process's contiguous [a, b) extent of the PADDED global cell
    axis (plus the padded length).  Derived from the sharding's addressable
    shards, so it is correct for any device->process assignment as long as
    each process's shards are contiguous along the cell axis (true for the
    standard pod layout; asserted)."""
    n_padded, _ = _padded_layout(cfg, n_global, mesh)
    sharding = NamedSharding(mesh, P(cfg.mesh_axis))
    idx = sharding.addressable_devices_indices_map((n_padded,))
    spans = sorted((s[0].start or 0, s[0].stop if s[0].stop is not None
                    else n_padded) for s in idx.values())
    for (a, b), (c, d) in zip(spans, spans[1:]):
        if b != c:
            raise ValueError(
                f"process shards are not contiguous on the cell axis: {spans}"
                " -- load per-shard slices manually")
    return spans[0][0], spans[-1][1], n_padded


def process_cell_slice(cfg: Config, n_global: int,
                       mesh: Mesh | None = None) -> tuple[int, int]:
    """The [start, stop) range of GLOBAL surface cells this process must
    load, clipped to n_global on both ends (a process whose whole extent is
    canonical-tree padding loads nothing: start == stop == n_global)."""
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    a, b, _ = _process_extent(cfg, n_global, mesh)
    return min(a, n_global), min(b, n_global)


def _assemble_global_cols(cols_local: dict, start: int, stop_real: int,
                          n_global: int, cfg: Config, mesh: Mesh) -> dict:
    """Pad this process's real-cell columns to its addressable extent
    [a, b) of the padded global axis (inert pad cells: dsigma = 0) and
    assemble global sharded arrays.  A process whose whole extent is
    canonical-tree padding (a >= n_global) contributes only pad cells."""
    a, b, n_padded = _process_extent(cfg, n_global, mesh)
    sharding = NamedSharding(mesh, P(cfg.mesh_axis))
    if (start, stop_real) != (min(a, n_global), min(b, n_global)):
        raise ValueError(
            f"local columns must be this process's cell slice "
            f"[{min(a, n_global)}, {min(b, n_global)}), got "
            f"[{start}, {stop_real})")
    n_real = stop_real - start
    if any(v.shape[0] != n_real for v in cols_local.values()):
        raise ValueError(
            f"local columns must hold exactly cells [{start}, {stop_real}) "
            f"({n_real} rows)")
    cols, _ = _pad_cols_to(cols_local, b - a)
    if b - a != n_real:
        # real rows sit at the front of the extent ([a, a + n_real) with
        # a == start when a < n_global), so global index a+i < n_global
        # is exactly the real-row mask
        mask = (jnp.arange(a, b) < n_global).astype(cols["tau"].dtype)
        for k in ("dat", "dax", "day", "dan"):
            cols[k] = cols[k] * mask
    # global_shape passed explicitly: with heterogeneous device-per-process
    # splits jax cannot infer it from the (non-uniform) local shards
    return {k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v), global_shape=(n_padded,))
            for k, v in cols.items()}


def multihost_cell_reduce(kernel_fn, cols_local: dict, n_global: int,
                          replicated: tuple, cfg: Config,
                          mesh: Mesh | None = None,
                          unroll_groups: bool = False):
    """Multi-host counterpart of grouped_cell_reduce: every process passes
    its own contiguous slice of the surface columns (see
    ``process_cell_slice``) and receives the full, replicated accumulator
    pytree.  The canonical group tree makes the result bit-identical to the
    single-host paths."""
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    start, stop_real = process_cell_slice(cfg, n_global, mesh)
    _, gs = _padded_layout(cfg, n_global, mesh)
    cols = _assemble_global_cols(cols_local, start, stop_real, n_global,
                                 cfg, mesh)
    parts = _grouped_shard_run(kernel_fn, cols, replicated, cfg, mesh, gs,
                               unroll_groups)
    # same sequential fold as the single-host path (bit-identical combine);
    # explicit replicated out_sharding so every process can read the result
    return jax.device_get(_fold_replicated(mesh)(parts))


@functools.lru_cache(maxsize=8)
def _fold_replicated(mesh: Mesh):
    """Per-mesh jit of the canonical fold (a fresh jax.jit wrapper per call
    would re-trace every time)."""
    return jax.jit(_tree_fold, out_shardings=NamedSharding(mesh, P()))


def _reject_feqmod(cfg: Config, what: str, alternative: str) -> None:
    if cfg.df_mode in (3, 4) and cfg.mode not in (2, 3):
        raise ValueError(
            f"multi-host {what} handles df_mode 1/2 (and VAH modes 2/3); "
            f"feqmod (df_mode {cfg.df_mode}) runs through {alternative} "
            "(same slice-local contract, plus the Gauss-Laguerre table for "
            "the in-kernel breakdown routing).")


def smooth_spectra_multihost(cols_local: dict, n_global: int, species, grid,
                             df_data, cfg: Config,
                             mesh: Mesh | None = None):
    """Multi-host linear-df smooth spectra (df_mode 1/2): each process
    supplies surface_columns() of its process_cell_slice; returns the full
    (S, PT, PHI, Y) spectra on every process."""
    if cfg.mode in (2, 3):
        raise ValueError(
            f"smooth_spectra_multihost handles VH surfaces only; VAH "
            f"(mode={cfg.mode}) runs through smooth_spectra_vah_multihost")
    if cfg.df_mode not in (1, 2):
        _reject_feqmod(cfg, "smooth spectra", "feqmod_spectra_multihost")
        raise ValueError(f"df_mode must be 1 or 2, got {cfg.df_mode}")
    from ..kernels.smooth import _smooth_spectra_jit
    kern = lambda c, s, g, d: _smooth_spectra_jit(c, s, g, d, cfg)
    return multihost_cell_reduce(kern, cols_local, n_global,
                                 (species, grid, df_data), cfg, mesh)


def smooth_spectra_vah_multihost(cols_local: dict, n_global: int, species,
                                 grid, cfg: Config,
                                 mesh: Mesh | None = None):
    """Multi-host VAH smooth spectra (mode 2/3 surfaces): each process
    supplies vah_surface_cols() of its process_cell_slice.

    Deliberately ungated: the vah_df_gate zero-chain probe
    (kernels/vah.effective_vah_cfg) would decide per process slice, and
    under multi-controller JAX every process must compile the SAME global
    program.  Gate at the caller from FULL columns when available (the pod
    wrappers do)."""
    from ..kernels.vah import _vah_jit
    kern = lambda c, s, g: _vah_jit(c, s, g, cfg)
    return multihost_cell_reduce(kern, cols_local, n_global, (species, grid),
                                 cfg, mesh)


def spin_polarization_multihost(cols_local: dict, n_global: int, species,
                                grid, cfg: Config, plasma,
                                mesh: Mesh | None = None) -> dict:
    """Multi-host spin polarization (mode-5 surfaces): each process supplies
    polzn_cols() of its process_cell_slice; returns the full result dict
    (kernels/polzn.spin_polarization) on every process."""
    from ..kernels.polzn import _polzn_jit, polzn_normalize
    T_avg = jnp.asarray(plasma.temperature, cols_local["tau"].dtype)
    kern = lambda c, s, g, t: _polzn_jit(c, s, g, t, cfg)
    sums = multihost_cell_reduce(kern, cols_local, n_global,
                                 (species, grid, T_avg), cfg, mesh,
                                 unroll_groups=True)
    return polzn_normalize(sums)


def spacetime_distributions_multihost(cols_local: dict, n_global: int,
                                      species, grid, df_data, cfg: Config,
                                      mesh: Mesh | None = None) -> dict:
    """Multi-host dN/dX spacetime distributions (df_mode 1/2 or VAH
    mode 2/3): each process supplies dndx_cols() of its process_cell_slice;
    returns the normalized distribution dict on every process."""
    _reject_feqmod(cfg, "dN/dX", "feqmod_spacetime_distributions_multihost")
    from ..kernels.dndx import _dndx_jit, dndx_finalize
    grid = grid.replace(eta_mT_rescale=False)   # same as the in-process path
    lag = jnp.zeros((), cols_local["tau"].dtype)   # no feqmod branch here
    kern = lambda c, s, g, d, lg: _dndx_jit(c, s, g, d, lg, cfg, "both")
    acc = multihost_cell_reduce(kern, cols_local, n_global,
                                (species, grid, df_data, lag), cfg, mesh,
                                unroll_groups=True)
    return dndx_finalize(acc, grid, cfg)


def _laguerre_cast(laguerre, dtype):
    from ..io.tables import laguerre_in_precision
    return laguerre_in_precision(laguerre, dtype)


def feqmod_spectra_multihost(cols_local: dict, n_global: int, species, grid,
                             df_data, cfg: Config, laguerre=None,
                             mesh: Mesh | None = None):
    """Multi-host feqmod smooth spectra (df_mode 3/4): each process
    supplies surface_columns() of its process_cell_slice (the SAME
    slice-local contract as every other path -- breakdown routing happens
    per chunk inside the kernel); returns the full (S, PT, PHI, Y)
    spectra on every process, bit-identical to the single-host routed
    dispatch."""
    if cfg.df_mode not in (3, 4):
        raise ValueError("feqmod multi-host handles df modes 3-4, got "
                         f"{cfg.df_mode}")
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    from ..kernels.feqmod import _feqmod_spectra_jit, feqmod_kernel_mode
    lag = _laguerre_cast(laguerre, cols_local["tau"].dtype)
    # mode derives from the GLOBAL cell count, so every process compiles
    # the same program regardless of its slice length
    mode = feqmod_kernel_mode(cfg, n_global)
    kern = lambda c, s, g, d, lg: _feqmod_spectra_jit(c, s, g, d, lg, cfg,
                                                      mode)
    return multihost_cell_reduce(kern, cols_local, n_global,
                                 (species, grid, df_data, lag), cfg, mesh)


def feqmod_spacetime_distributions_multihost(cols_local: dict, n_global: int,
                                             species, grid, df_data,
                                             cfg: Config, laguerre=None,
                                             mesh: Mesh | None = None) -> dict:
    """Multi-host feqmod dN/dX (df_mode 3/4): each process supplies
    dndx_cols() of its process_cell_slice (slice-local contract, see
    feqmod_spectra_multihost); returns the normalized distribution dict
    on every process."""
    if cfg.df_mode not in (3, 4) or cfg.mode in (2, 3):
        raise ValueError("feqmod dN/dX multi-host handles df modes 3-4 on "
                         f"VH surfaces, got df_mode={cfg.df_mode} "
                         f"mode={cfg.mode}")
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    from ..kernels.dndx import _dndx_jit, dndx_finalize
    from ..kernels.feqmod import feqmod_kernel_mode
    grid = grid.replace(eta_mT_rescale=False)   # same as the in-process path
    lag = _laguerre_cast(laguerre, cols_local["tau"].dtype)
    mode = feqmod_kernel_mode(cfg, n_global)
    kern = lambda c, s, g, d, lg: _dndx_jit(c, s, g, d, lg, cfg, mode)
    acc = multihost_cell_reduce(kern, cols_local, n_global,
                                (species, grid, df_data, lag), cfg, mesh,
                                unroll_groups=True)
    return dndx_finalize(acc, grid, cfg)


# --------------------------------------------------------------- pod mode
# Full-surface conveniences for api.IS3D: in file mode every process reads
# the whole surface anyway (the reference CLI layout), so these slice the
# process's shard internally and the pod run is the SAME command on every
# process.  Results stay bit-identical to the single-process run.

def _slice_for(cols: dict, n_global: int, cfg: Config, mesh: Mesh) -> dict:
    start, stop = process_cell_slice(cfg, n_global, mesh)
    return {k: np.asarray(v)[start:stop] for k, v in cols.items()}


def smooth_spectra_pod(surface, species, grid, df_data, cfg: Config,
                       mesh: Mesh | None = None):
    """Pod-mode smooth spectra from the full surface (VH df 1-4)."""
    from ..kernels.common import surface_columns
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    cols = surface_columns(surface, cfg)
    n_global = int(cols["tau"].shape[0])
    if cfg.df_mode in (3, 4):
        return feqmod_spectra_multihost(
            _slice_for(cols, n_global, cfg, mesh), n_global, species, grid,
            df_data, cfg, mesh=mesh)
    return smooth_spectra_multihost(_slice_for(cols, n_global, cfg, mesh),
                                    n_global, species, grid, df_data, cfg,
                                    mesh)


def smooth_spectra_vah_pod(surface, species, grid, cfg: Config,
                           mesh: Mesh | None = None):
    """Pod-mode VAH smooth spectra from the full mode-2/3 surface."""
    from ..kernels.vah import vah_surface_cols, effective_vah_cfg
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    cols = vah_surface_cols(surface)
    # gate from the FULL columns: every process holds the whole surface
    # here, so the decision (hence the compiled global program) is
    # identical on all of them
    cfg = effective_vah_cfg(cols, cfg)
    n_global = int(cols["tau"].shape[0])
    return smooth_spectra_vah_multihost(_slice_for(cols, n_global, cfg, mesh),
                                        n_global, species, grid, cfg, mesh)


def spin_polarization_pod(surface, species, grid, cfg: Config, plasma,
                          mesh: Mesh | None = None) -> dict:
    """Pod-mode spin polarization from the full mode-5 surface."""
    from ..kernels.polzn import polzn_cols
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    cols = polzn_cols(surface)
    n_global = int(cols["tau"].shape[0])
    return spin_polarization_multihost(_slice_for(cols, n_global, cfg, mesh),
                                       n_global, species, grid, cfg, plasma,
                                       mesh)


def spacetime_distributions_pod(surface, species, grid, df_data, cfg: Config,
                                mesh: Mesh | None = None) -> dict:
    """Pod-mode dN/dX from the full surface (VH df 1-4 or VAH mode 2/3)."""
    from ..kernels.dndx import dndx_cols
    if mesh is None:
        mesh = global_mesh(axis=cfg.mesh_axis)
    cols = dndx_cols(surface, cfg)
    if cfg.mode in (2, 3):
        # full columns on every process -> identical decision everywhere
        from ..kernels.vah import effective_vah_cfg
        cfg = effective_vah_cfg(cols, cfg)
    n_global = int(cols["tau"].shape[0])
    if cfg.df_mode in (3, 4) and cfg.mode not in (2, 3):
        return feqmod_spacetime_distributions_multihost(
            _slice_for(cols, n_global, cfg, mesh), n_global, species, grid,
            df_data, cfg, mesh=mesh)
    return spacetime_distributions_multihost(
        _slice_for(cols, n_global, cfg, mesh), n_global, species, grid,
        df_data, cfg, mesh)
