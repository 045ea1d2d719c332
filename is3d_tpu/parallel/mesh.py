"""Multi-chip execution: shard the cell axis over a device mesh.

The reference's entire parallelism story is OpenMP threads over surface cells
plus independent sampler processes (SURVEY.md section 2, parallelism
inventory).  The TPU-native equivalent implemented here:

* the freeze-out surface (the only large input) is sharded along the cell
  axis across the mesh; species/momentum tables and coefficient splines are
  replicated,
* each device reduces its cell shard with the ordinary chunked kernel,
* the reduced accumulators -- the (S, PT, PHI, Y) spectra, the dN/dX
  histograms, or the polarization sums -- are summed over ICI with a psum
  inside shard_map.

This covers every cell-parallel kernel the reference OpenMP-parallelizes:
smooth spectra (linear df + feqmod, emissionfunction_smooth_kernels.cpp:106,
490), the dN/dX spacetime distributions (:1000-2135), the VAH spectra
kernel (:2206), and the spin-polarization kernel
(emissionfunction_polzn_kernels.cpp:105,220).  The Monte-Carlo sampler's
multi-chip path lives in kernels/sample.py (sample_particles_sharded).

Bit-stability across shardings (the BASELINE.md north star): the cell
reduction is performed over a CANONICAL GROUP TREE that is a function of the
global surface size and config only -- never of the device count.  The padded
cell axis is cut into G = Config.reduce_groups groups at global boundaries;
each group is reduced by the ordinary sequential chunk scan (identical chunk
boundaries for every sharding, because the group size is global), and the G
group partials are combined by a SEQUENTIAL left fold in global group order
(elementwise adds -- value-deterministic, never a reduction whose order the
compiler picks).  A mesh only changes WHERE group partials are computed:
each device scans its own contiguous groups, the partial stack is
re-assembled in global group order, and the same fold runs.  Device counts
that do not divide G append empty pad groups whose exact +0.0 partials
leave the fold bits unchanged, so EVERY device count produces
BIT-IDENTICAL results for EVERY cell-reduced kernel -- smooth, feqmod,
VAH, dN/dX, and polzn -- asserted exactly for 1-8 devices (divisors and
non-divisors of G), 2+1D and 3+1D, in tests/test_parallel_observables.py.

One codegen subtlety: the multi-output binned kernels (dN/dX, polzn)
compile to ulp-different instruction schedules inside a lax.scan loop than
standalone, so their call sites pass unroll_groups=True (per-group calls
inlined in the mesh body); the single-output spectra kernels bit-match
under the scan and keep it for bounded compile time.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..kernels import smooth as _smooth
from ..kernels import feqmod as _feqmod


def default_mesh(n_devices: int | None = None, axis: str = "cells") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


from ..kernels.common import PAD_ONE_COLUMNS as _PAD_ONE


def _pad_cols_to(cols: dict, n_target: int) -> tuple[dict, int]:
    n = cols["tau"].shape[0]
    pad = n_target - n
    if pad == 0:
        return cols, n
    out = {}
    for k, v in cols.items():
        fill = 1.0 if k in _PAD_ONE else 0.0
        out[k] = jnp.concatenate([v, jnp.full((pad,), fill, dtype=v.dtype)])
    return out, n


def canonical_groups(cfg: Config, n_cells: int) -> tuple[int, int]:
    """(G, group_size) of the canonical reduction tree -- a function of the
    GLOBAL cell count and config only, never of the device count.  G is
    raised in multiples of reduce_groups so a group never exceeds the
    cell_slab dispatch bound."""
    # cap G at the cell count: tiny surfaces must not pay G x the work in
    # padded groups (the 1-cell toy surface would otherwise run the whole
    # momentum block 8 times); still a function of global n only, and
    # meshes wider than G append empty groups whose exact +0.0 partials
    # leave the fold bits unchanged
    G = max(1, min(cfg.reduce_groups, n_cells))
    G *= max(1, -(-n_cells // (G * cfg.cell_slab)))
    return G, -(-max(n_cells, 1) // G)


def _tree_fold(stacked):
    """Sequential left fold of a stacked pytree over its leading axis:
    zeros + x_0 + x_1 + ... in index order.  Elementwise adds only, so the
    result is a value-deterministic function of the partials (IEEE addition
    has no compiler-chosen order to vary)."""
    # seed the carry from the data so its varying-manual-axes type matches
    # under shard_map as well as plain jit; nan_to_num first so a non-finite
    # first partial element (one overflowed bin) cannot turn the seed into
    # NaN and poison the ENTIRE accumulator (0.0 * finite == exact +0.0)
    zero = jax.tree.map(
        lambda x: jnp.zeros(x.shape[1:], x.dtype)
        + 0.0 * jnp.nan_to_num(x.reshape(-1)[0], nan=0.0, posinf=0.0,
                               neginf=0.0),
        stacked)
    acc, _ = jax.lax.scan(
        lambda a, p: (jax.tree.map(jnp.add, a, p), None), zero, stacked)
    return acc


_tree_fold_jit = jax.jit(_tree_fold)


def _pad_inert(cols: dict, n_target: int) -> dict:
    """Pad cell columns to n_target with inert cells: dsigma = 0 so
    u.dsigma = 0 and every kernel's contribution vanishes identically
    (validity is owned here, not by the kernel)."""
    cols, n_valid = _pad_cols_to(cols, n_target)
    if n_valid != n_target:
        pad_mask = (jnp.arange(n_target) < n_valid).astype(cols["tau"].dtype)
        for k in ("dat", "dax", "day", "dan"):
            cols[k] = cols[k] * pad_mask
    return cols


def grouped_cell_reduce(kernel_fn, cols: dict, replicated: tuple,
                        cfg: Config, mesh: Mesh | None = None,
                        unroll_groups: bool = False):
    """Reduce ``kernel_fn(cols_group, *replicated)`` (a pytree of
    accumulators) over the cell axis through the canonical group tree
    (module docstring).  With ``mesh``, groups are computed shard-locally
    and the partial stack is all-gathered over ICI before the fold; the
    combine tree -- and hence every output bit -- is identical for any
    device count dividing the group count.

    Without a mesh, groups are dispatched one device call at a time (the
    successor of the cell_slab splitting: bounds single-call runtime and
    gives progress points) and folded on the host in the same order.

    unroll_groups: inline the per-group kernel calls in the mesh body
    instead of lax.scan-ning them.  The multi-output binned kernels
    (dN/dX, polzn) compile to ulp-different instruction schedules inside
    a scan loop than standalone; unrolling restores bit-identity with the
    single-device path at the cost of ~groups-per-device x compile time
    (bounded: <= reduce_groups / n_dev copies).  The single-output
    spectra kernels don't need it (scan already bit-matches).
    """
    axis = cfg.mesh_axis
    n = cols["tau"].shape[0]
    G, gs = canonical_groups(cfg, n)

    if mesh is not None and mesh.shape[axis] == 1:
        # a 1-device mesh shards nothing; use the dispatch-per-group path
        # (on a degenerate mesh XLA fuses across the absent collective
        # boundary and contracts the feqmod kernel's fmas differently --
        # measured 1-ulp drift -- so don't compile that variant at all)
        mesh = None

    if mesh is None:
        cols = _pad_inert(cols, G * gs)
        acc = None
        for g in range(G):
            sub = {k: v[g * gs:(g + 1) * gs] for k, v in cols.items()}
            part = kernel_fn(sub, *replicated)
            if acc is None:
                acc = jax.tree.map(lambda x: jnp.zeros_like(x) + x, part)
            else:
                acc = jax.tree.map(jnp.add, acc, part)
        return acc

    n_dev = mesh.shape[axis]
    G_pad = -(-G // n_dev) * n_dev       # whole empty groups when n_dev ∤ G
    cols = _pad_inert(cols, G_pad * gs)
    parts = _grouped_shard_run(kernel_fn, cols, replicated, cfg, mesh, gs,
                               unroll_groups)
    # the shard_map output stacks every device's group partials along the
    # leading axis in device (= global group) order; the sequential fold
    # over that axis is the device-count-independent combine
    return _tree_fold_jit(parts)


def _grouped_shard_run(kernel_fn, cols, replicated, cfg, mesh, gs: int,
                       unroll_groups: bool):
    """The shard_map body of grouped_cell_reduce: per-device group partials
    stacked along the leading axis in global group order.  ``cols`` must
    already be padded to a whole number of groups per device (and, on a
    multi-host mesh, be global arrays sharded P(axis) over the cell axis --
    parallel/multihost.py assembles those)."""
    axis = cfg.mesh_axis
    in_specs = ({k: P(axis) for k in cols},) + tuple(P() for _ in replicated)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(axis))
    def run(cols_shard, *reps):
        g_local = cols_shard["tau"].shape[0] // gs
        grouped = {k: v.reshape(g_local, gs) for k, v in cols_shard.items()}
        if unroll_groups:
            parts = [kernel_fn({k: v[g] for k, v in grouped.items()}, *reps)
                     for g in range(g_local)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
        def group_body(_, sub):
            # barrier-isolate the kernel from the scan machinery: without
            # it XLA fuses the group slicing / output stacking into the
            # kernel and contracts fmas differently than the standalone
            # per-group dispatch (measured ulp-level drift in the binned
            # dN/dX and polzn kernels at g_local > 1)
            sub = jax.lax.optimization_barrier(sub)
            return None, jax.lax.optimization_barrier(kernel_fn(sub, *reps))

        _, parts = jax.lax.scan(group_body, None, grouped)
        # block fusion between the kernel scan and the downstream fold: on
        # multi-device meshes the collective boundary does this naturally,
        # but on a 1-device mesh XLA would fuse across it and contract the
        # fold's adds differently (measured 1-ulp drift in feqmod)
        return jax.lax.optimization_barrier(parts)

    return run(cols, *replicated)


def sharded_cell_reduce(kernel_fn, cols: dict, replicated: tuple,
                        cfg: Config, mesh: Mesh):
    """Mesh-sharded canonical cell reduction (see grouped_cell_reduce)."""
    return grouped_cell_reduce(kernel_fn, cols, replicated, cfg, mesh)


def _laguerre_default():
    from ..io.tables import laguerre_device
    return laguerre_device()


def smooth_spectra_sharded(surface, species, grid, df_data, cfg: Config,
                           mesh: Mesh | None = None, laguerre=None):
    """Multi-chip smooth spectra: dispatches to the linear-df or feqmod kernel
    with the cell axis sharded over ``mesh`` and the result psum-reduced."""
    from ..kernels.common import surface_columns
    if mesh is None:
        mesh = default_mesh(axis=cfg.mesh_axis)
    cols = surface_columns(surface, cfg)

    if cfg.df_mode in (1, 2):
        kern = lambda c, s, g, d: _smooth._smooth_spectra_jit(c, s, g, d, cfg)
        return sharded_cell_reduce(kern, cols, (species, grid, df_data),
                                   cfg, mesh)
    if cfg.df_mode not in (3, 4):
        # same validation as the unsharded dispatch (kernels/smooth.py);
        # without it a mesh run would silently feed an out-of-range
        # df_mode to the feqmod kernel
        raise ValueError(f"df_mode must be 1-4, got {cfg.df_mode}")
    if laguerre is None:
        laguerre = _laguerre_default()
    return _feqmod._feqmod_spectra_dispatch(cols, species, grid, df_data,
                                            laguerre, cfg, mesh=mesh)
