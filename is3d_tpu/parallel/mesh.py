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

Because every device runs the identical chunk-scan reduction and the final
combine is a single deterministic psum tree, results are reproducible for a
fixed mesh shape; across different shard counts they agree to f.p. addition
order of the shard boundaries (measured <= 1e-12 relative in f64, see
tests/test_parallel_observables.py).
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


# columns that must pad with a physical (non-zero) value so kernels stay
# finite on inert pad cells; everything else pads with 0, and dsigma = 0
# makes the pad cell's contribution exactly zero
_PAD_ONE = ("tau", "T", "E", "P", "Lambda", "aL")


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


def sharded_cell_reduce(kernel_fn, cols: dict, replicated: tuple,
                        cfg: Config, mesh: Mesh):
    """Run ``kernel_fn(cols_shard, *replicated)`` with ``cols`` sharded along
    the cell axis of ``mesh`` and psum-reduce the (pytree) result over ICI.

    The cell count need not divide the mesh: the surface is padded with
    inert cells (dsigma = 0 so u.dsigma = 0 and every kernel's contribution
    vanishes identically).
    """
    axis = cfg.mesh_axis
    n_dev = mesh.shape[axis]
    n = cols["tau"].shape[0]
    per_dev = -(-n // n_dev)
    cols, n_valid = _pad_cols_to(cols, per_dev * n_dev)
    idx = jnp.arange(per_dev * n_dev)
    # fold the pad mask into dat/dax/day/dan = 0 => u.dsigma = 0 => cell
    # contributes exactly zero (validity is owned here, not by the kernel)
    pad_mask = (idx < n_valid).astype(cols["tau"].dtype)
    for k in ("dat", "dax", "day", "dan"):
        cols[k] = cols[k] * pad_mask

    in_specs = ({k: P(axis) for k in cols},) + tuple(P() for _ in replicated)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P())
    def run(cols_shard, *reps):
        local = kernel_fn(cols_shard, *reps)
        return jax.lax.psum(local, axis)

    return run(cols, *replicated)


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
    if laguerre is None:
        laguerre = _laguerre_default()
    kern = lambda c, s, g, d, lag: _feqmod._feqmod_spectra_jit(
        c, s, g, d, lag, cfg)
    return sharded_cell_reduce(kern, cols, (species, grid, df_data, laguerre),
                               cfg, mesh)
