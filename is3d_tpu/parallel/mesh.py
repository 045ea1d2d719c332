"""Multi-chip execution: shard the cell axis over a device mesh.

The reference's entire parallelism story is OpenMP threads over surface cells
plus independent sampler processes (SURVEY.md section 2, parallelism
inventory).  The TPU-native equivalent implemented here:

* the freeze-out surface (the only large input) is sharded along the cell
  axis across the mesh; species/momentum tables and coefficient splines are
  replicated,
* each device reduces its cell shard with the ordinary chunked kernel,
* the (S, PT, PHI, Y) spectra accumulator is summed over ICI with a psum
  inside shard_map.

Because every device runs the identical chunk-scan reduction and the final
combine is a single deterministic psum tree, results are bit-stable across
mesh shapes up to f.p. addition order of the shard boundaries.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from .. import data as _data
from ..kernels import smooth as _smooth
from ..kernels import feqmod as _feqmod
from ..kernels.common import surface_columns


def default_mesh(n_devices: int | None = None, axis: str = "cells") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _pad_cols_to(cols: dict, n_target: int) -> tuple[dict, int]:
    n = cols["tau"].shape[0]
    pad = n_target - n
    if pad == 0:
        return cols, n
    out = {}
    for k, v in cols.items():
        fill = 1.0 if k in ("tau", "T", "E", "P") else 0.0
        out[k] = jnp.concatenate([v, jnp.full((pad,), fill, dtype=v.dtype)])
    return out, n


def _sharded_call(kernel_fn, cols, species, grid, df_data, extra, cfg: Config,
                  mesh: Mesh):
    axis = cfg.mesh_axis
    n_dev = mesh.shape[axis]
    n = cols["tau"].shape[0]
    per_dev = -(-n // n_dev)
    cols, n_valid = _pad_cols_to(cols, per_dev * n_dev)
    # mask out the padding (validity is owned here, not by the kernel)
    idx = jnp.arange(per_dev * n_dev)
    # fold the pad mask into dat/dax/day/dan = 0 => u.dsigma = 0 => cell skipped
    pad_mask = (idx < n_valid).astype(cols["tau"].dtype)
    for k in ("dat", "dax", "day", "dan"):
        cols[k] = cols[k] * pad_mask

    in_specs = ({k: P(axis) for k in cols}, P(), P(), P(), P())
    out_specs = P()

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def run(cols_shard, species_r, grid_r, df_r, extra_r):
        local = kernel_fn(cols_shard, species_r, grid_r, df_r, extra_r, cfg)
        return jax.lax.psum(local, axis)

    return run(cols, species, grid, df_data, extra)


def smooth_spectra_sharded(surface, species, grid, df_data, cfg: Config,
                           mesh: Mesh | None = None, laguerre=None):
    """Multi-chip smooth spectra: dispatches to the linear-df or feqmod kernel
    with the cell axis sharded over ``mesh`` and the result psum-reduced."""
    if mesh is None:
        mesh = default_mesh(axis=cfg.mesh_axis)
    cols = surface_columns(surface, cfg)

    if cfg.df_mode in (1, 2):
        kern = lambda c, s, g, d, extra, cfg_: _smooth._smooth_spectra_jit(
            c, s, g, d, cfg_)
        extra = jnp.zeros(())
    else:
        if laguerre is None:
            from ..io.tables import gauss_laguerre
            raw = gauss_laguerre(32, alphas=(1, 2))
            laguerre = {a: (jnp.asarray(r), jnp.asarray(w))
                        for a, (r, w) in raw.items()}
        kern = lambda c, s, g, d, extra, cfg_: _feqmod._feqmod_spectra_jit(
            c, s, g, d, extra, cfg_)
        extra = laguerre

    return _sharded_call(kern, cols, species, grid, df_data, extra, cfg, mesh)
