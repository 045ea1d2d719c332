"""Probe: how much of the dN/dX kernel's gap to the structural per-cell
optimum (~65% of spectra rate, probe_dndx_reduce.py) is the (tau, r)
histogram scatter-adds vs the emission+reduce itself?

Variants timed on the production shape (320 species, 32x24x48):
  full     -- the production _dndx_jit (3 scatter-adds per chunk)
  noscat   -- same body, histogram scatters skipped (dNdy/dydeta only)
  onehot   -- scatters replaced by one-hot matmuls (pt @ onehot(C, bins)),
              an MXU-friendly formulation of the same binning

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/probe_dndx_scatter.py

RESULT (one v5e chip, 2026-08-20): full 50.2 Geval/s == noscat 50.2 --
the scatter-adds are completely hidden; the df1 dN/dX rate is the
per-cell lane-reduce structural cost itself (probe_dndx_reduce.py), and
the production bench's 45.7 is this plus group-dispatch/finalize
overhead.  The one-hot variant is moot (its MXU passes also cost ~7e-4
relative on the histograms).  Question closed; do not re-chase.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.common import (prepare_cells, pad_and_chunk,
                                     effective_chunk, carry_seed_zero)
from is3d_tpu.kernels.smooth import _chunk_contribution
from is3d_tpu.kernels.dndx import _cell_dNdy, _dndx_jit, dndx_cols
from is3d_tpu.testing import (synthetic_species, synthetic_surface,
                              synthetic_deltaf_data)

N = 32768
CFG = Config(dimension=2, df_mode=1, include_shear_deltaf=1,
             include_bulk_deltaf=1, include_baryondiff_deltaf=0,
             regulate_deltaf=1, outflow=1, cell_chunk=65536,
             precision="f32")


@partial(jax.jit, static_argnames=("cfg", "variant"))
def _probe_jit(cols, species, grid, df_data, cfg, variant):
    per_cell = species.n_species * grid.n_pT * grid.n_phi * grid.n_eta
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    chunked, mask, _ = pad_and_chunk(cols, chunk)
    S = species.n_species
    R = grid.n_eta
    dtype = cols["tau"].dtype
    dtau = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    dr = (cfg.r_max - cfg.r_min) / cfg.r_bins
    vz = carry_seed_zero(cols)
    acc0 = dict(
        tau_hist=jnp.zeros((S, cfg.tau_bins), dtype) + vz,
        r_hist=jnp.zeros((S, cfg.r_bins), dtype) + vz,
        taur_hist=jnp.zeros((S, cfg.tau_bins, cfg.r_bins), dtype) + vz,
        dydeta=jnp.zeros((S, R), dtype) + vz,
        dNdy=jnp.zeros((S,), dtype) + vz,
    )

    def body(acc, inp):
        chunk_cols, m = inp
        c = prepare_cells(chunk_cols, cfg, df_data)
        contrib = _chunk_contribution(c, m, species, grid, cfg, reduce=False)
        per_cell_v, dydeta = _cell_dNdy(contrib, species, grid, cfg)
        acc = dict(acc)
        acc["dydeta"] = acc["dydeta"] + dydeta
        acc["dNdy"] = acc["dNdy"] + jnp.sum(per_cell_v, axis=0)
        if variant == "noscat":
            return acc, None
        tau = c["tau"]
        r = jnp.sqrt(c["x"] ** 2 + c["y"] ** 2)
        itau = jnp.floor((tau - cfg.tau_min) / dtau).astype(jnp.int32)
        ir = jnp.floor((r - cfg.r_min) / dr).astype(jnp.int32)
        tau_ok = (itau >= 0) & (itau < cfg.tau_bins)
        r_ok = (ir >= 0) & (ir < cfg.r_bins)
        itau_c = jnp.clip(itau, 0, cfg.tau_bins - 1)
        ir_c = jnp.clip(ir, 0, cfg.r_bins - 1)
        pt = per_cell_v.T                                 # (S, C)
        if variant == "onehot":
            # one-hot matmuls on the MXU instead of scatter-adds
            C = tau.shape[0]
            oh_t = ((itau_c[:, None]
                     == jnp.arange(cfg.tau_bins)[None, :])
                    & tau_ok[:, None]).astype(dtype)      # (C, T)
            oh_r = ((ir_c[:, None] == jnp.arange(cfg.r_bins)[None, :])
                    & r_ok[:, None]).astype(dtype)        # (C, Rb)
            acc["tau_hist"] = acc["tau_hist"] + jnp.dot(
                pt, oh_t, preferred_element_type=dtype)
            acc["r_hist"] = acc["r_hist"] + jnp.dot(
                pt, oh_r, preferred_element_type=dtype)
            # joint (tau, r) bin: scatter stays (the one-hot would be
            # (C, 7200)); measure whether the two 1-D matmuls already
            # close the gap
            acc["taur_hist"] = acc["taur_hist"].at[:, itau_c, ir_c].add(
                pt * (tau_ok & r_ok)[None, :])
        else:
            acc["tau_hist"] = acc["tau_hist"].at[:, itau_c].add(
                pt * tau_ok[None, :])
            acc["r_hist"] = acc["r_hist"].at[:, ir_c].add(
                pt * r_ok[None, :])
            acc["taur_hist"] = acc["taur_hist"].at[:, itau_c, ir_c].add(
                pt * (tau_ok & r_ok)[None, :])
        return acc, None

    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def main():
    dtype = jnp.float32
    sp = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype).replace(eta_mT_rescale=False)
    df = synthetic_deltaf_data(dtype=dtype)
    ev = N * 320 * 32 * 24 * 48

    ref = None
    for variant in ("full", "noscat", "onehot"):
        f = lambda c: _probe_jit(c, sp, grid, df, CFG, variant)
        surf0 = synthetic_surface(N, dimension=2, seed=0, dtype=dtype)
        cols0 = dndx_cols(surf0, CFG)
        out = jax.block_until_ready(f(cols0))
        if variant == "full":
            ref = {k: np.asarray(v) for k, v in out.items()}
        elif variant == "onehot":
            # the MXU matmuls run bf16-decomposed passes: ~7e-4 relative
            for k in ("tau_hist", "r_hist", "taur_hist", "dNdy"):
                np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                           rtol=5e-3, err_msg=k)
        dts = []
        for i in range(3):
            s = synthetic_surface(N, dimension=2, seed=100 + i, dtype=dtype)
            cols = dndx_cols(s, CFG)
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(cols))
            dts.append(time.perf_counter() - t0)
        print(f"{variant:8s} {ev / np.median(dts) / 1e9:5.1f} Geval/s")


if __name__ == "__main__":
    main()
