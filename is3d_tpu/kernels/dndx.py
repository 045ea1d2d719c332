"""Smooth Cooper-Frye spacetime distributions (operation = 0):
dN/(tau dtau dy), dN/(2 pi r dr dy), dN/(2 pi tau r dtau dr dy), dN/dy/deta.

TPU-native re-derivation of calculate_dN_dX / calculate_dN_dX_feqmod
(reference: emissionfunction_smooth_kernels.cpp:1000-2135).  The reference
loops species x cells and histogram-bins each cell's momentum-integrated
dN/dy on the (tau, r) grid.  Here the identical pointwise emission function
(shared with the spectra kernels) is reduced over the momentum axes per
(cell, species), and the binning becomes a masked scatter-add inside the
same chunked lax.scan -- one pass over the surface for all species at once.

Outputs (per species s):
  dN_taudtaudy[s, itau]            normalized by (tau_mid * dtau)
  dN_twopirdrdy[s, ir]             normalized by (2 pi r_mid * dr)
  dN_twopitaurdtaudrdy[s, it, ir]  normalized by (2 pi tau r dtau dr)
  dN_dydeta[s, ieta]               eta-node differential dN/dy/deta
  dN_dy[s]                         total
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..units import CF_PREFACTOR
from ..config import Config
from ..data import SpeciesArrays
from ..io.tables import MomentumGrid
from ..io.deltaf import DeltafData
from .common import (surface_columns, prepare_cells, pad_and_chunk,
                     carry_seed_zero,
                     effective_chunk)
from .smooth import _chunk_contribution
from .feqmod import (_chunk_contribution_feqmod, _prepare_feqmod_cells,
                     routed_switch, feqmod_kernel_mode, _routing_sort)


def _cell_dNdy(contrib, species, grid, cfg):
    """Lane-tiled pointwise block (C, R, S, M = PT*PHI) -> per-cell
    momentum-integrated dN/dy (C, S) and the eta-node distribution
    contribution (S, R)."""
    # include the pT Jacobian (the reference's dN_dX momentum integral omits
    # it, :1372 -- same quirk as its write_dN_dy_toFile; see observables.dN_dy);
    # cfg.reference_compat_dndy reproduces the reference
    wp = (grid.pT_weight if cfg.reference_compat_dndy
          else grid.pT_weight * grid.pT)
    wM = (wp[:, None] * grid.phi_weight[None, :]).reshape(-1)
    t = jnp.einsum("crsm,m->crs", contrib, wM)
    # dN/dy/deta: no eta weight (reference divides it back out, :1366)
    dydeta = jnp.sum(t, axis=0).T                      # (S,R)
    if cfg.dimension == 2:
        per_cell = jnp.einsum("crs,r->cs", t, grid.eta_weight)
    else:
        # 3+1D: the reference sums the y grid without weights (:1312-1374,
        # boost-invariance is the stated scope of this kernel)
        per_cell = jnp.sum(t, axis=1)
    deg = species.degeneracy
    return (CF_PREFACTOR * per_cell * deg[None, :],
            CF_PREFACTOR * dydeta * deg[:, None])


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _dndx_jit(cols, species, grid, df_data, laguerre, cfg: Config,
              mode: str = "both"):
    factor = 4 if cfg.df_mode in (3, 4) and cfg.mode not in (2, 3) else 1
    per_cell = factor * species.n_species * grid.n_pT * grid.n_phi * \
        grid.n_eta * (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    if mode == "routed" and cols["tau"].shape[0] > chunk:
        # group-local clean/fallback ordering so the routed switch sees
        # mostly pure chunks (kernels/feqmod._routing_sort; the x/y
        # position columns ride the same permutation, so the (tau, r)
        # binning is untouched cell-for-cell)
        cols = _routing_sort(cols, df_data, laguerre, cfg)
    chunked, mask, _ = pad_and_chunk(cols, chunk)
    S = species.n_species
    R = grid.n_eta if cfg.dimension == 2 else grid.n_y
    dtype = cols["tau"].dtype

    tau_edges = (cfg.tau_min, cfg.tau_max, cfg.tau_bins)
    r_edges = (cfg.r_min, cfg.r_max, cfg.r_bins)
    dtau = (tau_edges[1] - tau_edges[0]) / tau_edges[2]
    dr = (r_edges[1] - r_edges[0]) / r_edges[2]

    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit
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
        if cfg.mode in (2, 3):
            # anisotropic-hydro surface: VAH emission function at fixed
            # eta nodes (a capability the reference lacks entirely -- its
            # VAH block is dead code and has no dN/dX path)
            from .vah import _chunk_vah_spectra, _complete_vah_cells
            c = _complete_vah_cells(chunk_cols)
            contrib = _chunk_vah_spectra(c, m, species, grid, cfg,
                                         reduce=False)
        elif cfg.df_mode in (3, 4):
            c = prepare_cells(chunk_cols, cfg, df_data)
            c = _prepare_feqmod_cells(c, species, laguerre, cfg)

            def reduced(b):
                # reduce INSIDE the routing switch so its output is the
                # small (C, S)/(S, R) pair, not the full-rank block
                contrib = _chunk_contribution_feqmod(
                    c, m, species, grid, cfg, reduce=False, branch=b)
                return _cell_dNdy(contrib, species, grid, cfg)

            if mode == "routed":
                per_cell, dydeta = routed_switch(c, m, reduced)
            else:
                per_cell, dydeta = reduced(mode)
        else:
            c = prepare_cells(chunk_cols, cfg, df_data)
            contrib = _chunk_contribution(c, m, species, grid, cfg,
                                          reduce=False)
        if cfg.df_mode not in (3, 4) or cfg.mode in (2, 3):
            per_cell, dydeta = _cell_dNdy(contrib, species, grid, cfg)

        tau = c["tau"]
        r = jnp.sqrt(c["x"] ** 2 + c["y"] ** 2)
        itau = jnp.floor((tau - tau_edges[0]) / dtau).astype(jnp.int32)
        ir = jnp.floor((r - r_edges[0]) / dr).astype(jnp.int32)
        tau_ok = (itau >= 0) & (itau < cfg.tau_bins)
        r_ok = (ir >= 0) & (ir < cfg.r_bins)
        itau_c = jnp.clip(itau, 0, cfg.tau_bins - 1)
        ir_c = jnp.clip(ir, 0, cfg.r_bins - 1)

        pt = per_cell.T                                 # (S, C)
        acc = dict(acc)
        acc["tau_hist"] = acc["tau_hist"].at[:, itau_c].add(
            pt * tau_ok[None, :])
        acc["r_hist"] = acc["r_hist"].at[:, ir_c].add(pt * r_ok[None, :])
        acc["taur_hist"] = acc["taur_hist"].at[:, itau_c, ir_c].add(
            pt * (tau_ok & r_ok)[None, :])
        acc["dydeta"] = acc["dydeta"] + dydeta
        acc["dNdy"] = acc["dNdy"] + jnp.sum(per_cell, axis=0)
        return acc, None

    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def spacetime_distributions(surface, species: SpeciesArrays,
                            grid: MomentumGrid, df_data: DeltafData,
                            cfg: Config, laguerre=None, mesh=None) -> dict:
    """Compute all dN/dX distributions.  Returns a dict of numpy arrays with
    bin midpoints and *normalized* distributions (reference file values,
    emissionfunction_smooth_kernels.cpp:1404-1432).

    With ``mesh``, the cell axis is sharded over the device mesh and the
    histogram accumulators are psum-reduced over ICI (the reference
    OpenMP-parallelizes this kernel the same way as the spectra loop,
    emissionfunction_smooth_kernels.cpp:1000-2135)."""
    cols = dndx_cols(surface, cfg)
    if cfg.mode in (2, 3):
        # provably-zero VAH residual-df chains structurally absent
        # (bit-identical; kernels/vah.effective_vah_cfg)
        from .vah import effective_vah_cfg
        cfg = effective_vah_cfg(cols, cfg)
    # dN/dX keeps fixed eta nodes: the dN/dy/deta output is reported AT the
    # common node positions, which an mT-adaptive per-species remap would
    # scramble (and these spacetime observables are low-pT dominated)
    grid = grid.replace(eta_mT_rescale=False)
    feq = cfg.df_mode in (3, 4) and cfg.mode not in (2, 3)
    dt = cols["tau"].dtype
    from ..io.tables import laguerre_in_precision
    lag = (laguerre_in_precision(laguerre, dt) if feq
           else jnp.zeros((), dt))
    from ..parallel.mesh import grouped_cell_reduce

    # in-kernel chunk routing (clean chunks skip the fallback chain,
    # all-breakdown chunks skip the feqmod chain; kernels/feqmod
    # .routed_switch) -- the routing depends on the surface alone, so
    # sharding stability is untouched
    mode = feqmod_kernel_mode(cfg, cols["tau"].shape[0]) if feq else "both"
    kern = lambda c, s, g, d, lg: _dndx_jit(c, s, g, d, lg, cfg, mode)
    acc = grouped_cell_reduce(kern, cols, (species, grid, df_data, lag),
                              cfg, mesh, unroll_groups=True)
    return dndx_finalize(acc, grid, cfg)


def dndx_cols(surface, cfg: Config) -> dict:
    """Cell columns the dN/dX kernel reduces over: the emission columns of
    the surface mode plus the (x, y) positions for the (tau, r) binning
    (the multi-host path builds these per process slice)."""
    if cfg.mode in (2, 3):
        from .vah import vah_surface_cols
        cols = vah_surface_cols(surface)
    else:
        cols = surface_columns(surface, cfg)
    cols["x"] = surface.x
    cols["y"] = surface.y
    return cols


def dndx_finalize(acc, grid: MomentumGrid, cfg: Config) -> dict:
    """Histogram accumulators -> normalized distributions + bin midpoints
    (reference file values, emissionfunction_smooth_kernels.cpp:1404-1432)."""
    acc = {k: np.asarray(v) for k, v in acc.items()}

    dtau = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    dr = (cfg.r_max - cfg.r_min) / cfg.r_bins
    tau_mid = cfg.tau_min + dtau * (np.arange(cfg.tau_bins) + 0.5)
    r_mid = cfg.r_min + dr * (np.arange(cfg.r_bins) + 0.5)

    eta = np.asarray(grid.eta if cfg.dimension == 2 else grid.y)
    return dict(
        tau_mid=tau_mid, r_mid=r_mid, eta=eta,
        dN_dy=acc["dNdy"],
        dN_dydeta=acc["dydeta"],
        dN_taudtaudy=acc["tau_hist"] / (tau_mid * dtau)[None, :],
        dN_twopirdrdy=acc["r_hist"] / (2.0 * np.pi * r_mid * dr)[None, :],
        dN_twopitaurdtaudrdy=acc["taur_hist"]
        / (2.0 * np.pi * tau_mid[:, None] * r_mid[None, :] * dtau * dr)[None],
        raw_tau_hist=acc["tau_hist"], raw_r_hist=acc["r_hist"],
    )
