"""Smooth Cooper-Frye spectra: dN / (pT dpT dphi dy).

TPU-native re-derivation of the reference's hot loop
(emissionfunction_smooth_kernels.cpp:28-393 for linear df modes 1-2).

Design (instead of the reference's cell-parallel scalar loop):

* the (y - eta) kinematics are expressed through per-(cell, rapidity-node)
  cosh/sinh factors, so every per-point quantity (p.dsigma, u.p, pi:pp, V.p)
  is a broadcasted product of cell-side coefficient vectors and momentum-side
  monomials -- a fully fused (C x S x PT x PHI x R) elementwise block on the
  VPU with the cell reduction lowered by XLA;
* cells are processed in fixed-size chunks with a lax.scan carrying the
  (S, PT, PHI, Y) accumulator (the analog of FO_chunk + two-phase reduction,
  emissionfunction_smooth_kernels.cpp:37,102-389), giving deterministic
  reduction order and bounded memory;
* invalid (u.dsigma <= 0) cells and chunk padding are masked, not branched.

All control flow (df_mode, dimension, switches) is static via the frozen
Config, so one jit specialization per physics configuration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..units import CF_PREFACTOR
from ..config import Config
from ..data import SpeciesArrays
from ..io.tables import MomentumGrid
from ..io.deltaf import DeltafData
from .common import (surface_columns, prepare_cells, pad_and_chunk,
                     effective_chunk)


def _momentum_monomials(species: SpeciesArrays, grid: MomentumGrid):
    """Species/momentum-side factors shared by all kernels."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (S,P)
    px = grid.pT[:, None] * jnp.cos(grid.phi)[None, :]                 # (P,F)
    py = grid.pT[:, None] * jnp.sin(grid.phi)[None, :]                 # (P,F)
    return mT, px, py


def _rapidity_factors(c: dict, grid: MomentumGrid, dimension: int,
                      eta_scale=None):
    """cosh/sinh of (y - eta) per (cell, rapidity node).

    2+1D: y = 0, eta is the quadrature axis (optionally rescaled per cell by
    detA, the feqmod trick at emissionfunction_smooth_kernels.cpp:725-729).
    3+1D: y is the grid axis, eta is the per-cell surface value.
    Returns (ch, sh) with shape (C, R).
    """
    C = c["tau"].shape[0]
    if dimension == 2:
        delta = -grid.eta[None, :]                       # (1,R)
        if eta_scale is not None:
            delta = delta * eta_scale[:, None]           # (C,R)
        delta = jnp.broadcast_to(delta, (C, grid.n_eta))
    else:
        delta = grid.y[None, :] - c["eta"][:, None]      # (C,R)
    return jnp.cosh(delta), jnp.sinh(delta)


def _linear_df(cfg: Config, df, c, pdotu, pipp, Vp, mass2_b, baryon_b, feqbar):
    """Linear viscous correction, df modes 1 (Grad 14-moment) and
    2 (Chapman-Enskog) (reference: emissionfunction_smooth_kernels.cpp:214-242,
    299-326; formulas documented in SURVEY Appendix B)."""
    cc = lambda x: x[:, None, None, None, None]
    T = cc(c["T"])
    bulkPi = cc(c["bulkPi"])

    if cfg.df_mode == 1:
        shear_coeff = cc(0.5 / (c["T"] ** 2 * (c["E"] + c["P"])))
        bulk0 = cc(df.c0 - df.c2)
        bulk1 = cc(df.c1)
        bulk2 = cc(4.0 * df.c2 - df.c0)
        df_shear = shear_coeff * pipp
        df_bulk = (bulk0 * mass2_b + (bulk1 * baryon_b + bulk2 * pdotu) * pdotu) * bulkPi
        df_diff = (cc(df.c3) * baryon_b + cc(df.c4) * pdotu) * Vp
    elif cfg.df_mode == 2:
        shear_coeff = cc(0.5 / (df.betapi * c["T"]))
        bulk0 = cc(df.F / (c["T"] ** 2 * df.betabulk))
        bulk1 = cc(df.G / df.betabulk)
        bulk2 = cc(1.0 / (3.0 * c["T"] * df.betabulk))
        df_shear = shear_coeff * pipp / pdotu
        df_bulk = (bulk0 * pdotu + bulk1 * baryon_b
                   + bulk2 * (pdotu - mass2_b / pdotu)) * bulkPi
        df_diff = (cc(c["baryon_enthalpy_ratio"]) - baryon_b / pdotu) * Vp / cc(df.betaV)
    else:
        raise ValueError("linear df kernel supports df_mode 1 or 2")

    out = feqbar * (df_shear + df_bulk + df_diff)
    if cfg.regulate_deltaf:
        out = jnp.clip(out, -1.0, 1.0)
    return out


def _pointwise_contribution(c: dict, valid, species: SpeciesArrays,
                            grid: MomentumGrid, cfg: Config):
    """Masked p.dsigma * f at every (cell, species, pT, phi, rapidity-node)
    point: (C, S, PT, PHI, R).  No quadrature weights, no prefactor/degeneracy
    -- shared by the spectra reduction and the dN/dX spacetime kernel."""
    cc = lambda x: x[:, None, None, None, None]        # (C,) -> broadcast
    mT, px, py = _momentum_monomials(species, grid)
    mT_b = mT[None, :, :, None, None]
    px_b = px[None, None, :, :, None]
    py_b = py[None, None, :, :, None]

    ch, sh = _rapidity_factors(c, grid, cfg.dimension)
    ch_b = ch[:, None, None, None, :]
    sh_b = sh[:, None, None, None, :]

    pt = mT_b * ch_b            # p^tau
    taupn = mT_b * sh_b         # tau * p^eta

    tau = c["tau"]
    pds = (pt * cc(c["dat"]) + px_b * cc(c["dax"]) + py_b * cc(c["day"])
           + taupn * cc(c["dan"] / tau))                       # p.dsigma
    pdotu = (pt * cc(c["ut"]) - px_b * cc(c["ux"]) - py_b * cc(c["uy"])
             - taupn * cc(tau * c["un"]))                      # u.p

    sign_b = species.sign[None, :, None, None, None]
    baryon_b = species.baryon[None, :, None, None, None]
    mass2_b = (species.mass ** 2)[None, :, None, None, None]
    chem = baryon_b * cc(c["alphaB"])

    feq = 1.0 / (jnp.exp(pdotu / cc(c["T"]) - chem) + sign_b)
    feqbar = 1.0 - sign_b * feq

    # pi^munu p_mu p_nu with tau factors absorbed cell-side
    q3 = taupn
    Ptq = c["pitn"] * tau
    Pxq = c["pixn"] * tau
    Pyq = c["piyn"] * tau
    Pqq = c["pinn"] * tau * tau
    pipp = (cc(c["pitt"]) * pt * pt + cc(c["pixx"]) * px_b * px_b
            + cc(c["piyy"]) * py_b * py_b + cc(Pqq) * q3 * q3
            + 2.0 * (-(cc(c["pitx"]) * px_b + cc(c["pity"]) * py_b) * pt
                     + cc(c["pixy"]) * px_b * py_b
                     + q3 * (cc(Pxq) * px_b + cc(Pyq) * py_b - cc(Ptq) * pt)))

    Vp = (cc(c["Vt"]) * pt - cc(c["Vx"]) * px_b - cc(c["Vy"]) * py_b
          - cc(c["Vn"] * tau) * q3)                            # V.p

    df = _linear_df(cfg, c["df"], c, pdotu, pipp, Vp, mass2_b, baryon_b, feqbar)
    f = feq * (1.0 + df)

    contrib = pds * f
    if cfg.outflow:
        contrib = jnp.where(pds > 0.0, contrib, 0.0)

    mask = (valid & c["valid"]).astype(contrib.dtype)
    return contrib * cc(mask)


def _chunk_contribution(c: dict, valid, species: SpeciesArrays,
                        grid: MomentumGrid, cfg: Config):
    """Spectra contribution of one cell chunk: (S, PT, PHI, Y_out)."""
    contrib = _pointwise_contribution(c, valid, species, grid, cfg)
    if cfg.dimension == 2:
        # weighted eta quadrature collapses R -> 1
        contrib = contrib * grid.eta_weight[None, None, None, None, :]
        out = jnp.sum(contrib, axis=(0, 4), keepdims=False)[..., None]
    else:
        out = jnp.sum(contrib, axis=0)

    deg = species.degeneracy[:, None, None, None]
    return CF_PREFACTOR * deg * out


@partial(jax.jit, static_argnames=("cfg",))
def _smooth_spectra_jit(cols, species, grid, df_data, cfg: Config):
    per_cell = species.n_species * grid.n_pT * grid.n_phi * grid.n_eta * \
        (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    chunked, mask, n_chunks = pad_and_chunk(cols, chunk)
    n_y_out = 1 if cfg.dimension == 2 else grid.n_y
    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit
    acc0 = jnp.zeros((species.n_species, grid.n_pT, grid.n_phi, n_y_out),
                     dtype=cols["tau"].dtype) + 0.0 * cols["tau"].ravel()[0]

    def body(acc, inp):
        chunk_cols, m = inp
        cells = prepare_cells(chunk_cols, cfg, df_data)
        return acc + _chunk_contribution(cells, m, species, grid, cfg), None

    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def smooth_spectra(surface, species: SpeciesArrays, grid: MomentumGrid,
                   df_data: DeltafData, cfg: Config) -> jnp.ndarray:
    """dN/(pT dpT dphi dy) with linear df (modes 1-2), shape
    (S, n_pT, n_phi, n_y_out)."""
    if cfg.df_mode not in (1, 2):
        raise ValueError("smooth_spectra handles df modes 1-2; use "
                         "smooth_spectra_feqmod for modes 3-4")
    cols = surface_columns(surface, cfg)
    return _smooth_spectra_jit(cols, species, grid, df_data, cfg)
