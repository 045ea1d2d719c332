"""Thermal-vorticity spin polarization (MODE 5).

TPU-native re-derivation of calculate_spin_polzn (reference:
src/cpp/emissionfunction_polzn_kernels.cpp:27-265): per momentum point the
covariant polarization vector

    S_mu(p) = -(1 - sign f0) / (8 m) * 2 * eps_{mu nu rho sigma} p^nu w^{rho sigma}

is integrated over the surface with measure p.dsigma f0, normalized by
Snorm = int p.dsigma f0.  Same chunked lax.scan skeleton and lane-tiled
(C, R, S, M = PT*PHI) block layout as the spectra kernels, fused on the
VPU and reduced over cells.

Reference quirks handled deliberately:
* the reference indexes the vorticity arrays with the in-chunk index
  (``wtx_fo[icell]`` instead of ``icell_glb``, polzn_kernels.cpp:133-138) --
  an out-of-chunk indexing bug for surfaces > FO_chunk cells; we index
  correctly,
* f0 uses the surface-averaged temperature (QGP plasma), not per-cell T
  (:174-190); we follow that choice,
* the eta quadrature weight is eta_weight * delta_eta with uniform spacing
  assumed (:62, :103) -- matched exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..data import SpeciesArrays
from ..io.tables import MomentumGrid
from .common import (pad_and_chunk, effective_chunk, carry_seed_zero,
                     fermi_bose)
from .smooth import (_flat_monomials, _phi_broadcast, _block_delta,
                     _reduce_cells_3d)


def _chunk_polzn(c, valid, species, grid, cfg, T_avg):
    """Polarization contribution of one cell chunk, five reduced sums
    (St, Sx, Sy, Sn, Snorm) each (S, PT, PHI, Y_out).

    Layout: the elementwise block runs as (C, R, S, M = PT*PHI) -- full
    (sublane, lane) vector tiles, same relayout as the VH/VAH spectra
    kernels and for the same measured reason (an R-minor block leaves most
    of the 128 lanes idle).  Every epsilon-contraction term that is linear
    in (p^tau, p^eta) = (mT/1, mT/tau)(cosh, sinh)(Delta) is factored into
    a per-(cell, rapidity[, species, pT]) composite entering the block
    through one mT fma."""
    S, P, F = species.n_species, grid.n_pT, grid.n_phi
    M = P * F
    mT, mTf, pxf, pyf = _flat_monomials(species, grid)

    cb = lambda x: x[:, None, None, None]              # (C,)
    cm = lambda x: x[:, None, None, :]                 # (C,M)
    sb = lambda x: x[None, None, :, None]              # (S,)
    MT = mTf[None, None, :, :]

    # fold the validity mask into the per-cell dsigma fields: pds (and so
    # meas = pds * f0 * w) is exactly 0 on invalid / pad cells, replacing
    # a full-rank mask multiply per momentum point (bit-identical -- valid
    # cells multiply by 1.0, masked contributions were (finite) * 0 = 0)
    mask = (valid & c["valid"]).astype(c["tau"].dtype)
    c = dict(c)
    for k in ("dat", "dan", "dax", "day"):
        c[k] = c[k] * mask
    bb = lambda x: _phi_broadcast(x, F)

    tau = c["tau"]
    remap = cfg.dimension == 2 and grid.eta_mT_rescale
    if remap:
        # mT-adaptive eta-node remap (exact substitution, same trick as
        # the spectra kernels): S_mu(p) and Snorm are pT-differential, so
        # per-(species, pT) node positions are legitimate here (unlike
        # dN/dX's eta-differential outputs).  Like the spectra kernels the
        # nodes are recentered on the cell's longitudinal-flow rapidity
        # y_flow = atanh(tau u^eta / u^tau) -- without the shift the
        # narrowed span can miss a flow-shifted integrand peak at high pT.
        # Jacobian applied to the reduced output below (node positions are
        # cell-independent only through y_flow; the s(mT) scale is shared,
        # so the jacobian factors out of the cell sum).
        from .smooth import ETA_REMAP_T_REF
        T_REF = jnp.asarray(ETA_REMAP_T_REF, mT.dtype)
        s_sp = jnp.sqrt(T_REF / jnp.maximum(mT, T_REF))     # (S,P)
        from ..physics import lrf
        yfl = lrf.flow_rapidity(tau, c["ut"], c["un"])      # (C,)
        # Delta = y - eta_phys sampled at y_flow - s*eta_r: centered on the
        # integrand peak Delta* = +y_flow = atanh(tau u^eta / u^tau)
        delta = (yfl[:, None, None, None]
                 - s_sp[None, None, :, :] * grid.eta[None, :, None, None])
        s_flat = jnp.broadcast_to(s_sp[:, :, None], (S, P, F)).reshape(S, M)
    else:
        delta = _block_delta(c, grid, cfg.dimension)           # (C,R,1,1)
        s_flat = None
    ch = jnp.cosh(delta)
    sh = jnp.sinh(delta)

    c_ = cb
    # p^eta (not tau p^eta) contracts the vorticity: sh_t = sh / tau
    sh_t = sh * c_(1.0 / tau)

    # --- composites (coefficients of mT) and transverse composites (C, M)
    inv_T = 1.0 / T_avg
    A1 = ch * c_(c["dat"]) + sh_t * c_(c["dan"])               # p.dsigma
    B1 = (ch * c_(c["ut"]) - sh * c_(tau * c["un"])) * inv_T   # u.p / T
    W1 = c["dax"][:, None] * pxf[None] + c["day"][:, None] * pyf[None]
    W2 = ((c["ux"] * inv_T)[:, None] * pxf[None]
          + (c["uy"] * inv_T)[:, None] * pyf[None])
    # epsilon-contraction composites: S_mu = pref * (mT * s1_mu + s2_mu)
    st1 = c_(c["wxy"]) * sh_t
    sx1 = c_(c["wyn"]) * ch + c_(c["wty"]) * sh_t
    sy1 = -(c_(c["wxn"]) * ch + c_(c["wtx"]) * sh_t)
    sn1 = c_(c["wxy"]) * ch
    st2 = -c["wxn"][:, None] * pyf[None] + c["wyn"][:, None] * pxf[None]
    sx2 = -c["wtn"][:, None] * pyf[None]
    sy2 = c["wtn"][:, None] * pxf[None]
    sn2 = c["wtx"][:, None] * pyf[None] - c["wty"][:, None] * pxf[None]

    sign_b = sb(species.sign)

    # --- full-rank block (C, R, S, M)
    pds = MT * bb(A1) + cm(W1)
    # NaN-free derivative under AD, bit-identical forward: see common.py
    f0 = fermi_bose(MT * bb(B1) - cm(W2), sign_b)
    pref = (-0.25 / sb(species.mass)) * (1.0 - sign_b * f0)

    if cfg.dimension == 2:
        if remap:
            # clean quadrature weight; the s(mT) substitution jacobian is
            # applied to the reduced (S, M) output (the raw S_mu/Snorm
            # sums rescale together; normalized outputs are identical up
            # to quadrature accuracy)
            w = grid.eta_weight[None, :, None, None]
        else:
            # eta_weight * delta_eta with uniform spacing assumed
            # (reference quirk, :62-71; divides out in S_mu/Snorm)
            eta = grid.eta
            d_eta = (eta[1] - eta[0]) if eta.shape[0] > 1 else 1.0
            w = (grid.eta_weight * d_eta)[None, :, None, None]
        meas = pds * f0 * w

        def red(a):
            out = jnp.sum(a, axis=(0, 1))              # (S,M)
            if remap:
                out = out * s_flat
            return out.reshape(S, P, F, 1)
    else:
        meas = pds * f0

        def red(a):
            return _reduce_cells_3d(a, S, P, F, grid.n_y)

    mp = meas * pref
    St = mp * (MT * bb(st1) + cm(st2))
    Sx = mp * (MT * bb(sx1) + cm(sx2))
    Sy = mp * (MT * bb(sy1) + cm(sy2))
    Sn = mp * (MT * bb(sn1) + cm(sn2))
    return red(St), red(Sx), red(Sy), red(Sn), red(meas)


@partial(jax.jit, static_argnames=("cfg",))
def _polzn_jit(cols, species, grid, T_avg, cfg: Config):
    per_cell = 5 * species.n_species * grid.n_pT * grid.n_phi * grid.n_eta * \
        (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    chunked, mask, _ = pad_and_chunk(cols, chunk)
    n_y_out = 1 if cfg.dimension == 2 else grid.n_y
    shape = (species.n_species, grid.n_pT, grid.n_phi, n_y_out)
    dtype = cols["tau"].dtype
    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit
    vz = carry_seed_zero(cols)
    acc0 = tuple(jnp.zeros(shape, dtype) + vz for _ in range(5))

    def body(acc, inp):
        chunk_cols, m = inp
        c = dict(chunk_cols)
        from ..physics import lrf
        c["ut"] = lrf.u_tau(c["ux"], c["uy"], c["un"], c["tau"])
        # u.dsigma > 0 cell filter is NOT applied by the reference polzn
        # kernel (:120-141 has no udsigma skip); keep all cells
        c["valid"] = jnp.ones_like(c["tau"], dtype=bool)
        out = _chunk_polzn(c, m, species, grid, cfg, T_avg)
        return tuple(a + o for a, o in zip(acc, out)), None

    if cfg.remat_scan:
        body = jax.checkpoint(body)
    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def spin_polarization(surface, species: SpeciesArrays, grid: MomentumGrid,
                      cfg: Config, plasma, mesh=None) -> dict:
    """Returns dict with St, Sx, Sy, Sn (unnormalized sums), Snorm, and the
    normalized S{t,x,y,n}_over_Snorm arrays, each (S, PT, PHI, Y_out).

    With ``mesh``, the cell axis is sharded over the device mesh and the
    five accumulators are psum-reduced over ICI (the reference
    OpenMP-parallelizes this kernel identically,
    emissionfunction_polzn_kernels.cpp:105,220)."""
    cols = polzn_cols(surface)
    T_avg = jnp.asarray(plasma.temperature, surface.tau.dtype)
    from ..parallel.mesh import grouped_cell_reduce
    kern = lambda c, s, g, t: _polzn_jit(c, s, g, t, cfg)
    sums = grouped_cell_reduce(
        kern, cols, (species, grid, T_avg), cfg, mesh, unroll_groups=True)
    return polzn_normalize(sums)


def polzn_cols(surface) -> dict:
    """Cell columns the polarization kernel reduces over (the multi-host
    path builds these per process slice, parallel/multihost.py)."""
    if surface.wtx is None:
        raise ValueError("spin polarization needs a mode-5 surface with "
                         "thermal vorticity components")
    cols = dict(
        tau=surface.tau, dat=surface.dat, dax=surface.dax, day=surface.day,
        dan=surface.dan, ux=surface.ux, uy=surface.uy, un=surface.un,
        wtx=surface.wtx, wty=surface.wty, wtn=surface.wtn,
        wxy=surface.wxy, wxn=surface.wxn, wyn=surface.wyn,
    )
    cols["eta"] = (surface.eta if surface.eta is not None
                   else jnp.zeros_like(surface.tau))
    return cols


def polzn_normalize(sums) -> dict:
    """(St, Sx, Sy, Sn, Snorm) accumulators -> the result dict with the
    normalized S/Snorm arrays (reference writes S*_over_Snorm files)."""
    St, Sx, Sy, Sn, Snorm = sums
    safe = jnp.where(Snorm == 0.0, 1.0, Snorm)
    return dict(St=St, Sx=Sx, Sy=Sy, Sn=Sn, Snorm=Snorm,
                St_over_Snorm=St / safe, Sx_over_Snorm=Sx / safe,
                Sy_over_Snorm=Sy / safe, Sn_over_Snorm=Sn / safe)
