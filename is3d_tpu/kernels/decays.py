"""Resonance decay feed-down on smooth spectra (2- and 3-body).

The reference's routine (src/cpp/emissionfunction_resonance_decays.cpp) is
hard-disabled (unconditional exit at :128-129, "need to change the linear
interpolation's MTmax ..."), so this module is a fresh implementation of the
documented algorithm (documentation/resonance decays/*.tex; Sollfrank et al. /
"fast resonance decays" formulation the reference follows):

For each unstable parent resonance R (heaviest -> lightest) and each decay
channel R -> 1 + 2 (+ 3), the daughter spectrum gains

  dN_1/(pT dpT dphi dy) += (mult . b . M) / (8 pi? . pstar)   [2-body]
      * int dv dzeta  J(v) MT dN_R/(dY MT dMT dPhi)|_(Y, MT, Phi solutions)

evaluated with 12-pt Gauss-Legendre in the parent rapidity variable
v (Y = y + v DeltaY) and in zeta (MT = MTbar + DeltaMT cos zeta), with the
parent spectrum log-bilinearly interpolated on its (MT, Phip) grid and
exponentially extrapolated exp(c + s MT) beyond the grid.  The 3-body case
adds an outer 12-pt integral over the invariant mass squared s of the
(2,3) pair, normalized by the Q factor.  (Reference structure:
two_body_decay :296-815, three_body_decay :816-1412, interpolators
:1413-2030, MT tail fit :2032-2158, Q factor :99-121.)

All (pT, phi[, y], v, zeta[, s]) tensors are fixed-shape jnp einsum blocks --
one jit specialization per (dimension, n-body), reused for every channel.

TPU-first structure: the cascade is *levelized into waves*.  A parent must
decay after every heavier parent that feeds it (directly), and no later
than any heavier parent it feeds (width-shifted sub-threshold channels can
feed upward in mass; in the reference's mass-ordered sequential loop those
adds land after the heavy daughter already decayed).  Under these
constraints the full SMASH list collapses from 346 sequential parents to 5
waves; each wave stacks its parents' log-spectra into one (U, P, F, Y)
array and runs all channel-group integrals as a single vmapped dispatch
with a device-side segment-sum over target species.  The result is
bit-equivalent (up to f64 reduction order) to the sequential cascade
(test_wave_batching_matches_sequential_cascade).  On an accelerator the
waves run in float32 (smooth 12-pt quadratures; ~1e-5 relative agreement
with f64); on CPU float64.

Deliberate fixes of reference defects (beyond the disabling bug):
* the MT grid values where the parent spectrum is <= 0 are patched with the
  exponential tail fit before interpolation (the exact issue named in the
  disable message -- log(0) = -inf corrupting the bilinear stencil);
* Estar uses the *other* daughter's mass per group (the reference always uses
  particle_2's mass, :414-417, wrong when daughter 2 is the particle of
  interest of the group);
* the adjusted (width-shifted) masses used to open sub-threshold channels are
  used consistently in Estar/pstar (the reference adjusts, then reads the
  unadjusted table masses, which can make pstar = sqrt(negative) = NaN);
* cos(Phip_tilde) is clipped to [-1, 1] (the reference acos()'s values that
  exceed 1 by roundoff, :620-624 commented-out error);
* kinematically closed channels (sum of daughter masses above the parent
  mass that the width shift cannot open) are skipped instead of exiting.
"""

from __future__ import annotations

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .common import next_pow2 as _next_pow2

TWO_PI = 2.0 * math.pi
GAUSS_PTS = 12
_GL_X, _GL_W = np.polynomial.legendre.leggauss(GAUSS_PTS)
_Q_X, _Q_W = np.polynomial.legendre.leggauss(24)

MT_FIT_THRESHOLD2 = 2.73   # mT^2 > 2.73 M^2 for tail-fit points (ref :2063)


# ======================================================================
# parent-spectrum preparation (host, numpy)
# ======================================================================

def _tail_fit_and_patch(logdN, MT_grid, mT_min):
    """Per (phi[, y]) column: least-squares fit log dN = c + s MT on the
    relativistic, positive part; patch non-finite grid entries with the fit.

    logdN: (P, F, Y); MT_grid: (P,).  Returns (patched, const (F,Y), slope).
    """
    P, F, Y = logdN.shape
    finite = np.isfinite(logdN)                       # (P,F,Y)
    mt = MT_grid[:, None, None]

    # point selection, all columns at once: the relativistic finite points;
    # columns with < 2 of them fall back to the LAST TWO finite points
    # (all finite points when there are <= 2)
    primary = finite & (mt > mT_min)
    rank_from_end = np.cumsum(finite[::-1], axis=0)[::-1]   # 1 = last finite
    fallback = finite & (rank_from_end <= 2)
    sel = np.where(primary.sum(axis=0, keepdims=True) >= 2, primary, fallback)

    # closed-form masked least-squares line fit log dN = c + s MT
    # (equivalent to the normal equations of the former per-column lstsq)
    ylog = np.where(sel, logdN, 0.0)
    S0 = sel.sum(axis=0)
    S1 = (sel * mt).sum(axis=0)
    S2 = (sel * mt * mt).sum(axis=0)
    T0 = ylog.sum(axis=0)
    T1 = (ylog * mt).sum(axis=0)
    det = S0 * S2 - S1 * S1
    ok = (S0 >= 2) & (np.abs(det) > 0.0)
    safe_det = np.where(ok, det, 1.0)
    slope = np.where(ok, (S0 * T1 - S1 * T0) / safe_det, 0.0)
    const = np.where(ok, (T0 * S2 - T1 * S1) / safe_det, -745.0)

    patched = np.where(finite, logdN, const[None] + slope[None] * mt)
    return patched, const, slope


def _prepare_parent(parent_spectra, pT, mass_parent):
    """(P, F, Y) parent spectra -> (patched log, tail const/slope, MT grid)."""
    MT_grid = np.sqrt(pT ** 2 + mass_parent ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        logdN = np.where(parent_spectra > 0.0, np.log(
            np.where(parent_spectra > 0.0, parent_spectra, 1.0)), -np.inf)
    mT_min = MT_FIT_THRESHOLD2 ** 0.5 * mass_parent
    return (*_tail_fit_and_patch(logdN, MT_grid, mT_min), MT_grid)


def _prepare_parent_traced(parent_spectra, pT, mass_parent):
    """jnp twin of _prepare_parent + _tail_fit_and_patch for the
    differentiable cascade (resonance_feed_down_traced): identical math,
    traceable and AD-safe (the log and the masked least-squares fit use
    the double-where pattern, so zero-yield bins get gradient 0 and
    tail-patched bins differentiate through the fit coefficients)."""
    dtype = parent_spectra.dtype
    MT_grid = jnp.sqrt(jnp.asarray(pT, dtype) ** 2 + mass_parent ** 2)
    pos = parent_spectra > 0.0
    logdN = jnp.where(pos,
                      jnp.log(jnp.where(pos, parent_spectra, 1.0)),
                      -jnp.inf)
    mT_min = MT_FIT_THRESHOLD2 ** 0.5 * mass_parent

    finite = jnp.isfinite(logdN)                        # (P,F,Y)
    mt = MT_grid[:, None, None]
    primary = finite & (mt > mT_min)
    rank_from_end = jnp.cumsum(finite[::-1].astype(jnp.int32),
                               axis=0)[::-1]
    fallback = finite & (rank_from_end <= 2)
    sel = jnp.where(primary.sum(axis=0, keepdims=True) >= 2,
                    primary, fallback)
    self_f = sel.astype(dtype)
    ylog = jnp.where(sel, logdN, 0.0)
    S0 = self_f.sum(axis=0)
    S1 = (self_f * mt).sum(axis=0)
    S2 = (self_f * mt * mt).sum(axis=0)
    T0 = ylog.sum(axis=0)
    T1 = (ylog * mt).sum(axis=0)
    det = S0 * S2 - S1 * S1
    ok = (S0 >= 2) & (jnp.abs(det) > 0.0)
    safe_det = jnp.where(ok, det, 1.0)
    slope = jnp.where(ok, (S0 * T1 - S1 * T0) / safe_det, 0.0)
    const = jnp.where(ok, (T0 * S2 - T1 * S1) / safe_det, -745.0)
    patched = jnp.where(finite, jnp.where(finite, logdN, 0.0),
                        const[None] + slope[None] * mt)
    return patched, const, slope


# ======================================================================
# parent-spectrum evaluation (jnp, inside jit)
# ======================================================================

def _hat_weights(grid, x):
    """(..., G) linear-interpolation hat weights on a sorted 1-D grid with
    linear extrapolation beyond both ends -- numerically identical to an
    index-clipped two-point stencil, but built from comparisons only so the
    downstream table lookup is a dense contraction instead of a gather
    (TPU gathers run near scalar speed; these feed the MXU/VPU).

    Node weights are built DIRECTLY at (..., G) from shifted (G,) grid
    vectors and an iota node mask -- no (..., G-1) interval tensors and no
    query-sized concatenates.  The earlier concat formulation materialized
    (..., 1) edge columns whose forced layouts pad 128x on TPU (1.7 GB
    temps per 13.5 MB of data at production reverse-pass scale); this form
    has only (..., G) elementwise tensors.  t-expressions are identical
    operand-for-operand, so the weights are bit-identical."""
    G = grid.shape[0]
    k = jnp.arange(G)
    # interval-k quantities evaluated AT node k (A: falling side 1 - t_k)
    # and at node k+1 via the k-1 shift (B: rising side t_{k-1})
    gnext = jnp.concatenate([grid[1:], grid[-1:] + 1.0])     # sentinel
    gprev = jnp.concatenate([grid[:1] - 1.0, grid[:-1]])     # sentinel
    xe = x[..., None]
    below = (x < grid[0])[..., None]
    above = (x >= grid[-1])[..., None]

    tA = (xe - grid) / (gnext - grid)          # t_k at node k
    incA = ((xe >= grid) & (xe < gnext) & (k < G - 1)
            | (below & (k == 0)) | (above & (k == G - 2)))
    tB = (xe - gprev) / (grid - gprev)         # t_{k-1} at node k
    incB = ((xe >= gprev) & (xe < grid) & (k >= 1)
            | (below & (k == 1)) | (above & (k == G - 1)))
    return jnp.where(incA, 1.0 - tA, 0.0) + jnp.where(incB, tB, 0.0)


def _phi_hat_weights(phi_grid, Phip):
    """(..., F) wrap-around interpolation hat weights in Phip: interior
    cells are linear; outside [phi_0, phi_{F-1}] the angle interpolates
    between (phi_{F-1} - 2pi) and phi_0 (reference interpolator behavior).

    Direct (..., F) node-weight construction (shifted grid vectors + iota
    masks, no query-sized concatenates) for the same layout reason as
    _hat_weights; bit-identical weights."""
    F = phi_grid.shape[0]
    k = jnp.arange(F)
    gnext = jnp.concatenate([phi_grid[1:], phi_grid[-1:] + 1.0])
    gprev = jnp.concatenate([phi_grid[:1] - 1.0, phi_grid[:-1]])
    xe = Phip[..., None]
    inside = (Phip >= phi_grid[0]) & (Phip <= phi_grid[-1])
    # Phip exactly at the last node falls in the last interior cell (t=1)
    at_end = (Phip == phi_grid[-1])[..., None]

    tA = (xe - phi_grid) / (gnext - phi_grid)
    incA = ((xe >= phi_grid) & (xe < gnext) & (k < F - 1)
            | (at_end & (k == F - 2)))
    tB = (xe - gprev) / (phi_grid - gprev)
    incB = ((xe >= gprev) & (xe < phi_grid) & (k >= 1)
            | (at_end & (k == F - 1)))
    W = jnp.where(incA, 1.0 - tA, 0.0) + jnp.where(incB, tB, 0.0)

    # wrap cell: map the angle near 0 and interpolate (last node, first node)
    out = (~inside)[..., None]
    Phip_out = Phip - jnp.floor(Phip / math.pi) * TWO_PI
    tw = ((Phip_out - (phi_grid[-1] - TWO_PI))
          / (phi_grid[0] - (phi_grid[-1] - TWO_PI)))[..., None]
    return (W + jnp.where(out & (k == 0), tw, 0.0)
            + jnp.where(out & (k == F - 1), 1.0 - tw, 0.0))


def _eval_parent_2d_tmp(logdN, tc, ts, MT_grid, MT):
    """Shared first stage of the 2d hat evaluation: the MT hat contraction
    with the tail switch.  Returns (tmp (p,v,z,Fg), hatM, inside, MTq)."""
    MTq = MT[:, 0]                                      # (p, v, z)
    hatM = _hat_weights(MT_grid, MTq)                   # (p, v, z, Pg)
    tmp = jnp.einsum("pvzg,gf->pvzf", hatM, logdN)      # log dN at (MT, f)
    tail = tc + ts * MTq[..., None]                     # (p, v, z, Fg)
    inside = (MTq <= MT_grid[-1])[..., None]
    return jnp.where(inside, tmp, tail), hatM, inside, MTq


@jax.custom_vjp
def _eval_parent_2d_pair(logdN, tc, ts, MT_grid, phi_grid, MT, Phip1, Phip2):
    """Sum of exp(log dN) at (MT, Phip1) and (MT, Phip2), boost-invariant
    parent.  Gather-free: the bilinear log interpolation (with MT tail
    switch) is two hat-weight contractions; the MT stencil is shared by the
    two Phip solutions (reflection pairs, reference :620-660).
    logdN: (Pg, Fg); tc/ts: (Fg,); MT: (p, 1, v, z); Phip: (p, F, v, z).
    Returns (p, F, v, z).

    custom_vjp: the backward RECOMPUTES the hat-weight tensors instead of
    storing them as AD residuals -- the (p, F, v, z, grid) weights the
    forward fuses away were 39 GB at production scale on the full SMASH
    list (NOTES_ROUND3) and made jax.grad of decayed spectra OOM a 16 GB
    chip.  Saved residuals are the INPUTS only.  Gradients flow to
    (logdN, tc, ts); the kinematic queries (MT, Phip) and the grids are
    functions of particle masses and quadrature grids only -- never of
    the differentiated surface -- and get symbolic-zero cotangents."""
    tmp, _, _, _ = _eval_parent_2d_tmp(logdN, tc, ts, MT_grid, MT)

    def one(Phip):
        hatP = _phi_hat_weights(phi_grid, Phip)         # (p, F, v, z, Fg)
        return jnp.exp(jnp.einsum("pFvzf,pvzf->pFvz", hatP, tmp))

    return one(Phip1) + one(Phip2)


def _eval_parent_2d_pair_fwd(logdN, tc, ts, MT_grid, phi_grid,
                             MT, Phip1, Phip2):
    out = _eval_parent_2d_pair(logdN, tc, ts, MT_grid, phi_grid,
                               MT, Phip1, Phip2)
    return out, (logdN, tc, ts, MT_grid, phi_grid, MT, Phip1, Phip2)


def _eval_parent_2d_pair_bwd(res, g):
    logdN, tc, ts, MT_grid, phi_grid, MT, Phip1, Phip2 = res
    tmp, hatM, inside, MTq = _eval_parent_2d_tmp(logdN, tc, ts, MT_grid, MT)
    d_tmp = jnp.zeros_like(tmp)
    for Phip in (Phip1, Phip2):
        hatP = _phi_hat_weights(phi_grid, Phip)
        e = jnp.einsum("pFvzf,pvzf->pFvz", hatP, tmp)
        ge = g * jnp.exp(e)
        d_tmp = d_tmp + jnp.einsum("pFvz,pFvzf->pvzf", ge, hatP)
    d_in = jnp.where(inside, d_tmp, 0.0)
    d_tail = jnp.where(inside, 0.0, d_tmp)
    d_logdN = jnp.einsum("pvzg,pvzf->gf", hatM, d_in)
    d_tc = d_tail.sum(axis=(0, 1, 2))
    d_ts = (d_tail * MTq[..., None]).sum(axis=(0, 1, 2))
    z = jnp.zeros_like
    return (d_logdN, d_tc, d_ts, z(MT_grid), z(phi_grid), z(MT),
            z(Phip1), z(Phip2))


_eval_parent_2d_pair.defvjp(_eval_parent_2d_pair_fwd, _eval_parent_2d_pair_bwd)


def _eval_parent_3d_tmp(logdN, tc, ts, MT_grid, y_grid, MT, Y):
    """Shared first stages of the 3d hat evaluation: MT hat contraction
    with tail switch, then the Y hat contraction.
    Returns (tmp2 (p,NY,v,z,Fg), hatM, hatY, inside, MTq)."""
    MTq = MT[:, 0, 0]                                   # (p, v, z)
    hatM = _hat_weights(MT_grid, MTq)                   # (p, v, z, Pg)
    tmp = jnp.einsum("pvzg,gfy->pvzfy", hatM, logdN)    # (p, v, z, Fg, Yg)
    tail = tc + ts * MTq[..., None, None]               # (p, v, z, Fg, Yg)
    inside = (MTq <= MT_grid[-1])[..., None, None]
    tmp = jnp.where(inside, tmp, tail)

    Yq = Y[:, 0, :, :, 0]                               # (p, NY, v)
    hatY = _hat_weights(y_grid, Yq)                     # (p, NY, v, Yg)
    tmp2 = jnp.einsum("pvzfy,pYvy->pYvzf", tmp, hatY)   # (p, NY, v, z, Fg)
    return tmp2, hatM, hatY, inside, MTq


@jax.custom_vjp
def _eval_parent_3d_pair(logdN, tc, ts, MT_grid, phi_grid, y_grid,
                         MT, Phip1, Phip2, Y):
    """Sum of the trilinear (MT, Phip, Y) log interpolations at the two
    Phip solutions, exponentiated; zero outside |Y| > Ymax.  Gather-free
    hat-weight contractions; MT/Y stencils shared across the pair.
    logdN: (Pg, Fg, Yg); tc/ts: (Fg, Yg); MT: (p, 1, 1, v, z);
    Phip: (p, F, 1, v, z); Y: (p, 1, NY, v, 1).  Returns (p, F, NY, v, z).

    custom_vjp recomputing the hat weights in the backward -- see
    _eval_parent_2d_pair."""
    tmp2, _, _, _, _ = _eval_parent_3d_tmp(logdN, tc, ts, MT_grid, y_grid,
                                           MT, Y)

    def one(Phip):
        hatP = _phi_hat_weights(phi_grid, Phip[:, :, 0])  # (p, F, v, z, Fg)
        return jnp.exp(jnp.einsum("pFvzf,pYvzf->pFYvz", hatP, tmp2))

    out = one(Phip1) + one(Phip2)                       # (p, F, NY, v, z)
    return jnp.where(jnp.abs(Y) <= jnp.abs(y_grid[-1]), out, 0.0)


def _eval_parent_3d_pair_fwd(logdN, tc, ts, MT_grid, phi_grid, y_grid,
                             MT, Phip1, Phip2, Y):
    out = _eval_parent_3d_pair(logdN, tc, ts, MT_grid, phi_grid, y_grid,
                               MT, Phip1, Phip2, Y)
    return out, (logdN, tc, ts, MT_grid, phi_grid, y_grid, MT, Phip1,
                 Phip2, Y)


def _eval_parent_3d_pair_bwd(res, g):
    logdN, tc, ts, MT_grid, phi_grid, y_grid, MT, Phip1, Phip2, Y = res
    tmp2, hatM, hatY, inside, MTq = _eval_parent_3d_tmp(
        logdN, tc, ts, MT_grid, y_grid, MT, Y)
    g = jnp.where(jnp.abs(Y) <= jnp.abs(y_grid[-1]), g, 0.0)
    d_tmp2 = jnp.zeros_like(tmp2)
    for Phip in (Phip1, Phip2):
        hatP = _phi_hat_weights(phi_grid, Phip[:, :, 0])
        e = jnp.einsum("pFvzf,pYvzf->pFYvz", hatP, tmp2)
        ge = g * jnp.exp(e)
        d_tmp2 = d_tmp2 + jnp.einsum("pFYvz,pFvzf->pYvzf", ge, hatP)
    d_tmp1 = jnp.einsum("pYvzf,pYvy->pvzfy", d_tmp2, hatY)
    d_in = jnp.where(inside, d_tmp1, 0.0)
    d_tail = jnp.where(inside, 0.0, d_tmp1)
    d_logdN = jnp.einsum("pvzg,pvzfy->gfy", hatM, d_in)
    d_tc = d_tail.sum(axis=(0, 1, 2))
    d_ts = (d_tail * MTq[..., None, None]).sum(axis=(0, 1, 2))
    z = jnp.zeros_like
    return (d_logdN, d_tc, d_ts, z(MT_grid), z(phi_grid), z(y_grid),
            z(MT), z(Phip1), z(Phip2), z(Y))


_eval_parent_3d_pair.defvjp(_eval_parent_3d_pair_fwd, _eval_parent_3d_pair_bwd)


def _interp_phi_indices(phi_grid, Phip):
    """Wrap-around linear interpolation stencil in Phip.
    Returns (iL, iR, wL, wR)."""
    F = phi_grid.shape[0]
    inside = (Phip >= phi_grid[0]) & (Phip <= phi_grid[-1])
    iR_in = jnp.clip(jnp.searchsorted(phi_grid, Phip), 1, F - 1)
    iL_in = iR_in - 1
    # outside: between (phi[-1] - 2pi) and phi[0]; map angle near 0
    Phip_out = Phip - jnp.floor(Phip / math.pi) * TWO_PI
    phiL = jnp.where(inside, phi_grid[iL_in], phi_grid[-1] - TWO_PI)
    phiR = jnp.where(inside, phi_grid[iR_in], phi_grid[0])
    x = jnp.where(inside, Phip, Phip_out)
    iL = jnp.where(inside, iL_in, F - 1)
    iR = jnp.where(inside, iR_in, 0)
    t = (x - phiL) / (phiR - phiL)
    return iL, iR, 1.0 - t, t


def _eval_parent_2d_pair_gather(logdN, tc, ts, MT_grid, phi_grid,
                                MT, Phip1, Phip2):
    """Stencil-gather variant of _eval_parent_2d_pair (identical math).
    Preferred on CPU, where gathers are cheap and the dense hat
    contractions cost ~the grid size in extra flops per point."""
    P = MT_grid.shape[0]
    iMR = jnp.clip(jnp.searchsorted(MT_grid, MT), 1, P - 1)
    iML = iMR - 1
    tM = (MT - MT_grid[iML]) / (MT_grid[iMR] - MT_grid[iML])
    inside = MT <= MT_grid[-1]

    def one(Phip):
        iL, iR, wL, wR = _interp_phi_indices(phi_grid, Phip)
        bi = ((logdN[iML, iL] * wL + logdN[iML, iR] * wR) * (1.0 - tM)
              + (logdN[iMR, iL] * wL + logdN[iMR, iR] * wR) * tM)
        tail = (tc[iL] + ts[iL] * MT) * wL + (tc[iR] + ts[iR] * MT) * wR
        return jnp.exp(jnp.where(inside, bi, tail))

    return one(Phip1) + one(Phip2)


def _eval_parent_3d_pair_gather(logdN, tc, ts, MT_grid, phi_grid, y_grid,
                                MT, Phip1, Phip2, Y):
    """Stencil-gather variant of _eval_parent_3d_pair (identical math)."""
    NY = y_grid.shape[0]
    iYR = jnp.clip(jnp.searchsorted(y_grid, Y), 1, NY - 1)
    iYL = iYR - 1
    tY = (Y - y_grid[iYL]) / (y_grid[iYR] - y_grid[iYL])
    P = MT_grid.shape[0]
    iMR = jnp.clip(jnp.searchsorted(MT_grid, MT), 1, P - 1)
    iML = iMR - 1
    tM = (MT - MT_grid[iML]) / (MT_grid[iMR] - MT_grid[iML])
    inside = MT <= MT_grid[-1]

    def one(Phip):
        iL, iR, wL, wR = _interp_phi_indices(phi_grid, Phip)

        def eval_plane(iY):
            bi = ((logdN[iML, iL, iY] * wL + logdN[iML, iR, iY] * wR)
                  * (1.0 - tM)
                  + (logdN[iMR, iL, iY] * wL + logdN[iMR, iR, iY] * wR) * tM)
            tail = ((tc[iL, iY] + ts[iL, iY] * MT) * wL
                    + (tc[iR, iY] + ts[iR, iY] * MT) * wR)
            return jnp.where(inside, bi, tail)

        return jnp.exp(eval_plane(iYL) * (1.0 - tY) + eval_plane(iYR) * tY)

    out = one(Phip1) + one(Phip2)
    return jnp.where(jnp.abs(Y) <= jnp.abs(y_grid[-1]), out, 0.0)


# ======================================================================
# decay integrals (jit)
# ======================================================================

@jax.custom_jvp
def _arccos_clipped(x):
    """arccos(clip(x, -1, 1)) with an AD-safe derivative.

    The primal is EXACTLY the clip + arccos the kernel always computed
    (the reference acos()'s values that exceed 1 by roundoff; we clip).
    Under AD the chain d/dx arccos(clip(x)) is (-1/sqrt(1-x^2)) * 0 =
    inf * 0 = NaN wherever roundoff pushed |x| past 1; the custom
    derivative takes the correct one-sided subgradient 0 there instead
    (the differentiable cascade needs this -- same pattern as
    common.fermi_bose)."""
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@_arccos_clipped.defjvp
def _arccos_clipped_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xc = jnp.clip(x, -1.0, 1.0)
    inside = jnp.abs(x) < 1.0
    deriv = jnp.where(
        inside, -1.0 / jnp.sqrt(jnp.maximum(1.0 - xc * xc, 1e-30)), 0.0)
    return jnp.arccos(xc), deriv * dx


def _decay_kinematics(pT, mass2_1, Estar, pstar, mass_parent, dtype):
    """(P, V) tables shared by 2-/3-body: MTbar, DeltaMT, v weights, etc."""
    v = jnp.asarray(_GL_X, dtype)
    wv = jnp.asarray(_GL_W, dtype)
    pT2 = pT ** 2
    mT2 = pT2 + mass2_1
    mT = jnp.sqrt(mT2)
    Estar2 = Estar ** 2
    DeltaY = jnp.log((pstar + jnp.sqrt(Estar2 + pT2)) / mT)       # (P,)

    coshv = jnp.cosh(v[None, :] * DeltaY[:, None])                # (P,V)
    sinhv = jnp.sinh(v[None, :] * DeltaY[:, None])
    # cancellation-free identities (exact algebra):
    #   mT^2 cosh^2 - pT^2  == m1^2 + mT^2 sinh^2
    #   Estar^2 + pT^2 - mT^2 cosh^2 == pstar^2 - mT^2 sinh^2
    # The naive left-hand forms catastrophically cancel for MASSLESS
    # daughters (mT == pT exactly): in f32, cosh(x)^2 rounds to 1 for
    # small x*DeltaY, making denom 0 and MTbar/Phip inf/inf = NaN --
    # measured as NaN photon rows whenever the chosen list includes
    # mcid 22 (pre-existing production bug, found by the traced-cascade
    # parity bench).  sinh is accurate near 0, so the right-hand forms
    # are exact at mass 0 and strictly more accurate for every mass.
    mT2s2 = mT2[:, None] * sinhv ** 2
    denom = mass2_1 + mT2s2
    MTbar = Estar * mass_parent * mT[:, None] * coshv / denom
    DeltaMT = (mass_parent * pT[:, None]
               * jnp.sqrt(jnp.abs(pstar ** 2 - mT2s2)) / denom)
    mTcosh_over_pT = mT[:, None] * coshv / pT[:, None]
    vw = DeltaY[:, None] * wv[None, :] / jnp.sqrt(jnp.abs(denom))
    return MTbar, DeltaMT, mTcosh_over_pT, vw, DeltaY


def _parent_MT_Phip(pT, phi, MTbar, DeltaMT, mTcosh_over_pT, Estar,
                    mass_parent, dtype):
    """(P, F, V, Z) parent MT and the two Phip solutions."""
    x = jnp.asarray(_GL_X, dtype)
    coszeta = jnp.cos(0.5 * math.pi * (1.0 + x))                  # (Z,)
    MT = MTbar[:, :, None] + DeltaMT[:, :, None] * coszeta        # (P,V,Z)
    # 1e-30 (not 1e-300): must stay a normal number in float32 too
    PT = jnp.sqrt(jnp.maximum(MT ** 2 - mass_parent ** 2, 1e-30))
    Phip_t = _arccos_clipped(
        (MT * mTcosh_over_pT[:, :, None] - (Estar * mass_parent / pT)[:, None, None])
        / PT)                                                     # (P,V,Z)
    Phip1 = jnp.mod(Phip_t[:, None] + phi[None, :, None, None], TWO_PI)
    Phip2 = jnp.mod(-Phip_t[:, None] + phi[None, :, None, None], TWO_PI)
    return MT[:, None], Phip1, Phip2                              # (P,1|F,V,Z)


@partial(jax.jit, static_argnames=("dimension", "use_hat"))
def _two_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                       mass2_1, Estar, pstar, mass_parent, dimension: int,
                       use_hat: bool = False):
    """(P, F[, Y]) feed-down integral (without prefactor)."""
    dtype = logdN.dtype
    wz = jnp.asarray(_GL_W, dtype)
    MTbar, DeltaMT, mTc, vw, DeltaY = _decay_kinematics(
        pT, mass2_1, Estar, pstar, mass_parent, dtype)
    MT, Phip1, Phip2 = _parent_MT_Phip(pT, phi, MTbar, DeltaMT, mTc, Estar,
                                       mass_parent, dtype)
    if dimension == 2:
        eval2 = _eval_parent_2d_pair if use_hat else _eval_parent_2d_pair_gather
        dN = eval2(logdN[:, :, 0], tc[:, 0], ts[:, 0],
                   MT_grid, phi, MT, Phip1, Phip2)
        integrand = MT * dN                                       # (P,F,V,Z)
        zsum = jnp.einsum("pfvz,z->pfv", integrand, wz)
        out = jnp.einsum("pfv,pv->pf", zsum, vw)
        return out[:, :, None]
    else:
        v = jnp.asarray(_GL_X, dtype)
        Y = y_grid[None, None, :] + v[None, :, None] * DeltaY[:, None, None]
        # Y: (P, V, NY) -> (P, 1, NY, V, 1) to broadcast with (P, F, NY, V, Z)
        Yb = jnp.transpose(Y, (0, 2, 1))[:, None, :, :, None]
        MTb = MT[:, :, None]                                      # (P,1,1,V,Z)
        P1 = Phip1[:, :, None]
        P2 = Phip2[:, :, None]
        eval3 = _eval_parent_3d_pair if use_hat else _eval_parent_3d_pair_gather
        dN = eval3(logdN, tc, ts, MT_grid, phi, y_grid, MTb, P1, P2, Yb)
        integrand = MTb * dN                                      # (P,F,NY,V,Z)
        zsum = jnp.einsum("pfyvz,z->pfyv", integrand, wz)
        return jnp.einsum("pfyv,pv->pfy", zsum, vw)


@partial(jax.jit, static_argnames=("dimension", "use_hat"))
def _three_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                         mass2_1, mass_parent, s_minus, s_plus, d,
                         dimension: int, use_hat: bool = False):
    """Outer s-integral of the 2-body kernel (without prefactor)."""
    dtype = logdN.dtype
    x = jnp.asarray(_GL_X, dtype)
    w = jnp.asarray(_GL_W, dtype)
    s = s_minus + (s_plus - s_minus) * (1.0 + x) / 2.0            # (S,)
    Estar = (mass_parent ** 2 + mass2_1 - s) / (2.0 * mass_parent)
    pstar = jnp.sqrt(jnp.maximum(Estar ** 2 - mass2_1, 1e-30))
    sw = w * jnp.sqrt(jnp.abs((s - s_minus) * (s - d))) / s       # (S,)

    def per_s(args):
        Estar_k, pstar_k = args
        return _two_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                                  mass2_1, Estar_k, pstar_k, mass_parent,
                                  dimension, use_hat)

    outs = jax.lax.map(per_s, (Estar, pstar))                     # (S,P,F,Y)
    return jnp.einsum("spfy,s->pfy", outs, sw)


# ---- wave-batched wrappers: the decay cascade is levelized into "waves"
# (a parent joins wave w+1 only if a *heavier* processed parent feeds it);
# the full SMASH list collapses to 5 waves, so the whole feed-down runs in
# a handful of large vmapped dispatches with a device-side segment-sum.

@partial(jax.jit, static_argnames=("dimension", "n_seg", "use_hat"))
def _two_body_wave(logdN_all, tc_all, ts_all, parent_idx, seg_ids, prefs,
                   pT, phi, y_grid, MT_grids, m2s, Estars, pstars, Ms,
                   dimension: int, n_seg: int, use_hat: bool):
    """logdN_all: (U, P, F, Y) stacked parent spectra; per-task parent_idx
    selects the row.  Returns (n_seg, P, F, Y) feed-down accumulated by
    target species (seg_ids) on device."""
    def f(pi, MTg, m2, Es, ps, M):
        return _two_body_integral(logdN_all[pi], tc_all[pi], ts_all[pi],
                                  MTg, pT, phi, y_grid, m2, Es, ps, M,
                                  dimension, use_hat)

    outs = jax.vmap(f)(parent_idx, MT_grids, m2s, Estars, pstars, Ms)
    outs = outs * prefs[:, None, None, None]
    return jax.ops.segment_sum(outs, seg_ids, num_segments=n_seg)


@partial(jax.jit, static_argnames=("dimension", "n_seg", "use_hat"))
def _three_body_wave(logdN_all, tc_all, ts_all, parent_idx, seg_ids, prefs,
                     pT, phi, y_grid, MT_grids, m2s, Ms, s_minus, s_plus, ds,
                     dimension: int, n_seg: int, use_hat: bool):
    def f(pi, MTg, m2, M, sm, sp_, d_):
        return _three_body_integral(logdN_all[pi], tc_all[pi], ts_all[pi],
                                    MTg, pT, phi, y_grid, m2, M, sm, sp_, d_,
                                    dimension, use_hat)

    outs = jax.vmap(f)(parent_idx, MT_grids, m2s, Ms, s_minus, s_plus, ds)
    outs = outs * prefs[:, None, None, None]
    return jax.ops.segment_sum(outs, seg_ids, num_segments=n_seg)


def _wave_bucket(dimension: int) -> int:
    # bounds the (K, P, F, Y, V, Z) vmap intermediates to a few GB of HBM;
    # large enough that per-dispatch latency (~100 ms on a serving-layer
    # TPU) amortizes over the wave
    return 256 if dimension == 2 else 32


def _wave_shape_plan(parent_rows, parent_tasks2, parent_tasks3, level,
                     dimension: int, bucket=None):
    """(U_pad, B2, B3): ONE static shape for every wave's dispatches,
    derived from the schedule alone (never from the spectra).  With the
    parent stack padded to the max wave width and fixed bucket widths
    per task type, all waves share a single compiled program per task
    type -- the per-wave shape specialization was the dominant
    machine-cold compile cost (each of ~24 bucket shapes compiled its
    own program)."""
    n_waves = int(level.max()) + 1 if len(parent_rows) else 0
    u_max = n2_max = n3_max = 1
    for w in range(n_waves):
        idx = np.nonzero(level == w)[0]
        # distinct (parent, adjusted-mass) slots; conservative upper
        # bound = tasks' distinct (i, M) pairs (skipped all-zero parents
        # at runtime only SHRINK the actual count -- shapes stay valid)
        slots = set()
        n2 = n3 = 0
        for i in idx:
            for t in parent_tasks2[i]:
                slots.add((int(i), float(t[6])))
            for t in parent_tasks3[i]:
                slots.add((int(i), float(t[4])))
            n2 += len(parent_tasks2[i])
            n3 += len(parent_tasks3[i])
        u_max = max(u_max, len(slots))
        n2_max = max(n2_max, n2)
        n3_max = max(n3_max, n3)
    cap = bucket or _wave_bucket(dimension)
    return (_next_pow2(u_max), min(cap, _next_pow2(n2_max)),
            min(cap, _next_pow2(n3_max)))


def _run_wave(tasks2, tasks3, parents, pT, phi, y_grid, dimension, n_seg,
              dtype, use_hat, shape_plan=None):
    """Dispatch one wave.  parents: list of (logdN, tc, ts) host arrays;
    tasks reference parents by slot index.

    tasks2: (seg, pref, parent_slot, MT_grid, m2, Estar, pstar, M)
    tasks3: (seg, pref, parent_slot, MT_grid, m2, M, s_minus, s_plus, d)
    shape_plan: (U_pad, B2, B3) from _wave_shape_plan -- uniform shapes
    across waves so every wave hits the same compiled programs.
    Returns the (n_seg, P, F, Y) feed-down of this wave (numpy float64).
    """
    U = (shape_plan[0] if shape_plan is not None
         else _next_pow2(len(parents)))
    logdN = np.stack([p[0] for p in parents]
                     + [np.full_like(parents[0][0], -745.0)] * (U - len(parents)))
    tc = np.stack([p[1] for p in parents]
                  + [np.full_like(parents[0][1], -745.0)] * (U - len(parents)))
    ts = np.stack([p[2] for p in parents]
                  + [np.zeros_like(parents[0][2])] * (U - len(parents)))
    dev = dict(
        logdN=jnp.asarray(logdN, dtype), tc=jnp.asarray(tc, dtype),
        ts=jnp.asarray(ts, dtype), pT=jnp.asarray(pT, dtype),
        phi=jnp.asarray(phi, dtype), y=jnp.asarray(y_grid, dtype))

    total = np.zeros((n_seg,) + parents[0][0].shape, dtype=np.float64)

    for tasks, fn, scal, Bfix in (
            (tasks2, _two_body_wave, 4,
             None if shape_plan is None else shape_plan[1]),
            (tasks3, _three_body_wave, 5,
             None if shape_plan is None else shape_plan[2])):
        B = (Bfix if Bfix is not None
             else min(_wave_bucket(dimension), _next_pow2(max(1, len(tasks)))))
        for lo in range(0, len(tasks), B):
            chunk = tasks[lo:lo + B]
            full = chunk + [chunk[0][:1] + (0.0,) + chunk[0][2:]] * (B - len(chunk))
            seg = jnp.asarray(np.array([t[0] for t in full], dtype=np.int32))
            pref = jnp.asarray(np.array([t[1] for t in full]), dtype)
            pidx = jnp.asarray(np.array([t[2] for t in full], dtype=np.int32))
            MTg = jnp.asarray(np.stack([t[3] for t in full]), dtype)
            scalars = [jnp.asarray(np.array([t[4 + j] for t in full]), dtype)
                       for j in range(scal)]
            out = fn(dev["logdN"], dev["tc"], dev["ts"], pidx, seg, pref,
                     dev["pT"], dev["phi"], dev["y"], MTg, *scalars,
                     dimension=dimension, n_seg=n_seg, use_hat=use_hat)
            total += np.asarray(out, dtype=np.float64)
    return total


# ======================================================================
# driver (host)
# ======================================================================

def _group_daughters(daughter_idx, chosen_pos):
    """Group chosen daughters by species -> list of (table_idx, multiplicity,
    other_daughter_table_indices)."""
    groups = {}
    for i, di in enumerate(daughter_idx):
        if di in chosen_pos:
            if di not in groups:
                others = list(daughter_idx)
                others.remove(di)
                groups[di] = [0, others]
            groups[di][0] += 1
    return [(di, mult, others) for di, (mult, others) in groups.items()]


def do_resonance_decays(spectra, table, mcids, grid, cfg) -> np.ndarray:
    """Apply 2-/3-body decay feed-down to smooth spectra in place.

    spectra: (S, PT, PHI, Y) numpy array in chosen-particle (mcids) order.
    The result is identical to the reference's heaviest -> lightest cascade
    (do_resonance_decays loop order, :143-203): parents are levelized into
    waves such that a parent's own decay runs only after every *heavier*
    parent feeding it has run, and each wave is one batched dispatch.

    On an accelerator backend the wave quadrature AND the inter-wave
    accumulation run in float32 (round 5: the traced one-program cascade
    — the earlier host loop accumulated waves in f64 on the host, but
    its wave kernels and the production spectra feeding them are f32, so
    the e2e output was already f32-limited; measured agreement between
    the two routes is ~1e-5 relative, and x64 is disabled on the TPU
    path by policy).  On CPU the f64 host loop runs (oracle-parity
    route; channel-exact vs the traced twin under x64,
    test_grad.test_traced_feed_down_matches_production).
    Returns the updated spectra array.
    """
    from ..utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()   # wave compiles are the big
    #                                         cold-start cost (124 s cold
    #                                         vs 4.3 s warm, NOTES_ROUND1)
    if jax.default_backend() == "cpu":
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return _do_resonance_decays_impl(spectra, table, mcids, grid, cfg,
                                         dtype)
    # Accelerator: run the ONE-program traced cascade instead of the
    # per-wave host loop.  The host loop reads the (S, P, F, Y) wave
    # feed-down back after every bucket dispatch to update parents on the
    # host -- ~80 x 28 MB transfers at production scale, which on a
    # serialized host<->device link dominated the composite north-star run
    # (224 s warm vs ~5 s for the traced program + ONE readback).  The
    # traced twin keeps the inter-wave accumulation on device; its one
    # deliberate difference (all-zero parents evaluated at the -745
    # log-floor instead of skipped) is exp(-745) ~ 0, and agreement with
    # the host loop is tested channel-exactly
    # (test_grad.test_traced_feed_down_matches_production).
    return np.asarray(do_resonance_decays_async(spectra, table, mcids,
                                                grid, cfg),
                      dtype=np.float64)


def do_resonance_decays_async(spectra, table, mcids, grid, cfg):
    """Non-blocking variant of do_resonance_decays for pipeline overlap.

    On accelerator backends this dispatches the one-program traced
    cascade and returns the device array WITHOUT waiting (jax dispatch is
    asynchronous), so the host can run the CPU-bound smooth-spectra
    writers while the device computes the feed-down (api operation=1 does
    exactly this); ``np.asarray`` on the result blocks.  On CPU the f64
    host loop runs synchronously and the finished array is returned.

    IS3D_DECAYS_TRACED=1 forces the traced route on any backend (CPU jax
    dispatch is async too, so the overlap path is testable without a
    TPU); =0 forces the host loop."""
    from ..utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    force = os.environ.get("IS3D_DECAYS_TRACED")
    host_loop = (jax.default_backend() == "cpu" if force is None
                 else force != "1")
    if host_loop:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return _do_resonance_decays_impl(spectra, table, mcids, grid, cfg,
                                         dtype)
    fn = _forward_traced_jit(table, mcids, grid, cfg, spectra.shape)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    out = fn(jnp.asarray(spectra, dtype))
    print(f"Resonance decays: {fn.n_channels} channel-contributions added"
          f" in {fn.n_waves} waves")
    return out


class _TracedForward:
    """Jitted full-cascade forward, memoized per (table, chosen list, grid,
    cfg) so repeat calls skip schedule construction and retracing; holds a
    strong reference to `table` so a cache key can never alias a collected
    table object's reused id()."""

    def __init__(self, table, mcids, grid, cfg):
        self.table = table
        schedule = _decay_schedule(table, np.asarray(mcids),
                                   np.asarray(grid.pT, dtype=np.float64),
                                   cfg.lightest_particle)
        parent_rows, tasks2, tasks3, level = schedule
        self.n_waves = int(level.max()) + 1 if len(parent_rows) else 0
        self.n_channels = sum(len(t) for t in tasks2) + \
            sum(len(t) for t in tasks3)
        self._jit = jax.jit(lambda sp: resonance_feed_down_traced(
            sp, table, mcids, grid, cfg, schedule=schedule))

    def __call__(self, spectra):
        return self._jit(spectra)


_FORWARD_TRACED_CACHE: "dict" = {}   # insertion-ordered; LRU-bounded
_FORWARD_TRACED_CACHE_MAX = 4


def _forward_traced_jit(table, mcids, grid, cfg, shape):
    import hashlib
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(mcids, np.int64)).tobytes())
    for a in (grid.pT, grid.phi, grid.y):
        h.update(np.asarray(a, np.float64).tobytes())
    key = (h.hexdigest(), tuple(shape), id(table), int(cfg.dimension),
           int(cfg.lightest_particle))
    fn = _FORWARD_TRACED_CACHE.pop(key, None)
    if fn is None:
        fn = _TracedForward(table, mcids, grid, cfg)
    _FORWARD_TRACED_CACHE[key] = fn          # re-insert = most recent
    # bound the cache: each entry pins a particle table, a decay
    # schedule, and a compiled XLA executable (HBM) — a long-lived
    # server loading fresh tables per run would otherwise leak them
    while len(_FORWARD_TRACED_CACHE) > _FORWARD_TRACED_CACHE_MAX:
        _FORWARD_TRACED_CACHE.pop(next(iter(_FORWARD_TRACED_CACHE)))
    return fn


def _do_resonance_decays_impl(spectra, table, mcids, grid, cfg, dtype,
                              sequential: bool = False,
                              use_hat: bool | None = None) -> np.ndarray:
    if use_hat is None:
        # gathers run near scalar speed on TPU; dense hat contractions use
        # the MXU/VPU instead.  On CPU the stencil gathers win by ~7x.
        use_hat = jax.default_backend() != "cpu"
    spectra = np.array(spectra, dtype=np.float64, copy=True)
    pT = np.asarray(grid.pT, dtype=np.float64)
    phi = np.asarray(grid.phi, dtype=np.float64)
    y_grid = np.asarray(grid.y, dtype=np.float64)
    dimension = int(cfg.dimension)
    S = spectra.shape[0]

    parent_rows, parent_tasks2, parent_tasks3, level = _decay_schedule(
        table, mcids, pT, cfg.lightest_particle, sequential)
    plan = _wave_shape_plan(parent_rows, parent_tasks2, parent_tasks3,
                            level, dimension)

    # ---- phase 2: one batched dispatch per wave x topology-bucket
    n_waves = int(level.max()) + 1 if len(parent_rows) else 0
    n_channels_done = 0      # counted at dispatch, like the reference
    for w in range(n_waves):
        wave_parents = []   # (logdN, tc, ts)
        wtasks2 = []
        wtasks3 = []
        for i in np.nonzero(level == w)[0]:
            parent = spectra[parent_rows[i]]                      # (P,F,Y)
            if not np.any(parent > 0.0):
                continue
            # one slot per distinct (parent, adjusted mass): the MT tail
            # fit must use the abscissa MT = sqrt(pT^2 + M_adj^2) the task
            # queries -- the reference refits with the adjusted parent
            # mass per channel (estimate_MT_function_of_dNdypTdpTdphi
            # inside two_body_decay).  Unadjusted channels (the vast
            # majority) share one slot per parent as before.
            slot_by_M = {}

            def slot_for(M, _parent=parent, _s=slot_by_M):
                if M not in _s:
                    logdN, tc, ts, _ = _prepare_parent(_parent, pT, M)
                    _s[M] = len(wave_parents)
                    wave_parents.append((logdN, tc, ts))
                return _s[M]

            wtasks2 += [(t[0], t[1], slot_for(t[6])) + t[2:]
                        for t in parent_tasks2[i]]
            wtasks3 += [(t[0], t[1], slot_for(t[4])) + t[2:]
                        for t in parent_tasks3[i]]
        if not wave_parents:
            continue
        n_channels_done += len(wtasks2) + len(wtasks3)
        spectra += _run_wave(wtasks2, wtasks3, wave_parents, pT, phi, y_grid,
                             dimension, S, dtype, use_hat, shape_plan=plan)

    print(f"Resonance decays: {n_channels_done} channel-contributions added"
          f" in {n_waves} waves")
    return spectra


def _decay_schedule(table, mcids, pT, lightest, sequential: bool = False):
    """Phase 1 of the cascade, a STATIC function of the particle table and
    the chosen list (never of the spectra): per-parent channel-group task
    tuples (kinematics + prefactors) and the wave level of every parent.
    Shared by the production driver (_do_resonance_decays_impl) and the
    differentiable twin (resonance_feed_down_traced)."""
    mcids = np.asarray(mcids)
    chosen_table_idx = np.array([table.index_of_mcid(int(m)) for m in mcids])
    chosen_pos = {int(ti): i for i, ti in enumerate(chosen_table_idx)}

    # heaviest -> lightest among chosen, skip the lightest particle
    order = np.argsort(-table.mass[chosen_table_idx], kind="stable")

    # ---- phase 1 (host): per-parent channel-group tasks, kinematics only
    parent_rows = []       # chosen row of each processed parent, mass desc
    parent_tasks2 = []     # per parent: (seg, pref, MT_grid, m2, Es, ps, M)
    parent_tasks3 = []     # per parent: (seg, pref, MT_grid, m2, M, sm, sp, d)
    parent_mass = []
    for ichosen in order:
        ti = int(chosen_table_idx[ichosen])
        if table.stable[ti]:
            continue
        if int(mcids[ichosen]) == int(lightest):
            continue
        mass_parent0 = float(table.mass[ti])
        width_parent = float(table.width[ti])
        tasks2 = []
        tasks3 = []

        nch = len(table.decays_branch[ti])
        for ch in range(nch):
            branch = float(table.decays_branch[ti][ch])
            nd = abs(int(table.decays_n[ti][ch]))
            if branch <= 0.0 or nd in (0, 1) or nd > 3:
                continue
            d_mcids = [int(m) for m in table.decays_part[ti][ch][:nd]]
            try:
                d_idx = [table.index_of_mcid(m) for m in d_mcids]
            except KeyError:
                continue

            if nd == 2:
                i1, i2 = d_idx
                m1 = float(table.mass[i1])
                m2 = float(table.mass[i2])
                M = mass_parent0
                # width shift to open sub-threshold channels (ref :242-258);
                # with all three widths zero the loop cannot make progress,
                # so such a channel is kinematically closed outright (a
                # zero-width sub-threshold entry only arises in trimmed /
                # user-supplied tables, but it must not hang the pass)
                closed = False
                w_par = 0.25 * width_parent
                w1 = 0.5 * float(table.width[i1])
                w2 = 0.5 * float(table.width[i2])
                if m1 + m2 > M and w_par == 0.0 and w1 == 0.0 and w2 == 0.0:
                    closed = True
                while not closed and m1 + m2 > M:
                    M += w_par
                    m1 -= w1
                    m2 -= w2
                    if m1 < 0.0 or m2 < 0.0:
                        closed = True
                if closed:
                    continue
                adj_mass = {i1: m1, i2: m2}
                MT_grid = np.sqrt(pT ** 2 + M ** 2)
                for di, mult, others in _group_daughters(d_idx, chosen_pos):
                    ma = adj_mass[di]
                    # the *other* daughter's mass (see module docstring)
                    mb = adj_mass[others[0]]
                    Estar = (M * M + ma * ma - mb * mb) / (2.0 * M)
                    pstar2 = Estar * Estar - ma * ma
                    if pstar2 <= 0.0:
                        continue
                    pstar = math.sqrt(pstar2)
                    pref = mult * M * branch / (8.0 * pstar)
                    tasks2.append((chosen_pos[di], pref, MT_grid, ma * ma,
                                   Estar, pstar, M))
            else:  # nd == 3
                M = mass_parent0
                for di, mult, others in _group_daughters(d_idx, chosen_pos):
                    ma = float(table.mass[di])
                    mb = float(table.mass[others[0]])
                    mc_ = float(table.mass[others[1]])
                    s_plus = (M - ma) ** 2
                    s_minus = (mb + mc_) ** 2
                    d_ = (mb - mc_) ** 2
                    if s_plus <= s_minus:
                        continue  # kinematically closed at nominal masses
                    Q = _q_factor(M, ma, mb, mc_)
                    if Q <= 0.0:
                        continue
                    MT_grid = np.sqrt(pT ** 2 + M ** 2)
                    pref = mult * M * M * (s_plus - s_minus) * branch / (8.0 * Q)
                    tasks3.append((chosen_pos[di], pref, MT_grid, ma * ma,
                                   M, s_minus, s_plus, d_))

        if tasks2 or tasks3:
            parent_rows.append(int(ichosen))
            parent_tasks2.append(tasks2)
            parent_tasks3.append(tasks3)
            parent_mass.append(mass_parent0)

    # ---- levelize: parent p waits only for heavier parents that feed it.
    # Feed-down from a *lighter* parent into a heavier one (possible via
    # width-shifted sub-threshold channels) still accumulates into the
    # heavier spectrum but does not re-trigger its decay -- exactly the
    # reference's mass-ordered sequential semantics.
    row_to_slot = {r: i for i, r in enumerate(parent_rows)}
    if sequential:
        # testing mode: one parent per wave, literal reference mass order
        level = np.arange(len(parent_rows), dtype=np.int64)
    else:
        level = np.zeros(len(parent_rows), dtype=np.int64)
        for i in range(len(parent_rows)):      # mass-descending order
            targets = [row_to_slot.get(t[0])
                       for t in parent_tasks2[i] + parent_tasks3[i]]
            # pass 1: if i feeds an already-processed *heavier* parent j,
            # the reference has j decay before i's add lands -> run i no
            # earlier than j (equal wave is fine: j's decay reads pre-wave
            # spectra)
            for j in targets:
                if j is not None and j < i:
                    level[i] = max(level[i], level[j])
            # pass 2: lighter parents fed by i must decay strictly after i
            for j in targets:
                if j is not None and j > i:
                    level[j] = max(level[j], level[i] + 1)

    return parent_rows, parent_tasks2, parent_tasks3, level


def _q_factor(M, m1, m2, m3):
    """Normalization Q = int_{s-}^{s+} ds g(s) (reference :99-121)."""
    a = (M + m1) ** 2
    b = (M - m1) ** 2
    c = (m2 + m3) ** 2
    d = (m2 - m3) ** 2
    s = c + (b - c) * (1.0 + _Q_X) / 2.0
    return float(np.sum(_Q_W * (b - c)
                        * np.sqrt(np.abs((a - s) * (b - s) * (s - c) * (s - d)))
                        / (2.0 * s)))


# ======================================================================
# differentiable twin (no reference counterpart; see is3d_tpu.diff)
# ======================================================================

def _run_wave_traced(tasks2, tasks3, parents, pT, phi, y_grid, dimension,
                     n_seg, use_hat, remat: bool = False,
                     bucket: int | None = None, shape_plan=None):
    """jnp twin of _run_wave: identical task batching and the SAME wave
    kernels, but parents are traced arrays and the total stays on device
    so reverse-mode AD flows through the whole wave.

    Memory: the hat evaluators carry a custom_vjp (residuals = inputs
    only; weights recomputed in the backward), task buckets ride a
    lax.scan (sequential backward: ONE bucket's recompute temps live at
    a time -- an unrolled bucket loop let XLA interleave every bucket's
    backward, ~20 simultaneous GB-scale temps), and remat checkpoints
    each scan body.  Together these took the production-scale reverse
    pass from 39 GB (round 3, OOM) to fitting one 16 GB chip."""
    dtype = parents[0][0].dtype
    U = (shape_plan[0] if shape_plan is not None
         else _next_pow2(len(parents)))
    pad0 = jnp.full_like(parents[0][0], -745.0)
    pad1 = jnp.full_like(parents[0][1], -745.0)
    pad2 = jnp.zeros_like(parents[0][2])
    logdN = jnp.stack([p[0] for p in parents]
                      + [pad0] * (U - len(parents)))
    tc = jnp.stack([p[1] for p in parents] + [pad1] * (U - len(parents)))
    ts = jnp.stack([p[2] for p in parents] + [pad2] * (U - len(parents)))

    # carry shape from the GRID, not the parent arrays: callers may pass
    # broadcast-degenerate spectra (trailing singleton phi/y axes) and the
    # scan carry -- unlike the former Python-loop `+` -- cannot broadcast up
    n_y_out = 1 if dimension == 2 else y_grid.shape[0]
    total = jnp.zeros((n_seg, pT.shape[0], phi.shape[0], n_y_out), dtype)
    for tasks, fn, scal, Bfix in (
            (tasks2, _two_body_wave, 4,
             None if shape_plan is None else shape_plan[1]),
            (tasks3, _three_body_wave, 5,
             None if shape_plan is None else shape_plan[2])):
        if not tasks:
            continue
        # the shape plan (built with the caller's bucket cap) wins; the
        # legacy per-wave sizing remains for plan-less direct callers
        B = (Bfix if Bfix is not None
             else min(bucket or _wave_bucket(dimension),
                      _next_pow2(max(1, len(tasks)))))
        # buckets ride a lax.scan (NOT an unrolled Python loop): scan's
        # backward is sequential by construction, so the reverse pass
        # holds ONE bucket's recompute temps at a time.  The unrolled
        # form made every bucket's backward data-independent and XLA
        # interleaved them all -- ~20 simultaneous 1.7 GB hat-construction
        # temps at production scale (the round-3/4 OOM) -- and compiled
        # one program PER bucket.  Short tail buckets pad with zero-pref
        # copies of task 0 (pref = 0 -> contribution exactly 0).
        nB = -(-len(tasks) // B)
        full = tasks + [tasks[0][:1] + (0.0,) + tasks[0][2:]] * (nB * B - len(tasks))
        seg = jnp.asarray(np.array([t[0] for t in full],
                                   dtype=np.int32).reshape(nB, B))
        pref = jnp.asarray(np.array([t[1] for t in full]),
                           dtype).reshape(nB, B)
        pidx = jnp.asarray(np.array([t[2] for t in full],
                                    dtype=np.int32).reshape(nB, B))
        MTg = jnp.asarray(np.stack([t[3] for t in full]),
                          dtype).reshape(nB, B, -1)
        scalars = [jnp.asarray(np.array([t[4 + j] for t in full]),
                               dtype).reshape(nB, B) for j in range(scal)]
        call = partial(fn, dimension=dimension, n_seg=n_seg,
                       use_hat=use_hat)

        def body(tot, xs, _call=call):
            seg_b, pref_b, pidx_b, MTg_b, *scal_b = xs
            out = _call(logdN, tc, ts, pidx_b, seg_b, pref_b,
                        pT, phi, y_grid, MTg_b, *scal_b)
            return tot + out, None

        if remat:
            body = jax.checkpoint(body)
        total, _ = jax.lax.scan(body, total, (seg, pref, pidx, MTg,
                                              *scalars))
    return total


def resonance_feed_down_traced(spectra, table, mcids, grid, cfg,
                               use_hat=None, remat: bool = True,
                               bucket: int | None = None,
                               schedule=None):
    """Differentiable resonance-decay feed-down: spectra -> decayed
    spectra as ONE traced jnp computation, so reverse-mode AD flows from
    post-feed-down observables back to the Cooper-Frye inputs (compose
    with diff.spectra_fn; no reference counterpart -- the reference's
    decay routine is exit(-1)-disabled and certainly not differentiable).

    Identical math to do_resonance_decays via the shared _decay_schedule
    and the same wave kernels; the two deliberate differences:
    * all-zero parents are evaluated instead of skipped (their patched
      log-spectra are the -745 floor, contributing exp(-745) ~ 1e-323 --
      the production skip is a dispatch-count optimization, not math);
    * parent-spectrum preparation runs in jnp (_prepare_parent_traced)
      with AD-safe double-where guards.

    remat=True checkpoints each wave AND each task bucket; buckets run
    under a lax.scan whose backward is sequential, and the hat
    evaluators' custom_vjp recomputes interpolation weights instead of
    storing them -- reverse mode at the production momentum grid on the
    full SMASH chosen list fits one 16 GB chip (see _run_wave_traced).
    ``bucket`` stays as a knob to shrink the per-step footprint
    further."""
    if use_hat is None:
        use_hat = jax.default_backend() != "cpu"
    dtype = spectra.dtype
    pT_np = np.asarray(grid.pT, dtype=np.float64)
    # `schedule` lets a caller that already built the (static) decay
    # schedule reuse it across traces (the memoized production forward)
    parent_rows, parent_tasks2, parent_tasks3, level = (
        schedule if schedule is not None
        else _decay_schedule(table, mcids, pT_np, cfg.lightest_particle))
    plan = _wave_shape_plan(parent_rows, parent_tasks2, parent_tasks3,
                            level, int(cfg.dimension), bucket=bucket)

    pT = jnp.asarray(grid.pT, dtype)
    phi = jnp.asarray(grid.phi, dtype)
    y_grid = jnp.asarray(grid.y, dtype)
    dimension = int(cfg.dimension)
    S = spectra.shape[0]
    spectra = jnp.asarray(spectra, dtype)

    n_waves = int(level.max()) + 1 if len(parent_rows) else 0
    for w in range(n_waves):
        rows = [int(i) for i in np.nonzero(level == w)[0]]
        if not rows:
            continue

        def wave_fn(sp, _rows=tuple(rows)):
            wave_parents = []
            wtasks2 = []
            wtasks3 = []
            for i in _rows:
                parent = sp[parent_rows[i]]
                slot_by_M = {}

                def slot_for(M, _parent=parent, _s=slot_by_M):
                    if M not in _s:
                        prep = _prepare_parent_traced(_parent, pT, M)
                        _s[M] = len(wave_parents)
                        wave_parents.append(prep)
                    return _s[M]

                wtasks2 += [(t[0], t[1], slot_for(t[6])) + t[2:]
                            for t in parent_tasks2[i]]
                wtasks3 += [(t[0], t[1], slot_for(t[4])) + t[2:]
                            for t in parent_tasks3[i]]
            if not wave_parents:
                return jnp.zeros_like(sp)
            return _run_wave_traced(wtasks2, wtasks3, wave_parents, pT,
                                    phi, y_grid, dimension, S, use_hat,
                                    remat=remat, bucket=bucket,
                                    shape_plan=plan)

        if remat:
            wave_fn = jax.checkpoint(wave_fn)
        spectra = spectra + wave_fn(spectra)
    return spectra
