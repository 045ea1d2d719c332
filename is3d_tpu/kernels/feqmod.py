"""Smooth Cooper-Frye spectra with modified equilibrium distributions
(df modes 3 "Mike" and 4 "Jonah").

TPU-native re-derivation of calculate_dN_ptdptdphidy_feqmod (reference:
emissionfunction_smooth_kernels.cpp:396-996).  Differences from a
translation:

* the per-cell GSL LU inverse becomes a closed-form adjugate inverse of the
  symmetric 3x3 momentum transform A = (1 + bulk_mod) 1 + shear_mod pi_LRF
  (reference builds it at :658-707);
* the reference's 5-pass iterative refinement of p_mod = A^-1 p (:902-919)
  becomes a fixed 2-pass residual correction (deterministic, no data-dependent
  early exit; f64 adjugate + refinement is converged well below 1e-6 parity);
* the per-cell breakdown branch (goto-style fallback to linearized df,
  :811-877) becomes a per-(cell, rapidity-node) mask selecting between the
  feqmod and linearized evaluations -- and, in the production "routed"
  mode, a per-CHUNK lax.switch that runs only the branch the chunk needs:
  chunks whose every cell cleared the breakdown probe pay only the
  momentum-transform chain, chunks whose every valid cell broke down pay
  only the (cheaper) linearized chain, and only genuinely mixed chunks
  evaluate both.  The routing predicate and the per-point branch select
  are computed from the SAME in-program values, so they can never
  disagree, and chunk composition follows the canonical group tree
  (parallel/mesh.py), so results stay bit-identical across device counts
  AND processes -- no global host-side partition decision exists anymore;
* per-(cell, species) renormalization n_linear/n_mod uses the batched
  Gauss-Laguerre quadrature over a (C, S, Q) block (:744-778).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..units import CF_PREFACTOR, TWO_PI2_HBARC3
from ..config import Config
from ..data import SpeciesArrays
from ..io.tables import MomentumGrid
from ..io.deltaf import DeltafData
from ..physics import lrf, thermal
from .common import (surface_columns, prepare_cells, pad_and_chunk,
                     carry_seed_zero,
                     effective_chunk, fermi_bose, scaled_fermi_bose)
from .smooth import _flat_monomials


def _adjugate_sym(A):
    Axx, Axy, Axz, Ayy, Ayz, Azz = A
    adj_xx = Ayy * Azz - Ayz * Ayz
    adj_xy = Axz * Ayz - Axy * Azz
    adj_xz = Axy * Ayz - Ayy * Axz
    adj_yy = Axx * Azz - Axz * Axz
    adj_yz = Axy * Axz - Axx * Ayz
    adj_zz = Axx * Ayy - Axy * Axy
    det = Axx * adj_xx + Axy * adj_xy + Axz * adj_xz
    return (adj_xx, adj_xy, adj_xz, adj_yy, adj_yz, adj_zz), det


def _sym_to_gen(S):
    """Symmetric 6-tuple (xx, xy, xz, yy, yz, zz) -> row-major 9-tuple."""
    xx, xy, xz, yy, yz, zz = S
    return (xx, xy, xz, xy, yy, yz, xz, yz, zz)


def _gen_matmul(P, Q):
    """Row-major 9-tuple 3x3 product P @ Q, broadcastable entries."""
    p11, p12, p13, p21, p22, p23, p31, p32, p33 = P
    q11, q12, q13, q21, q22, q23, q31, q32, q33 = Q
    return (p11 * q11 + p12 * q21 + p13 * q31,
            p11 * q12 + p12 * q22 + p13 * q32,
            p11 * q13 + p12 * q23 + p13 * q33,
            p21 * q11 + p22 * q21 + p23 * q31,
            p21 * q12 + p22 * q22 + p23 * q32,
            p21 * q13 + p22 * q23 + p23 * q33,
            p31 * q11 + p32 * q21 + p33 * q31,
            p31 * q12 + p32 * q22 + p33 * q32,
            p31 * q13 + p32 * q23 + p33 * q33)


def _gen_matvec(M, v):
    m11, m12, m13, m21, m22, m23, m31, m32, m33 = M
    vx, vy, vz = v
    return (m11 * vx + m12 * vy + m13 * vz,
            m21 * vx + m22 * vy + m23 * vz,
            m31 * vx + m32 * vy + m33 * vz)


def _refined_inverse(A_sym, B_sym):
    """Fold the fixed 2-pass residual refinement of x = A^-1 p into ONE
    per-cell 3x3 operator: with B the adjugate-based inverse and
    e = I - B A the residual operator, x2 = (I + e + e^2) B p.  The
    refinement recurrence x_{k+1} = B p + e x_k is linear in p, so the
    per-(cell, momentum)-point 5-matvec loop collapses to a single matvec
    against this matrix -- identical math, ~60 fewer flops per point."""
    B = _sym_to_gen(B_sym)
    BA = _gen_matmul(B, _sym_to_gen(A_sym))
    one = 1.0 + 0.0 * BA[0]
    zero = 0.0 * BA[0]
    eye = (one, zero, zero, zero, one, zero, zero, zero, one)
    e = tuple(i - ba for i, ba in zip(eye, BA))
    EB = _gen_matmul(e, B)
    EEB = _gen_matmul(e, EB)
    # the refinement series contracts only for ||I - B A|| < 1; on
    # ill-conditioned cells (detA near the breakdown threshold, or the
    # indefinite transforms extreme synthetic tables produce) the e^2 term
    # diverges and can overflow f32 at the per-cell stage.  Those cells
    # keep the plain adjugate inverse -- exact in exact arithmetic; the
    # refinement only polishes fp rounding -- and they are breakdown-routed
    # or masked downstream anyway.  Frobenius^2 < 0.25 guarantees spectral
    # norm < 0.5.
    ok = sum(x * x for x in e) < 0.25
    return tuple(jnp.where(ok, b + eb + eeb, b)
                 for b, eb, eeb in zip(B, EB, EEB))


def _mode3_renorm(c, species, laguerre, cfg):
    """n_linear / n_mod per (cell, species)
    (reference: emissionfunction_smooth_kernels.cpp:744-765)."""
    r1, w1 = laguerre[1]
    r2, w2 = laguerre[2]
    df = c["df"]
    T, bulkPi = c["T"], c["bulkPi"]
    T_mod = c["T_mod"]
    alphaB = c["alphaB"][:, None]
    alphaB_mod = c["alphaB_mod"][:, None]

    mbar = species.mass[None, :] / T[:, None]           # (C,S)
    mbar_mod = species.mass[None, :] / T_mod[:, None]
    baryon = species.baryon[None, :]
    sign = species.sign[None, :]
    deg = species.degeneracy[None, :]

    neq_fact = (T**3 / TWO_PI2_HBARC3)[:, None]
    J20_fact = (T**4 / TWO_PI2_HBARC3)[:, None]
    nmod_fact = (T_mod**3 / TWO_PI2_HBARC3)[:, None]
    dn_fact = (bulkPi / df.betabulk)[:, None]

    gt = lambda f, r, w, mb, aB: thermal.gauss_thermal(f, r, w, mb, aB, baryon, sign)
    neq = neq_fact * deg * gt(thermal.neq_int, r1, w1, mbar, alphaB)
    N10 = baryon * neq_fact * deg * gt(thermal.J10_int, r1, w1, mbar, alphaB)
    J20 = J20_fact * deg * gt(thermal.J20_int, r2, w2, mbar, alphaB)
    n_linear = neq + dn_fact * (neq + N10 * df.G[:, None]
                                + J20 * (df.F / T / T)[:, None])
    n_mod = nmod_fact * deg * gt(thermal.neq_int, r1, w1, mbar_mod, alphaB_mod)
    return n_linear / n_mod


def _mode3_breakdown(c, laguerre, cfg):
    """Per-cell breakdown flag: detA <= detA_min or negative linearized pion0
    density (reference: emissionfunction.cpp:109-150 with fast = 0)."""
    r1, w1 = laguerre[1]
    r2, w2 = laguerre[2]
    T, bulkPi, df = c["T"], c["bulkPi"], c["df"]
    mbar_pi = cfg.mass_pion0 / T
    zero = jnp.zeros_like(T)
    neq_fact = T**3 / TWO_PI2_HBARC3
    J20_fact = T * neq_fact
    neq_pi = neq_fact * thermal.gauss_thermal(
        thermal.neq_int, r1, w1, mbar_pi, zero, zero, -jnp.ones_like(T))
    J20_pi = J20_fact * thermal.gauss_thermal(
        thermal.J20_int, r2, w2, mbar_pi, zero, zero, -jnp.ones_like(T))
    dn_pi = bulkPi * (neq_pi + J20_pi * df.F / T / T) / df.betabulk
    pion_negative = (neq_pi + dn_pi) < 0.0
    return (c["detA"] <= cfg.deta_min) | pion_negative


def _feqmod_transform(c, laguerre, cfg: Config):
    """Per-cell momentum transform and breakdown flag (no species axis):
    LRF basis, A = (1 + bulk_mod) 1 + shear_mod pi_LRF, its adjugate
    inverse, detA, T_mod/alphaB_mod, and the per-cell fallback decision.
    Shared by the spectra kernel and the host-side partition probe."""
    df = c["df"]
    tau = c["tau"]

    basis = lrf.milne_basis(c["ut"], c["ux"], c["uy"], c["un"], tau)
    c["basis"] = basis

    piL = lrf.boost_pimunu_to_lrf(basis, c["pitt"], c["pitx"], c["pity"],
                                  c["pitn"], c["pixx"], c["pixy"], c["pixn"],
                                  c["piyy"], c["piyn"], c["pinn"], tau)
    pixx_L, pixy_L, pixz_L, piyy_L, piyz_L, pizz_L = piL

    if cfg.df_mode == 3:
        c["T_mod"] = c["T"] + c["bulkPi"] * df.F / df.betabulk
        c["alphaB_mod"] = c["alphaB"] + c["bulkPi"] * df.G / df.betabulk
        bulk_mod = c["bulkPi"] / (3.0 * df.betabulk)
    else:
        c["T_mod"] = c["T"]
        c["alphaB_mod"] = c["alphaB"]
        bulk_mod = df.lam
    shear_mod = 0.5 / df.betapi

    A = (1.0 + pixx_L * shear_mod + bulk_mod,
         pixy_L * shear_mod,
         pixz_L * shear_mod,
         1.0 + piyy_L * shear_mod + bulk_mod,
         piyz_L * shear_mod,
         1.0 + pizz_L * shear_mod + bulk_mod)
    adj, detA = _adjugate_sym(A)
    c["A"] = A
    c["detA"] = detA
    safe_det = jnp.where(jnp.abs(detA) < 1e-300, 1.0, detA)
    c["A_inv"] = tuple(a / safe_det for a in adj)

    if cfg.df_mode == 3:
        c["breakdown"] = _mode3_breakdown(c, laguerre, cfg)
    else:
        # mode 4 normally never falls back (to match J. Bernhard's
        # sampler; reference: emissionfunction.cpp:139-149) -- EXCEPT
        # where the modified distribution stops being defined: under
        # strong negative bulk (measured at bulkPi ~ -0.9 P) the
        # transform A loses positive definiteness (detA < 0, negative
        # renormalization), so f_mod is meaningless and the reference
        # silently evaluates an indefinite momentum transform.  Route
        # detA <= detA_min cells to the linearized Jonah df, the same
        # guard mode 3 applies (deliberate, documented divergence).
        c["breakdown"] = detA <= cfg.deta_min
    # chunk-routing predicate: cells that need the fallback chain at ANY
    # rapidity node.  3+1D adds the narrow-cell mask's eligibility
    # (detA < 0.01, _chunk_contribution_feqmod) so a chunk routed to the
    # feqmod-only branch provably never needed the per-point mask.  The
    # predicate and the per-point select read the SAME in-program values,
    # so routing and masking cannot ulp-disagree.
    c["routing"] = c["breakdown"]
    if cfg.dimension == 3:
        c["routing"] = c["routing"] | (detA < 0.01)
    return c


def _prepare_feqmod_cells(c, species, laguerre, cfg: Config,
                          eta_rescaled: bool = False):
    """Extend the common cell bundle with the feqmod-specific per-cell data."""
    c = _feqmod_transform(c, laguerre, cfg)
    df = c["df"]
    detA = c["detA"]
    c["Minv"] = _refined_inverse(c["A"], c["A_inv"])

    # renormalization per (cell, species)
    if cfg.include_bulk_deltaf:
        if cfg.df_mode == 3:
            renorm = _mode3_renorm(c, species, laguerre, cfg)   # (C,S)
        else:
            renorm = jnp.broadcast_to(df.z[:, None],
                                      (detA.shape[0], species.n_species))
    else:
        renorm = jnp.ones((detA.shape[0], species.n_species), detA.dtype)

    finite = jnp.isfinite(renorm)
    if cfg.dimension == 3 or eta_rescaled:
        # explicit 1/detA momentum-space jacobian (in 2+1D fixed-node mode
        # the eta -> detA*eta substitution supplies it instead, below)
        renorm = renorm / detA[:, None]
    c["renorm"] = jnp.where(finite, renorm, 0.0)
    c["renorm_ok"] = finite

    # 2+1D eta rescaling by detA: the variable change eta -> detA*eta both
    # resolves the narrow (y-eta) integrand and supplies the 1/detA
    # momentum-space jacobian (so renorm is NOT divided by detA in 2+1D).
    # The reference SPECTRA kernel skips the rescale for detA >= 1
    # (smooth_kernels.cpp:728), silently dropping the jacobian on
    # bulk-expanded cells; its dN_dX kernel (:1847) and its sampler keep
    # it.  We default to the consistent behavior and offer the quirk as
    # reference_compat_feqmod_eta for spectra-parity runs.
    if cfg.dimension == 2:
        use = detA > cfg.deta_min
        if cfg.reference_compat_feqmod_eta:
            use = use & (detA < 1.0)
        c["eta_scale"] = jnp.where(use, detA, 1.0)
    return c


def _chunk_contribution_feqmod(c, valid, species: SpeciesArrays,
                               grid: MomentumGrid, cfg: Config,
                               reduce: bool = True, branch: str = "both"):
    """Spectra contribution of one cell chunk, (S, PT, PHI, Y_out).

    Computed in the TPU-friendly (C, R, S, M = PT*PHI) layout (full lane
    tiles; see kernels/smooth._chunk_contribution) with the same factored
    composites.  With reduce=False, returns the masked pointwise emission
    block at (C, R, S, M) -- no weights or prefactor -- consumed by the
    dN/dX spacetime kernel (fixed eta nodes only).

    branch selects which evaluation chains are traced (the reference's
    scalar loop branches once per cell and never pays the other chain,
    emissionfunction_smooth_kernels.cpp:811-877):

    * "both": feqmod AND linearized fallback evaluated at every point,
      selected per (cell, rapidity node) by the breakdown mask -- always
      correct, roughly twice the per-point work;
    * "mod":  feqmod only.  Valid for chunks whose every cell cleared the
      routing predicate (breakdown False, and in 3+1D detA >= 0.01 so the
      narrow-cell mask never fires);
    * "lin":  linearized fallback only.  Valid for chunks whose every
      VALID cell broke down (the per-point select would pick the fallback
      everywhere).

    The per-chunk lax.switch in _feqmod_spectra_jit routes between the
    three from the in-kernel ``routing``/``breakdown`` flags."""
    assert branch in ("both", "mod", "lin"), branch
    fallback_needed = branch in ("both", "lin")
    mod_needed = branch in ("both", "mod")
    S = species.n_species
    P, F = grid.n_pT, grid.n_phi
    M = P * F
    cr = lambda x: x[:, :, None, None]
    cb = lambda x: x[:, None, None, None]
    cm = lambda x: x[:, None, None, :]
    sm = lambda x: x[None, None, :, :]
    sb = lambda x: x[None, None, :, None]

    mT, mTf, pxf, pyf = _flat_monomials(species, grid)
    mT2f = mTf * mTf
    mTpxf = mTf * pxf[None, :]
    mTpyf = mTf * pyf[None, :]

    C = c["tau"].shape[0]
    tau = c["tau"]
    sign_b = sb(species.sign)
    baryon_b = sb(species.baryon)
    mass2_b = sb(species.mass ** 2)

    from .smooth import df_switches
    shear_on, bulk_on, diff_on = df_switches(cfg)
    W1 = c["dax"][:, None] * pxf[None] + c["day"][:, None] * pyf[None]
    W2 = (c["ux"][:, None] * pxf[None] + c["uy"][:, None] * pyf[None]
          if fallback_needed else None)
    C4 = ((c["pixx"][:, None] * (pxf * pxf)[None]
           + c["piyy"][:, None] * (pyf * pyf)[None]
           + 2.0 * c["pixy"][:, None] * (pxf * pyf)[None])
          if shear_on and fallback_needed else None)
    D2 = (c["Vx"][:, None] * pxf[None] + c["Vy"][:, None] * pyf[None]
          if diff_on and fallback_needed else None)

    rescaled = cfg.dimension == 2 and grid.eta_mT_rescale
    if rescaled:
        # mT-adaptive eta-node remap shared by BOTH branches (see
        # smooth._chunk_contribution): eta_phys = y_flow(cell) + s(mT)*eta.
        # The detA factor of the fixed-node substitution is dropped from
        # the node map (its 1/detA jacobian is applied to renorm in
        # _prepare_feqmod_cells instead); s(mT) rides the weights below.
        from .smooth import _rescaled_eta_operands, _rescaled_vh_terms
        ops = _rescaled_eta_operands(c, species, grid, S, P, F, M)
        s_flat = ops[-1]
        if fallback_needed:
            pds_u, pdotu, pipp, Vp = _rescaled_vh_terms(c, ops, W1, W2, C4,
                                                        D2, pxf, pyf)
        delta_u = None    # only consulted on the 3+1D narrow-cell mask
    else:
        # rapidity factors: unscaled (fallback) and detA-scaled (feqmod)
        if cfg.dimension == 2:
            delta_u = jnp.broadcast_to(-grid.eta[None, :], (C, grid.n_eta))
            delta_s = -c["eta_scale"][:, None] * grid.eta[None, :]
        else:
            delta_u = grid.y[None, :] - c["eta"][:, None]
            delta_s = delta_u
        if fallback_needed:
            ch_u, sh_u = jnp.cosh(delta_u), jnp.sinh(delta_u)
        # mod-branch factors: traced unconditionally ("lin" relies on XLA
        # dead-code elimination -- the whole feqmod chain below is pure and
        # unused there, so it vanishes from the compiled kernel)
        ch_s, sh_s = jnp.cosh(delta_s), jnp.sinh(delta_s)

    def lin_factors(ch, sh):
        t_sh = sh * tau[:, None]
        A1 = ch * c["dat"][:, None] + sh * (c["dan"] / tau)[:, None]
        B1 = ch * c["ut"][:, None] - sh * (tau * c["un"])[:, None]
        return A1, B1, t_sh

    if fallback_needed and not rescaled:
        # ---- fallback branch (linearized df at unscaled rapidity) --------
        A1u, B1u, t_sh_u = lin_factors(ch_u, sh_u)
        pds_u = sm(mTf) * cr(A1u) + cm(W1)
        pdotu = sm(mTf) * cr(B1u) - cm(W2)
        pipp = Vp = None
        if shear_on:
            C1 = (ch_u * ch_u * c["pitt"][:, None]
                  + t_sh_u * t_sh_u * c["pinn"][:, None]
                  - 2.0 * ch_u * t_sh_u * c["pitn"][:, None])
            C2 = -2.0 * (ch_u * c["pitx"][:, None]
                         - t_sh_u * c["pixn"][:, None])
            C3 = -2.0 * (ch_u * c["pity"][:, None]
                         - t_sh_u * c["piyn"][:, None])
            pipp = (sm(mT2f) * cr(C1) + sm(mTpxf) * cr(C2)
                    + sm(mTpyf) * cr(C3) + cm(C4))
        if diff_on:
            D1 = ch_u * c["Vt"][:, None] - t_sh_u * c["Vn"][:, None]
            Vp = sm(mTf) * cr(D1) - cm(D2)

    if fallback_needed:
        arg = pdotu * cb(1.0 / c["T"])
        if cfg.include_baryon and cfg.df_mode != 4:
            # Jonah fallback feq has no chem (:861)
            arg = arg - baryon_b * cb(c["alphaB"])
        # NaN-free derivative under AD, bit-identical forward: see common.py
        feq = fermi_bose(arg, sign_b)
        feqbar = 1.0 - sign_b * feq

        df = c["df"]
        r = 1.0 / pdotu
        terms = []
        if cfg.df_mode == 3:
            # NOTE: deliberately NOT regrouped like the hot linear CE kernel
            # (smooth._linear_df_flat): this fallback chain runs only on
            # breakdown cells (cold), and the regrouped coefficient products
            # can turn a clip-regulated +-inf into a 0 * inf = NaN on
            # degenerate coefficient tables (e.g. betaV = 0 with meson
            # baryon number 0)
            if shear_on:
                terms.append(cb(0.5 / (df.betapi * c["T"])) * pipp * r)
            if bulk_on:
                terms.append(
                    (cb(df.F / (c["T"] ** 2 * df.betabulk)) * pdotu
                     + cb(df.G / df.betabulk) * baryon_b
                     + cb(1.0 / (3.0 * c["T"] * df.betabulk))
                     * (pdotu - mass2_b * r)) * cb(c["bulkPi"]))
            if diff_on:
                terms.append((cb(c["baryon_enthalpy_ratio"]) - baryon_b * r)
                             * Vp * cb(1.0 / df.betaV))
            out_df = feqbar * sum(terms[1:], terms[0]) if terms else None
        else:
            if shear_on:
                terms.append(feqbar * cb(0.5 / (df.betapi * c["T"]))
                             * pipp * r)
            if bulk_on:
                terms.append(cb(df.delta_z) - 3.0 * cb(df.delta_lambda)
                             + feqbar * cb(df.delta_lambda)
                             * (pdotu - mass2_b * r) / cb(c["T"]))
            out_df = sum(terms[1:], terms[0]) if terms else None
        if out_df is None:
            f_fallback = feq
        else:
            if cfg.regulate_deltaf:
                out_df = jnp.clip(out_df, -1.0, 1.0)
            # one full-rank fma (same +4% pattern as the linear kernel)
            f_fallback = feq * out_df + feq

    # ---- feqmod branch (momentum transform at scaled rapidity) -----------
    # p_LRF = mT (alpha ch + beta sh) + gamma with per-cell alpha =
    # (-Xt, 0, -Zt), beta = (Xn tau, 0, Zn tau) and per-(cell, pT-phi)
    # gamma = (E2, F2, 0); x = Minv p is linear in p, so |x|^2 expands into
    # quadratic-form coefficients computed once per cell (qaa, qab, qbb)
    # and per (cell, m) (qag, qbg, qgg).  Each (c, r, s, m) point then pays
    # ~8 fma for E_mod^2 instead of materializing three (C, R, S, M)
    # momentum-component blocks plus a 3x3 matvec -- same math, far fewer
    # flops and no full-block p_LRF/x temporaries.
    b = c["basis"]
    E2 = b.Xx[:, None] * pxf[None] + b.Xy[:, None] * pyf[None]
    F2 = b.Yx[:, None] * pxf[None] + b.Yy[:, None] * pyf[None]
    zl = jnp.zeros_like(tau)
    Minv = c["Minv"]
    Ma = _gen_matvec(Minv, (-b.Xt, zl, -b.Zt))
    Mb = _gen_matvec(Minv, (b.Xn * tau, zl, b.Zn * tau))
    Mg = _gen_matvec(tuple(m[:, None] for m in Minv),
                     (E2, F2, jnp.zeros_like(E2)))
    dot3 = lambda u, v: u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
    qaa, qab, qbb = cb(dot3(Ma, Ma)), cb(dot3(Ma, Mb)), cb(dot3(Mb, Mb))
    Ma_c = tuple(a[:, None] for a in Ma)   # (C,1) against (C,M) operands
    Mb_c = tuple(a[:, None] for a in Mb)
    qag, qbg, qgg = cm(dot3(Ma_c, Mg)), cm(dot3(Mb_c, Mg)), cm(dot3(Mg, Mg))
    if rescaled:
        # feqmod-branch nodes: per-cell LONGITUDINAL compression by A_zz
        # on top of the shared s(mT) map.  The momentum transform narrows
        # f_mod's (y - eta) width by ~A_zz (exactly 1 + lambda for mode
        # 4's isotropic A); without it the shared nodes grossly
        # under-resolve strong-bulk cells (measured 1e4 relative error at
        # bulkPi = -0.9 P, df_mode 4; cells where A stops being positive
        # definite instead reroute to the fallback via the detA <=
        # deta_min breakdown in _prepare_feqmod_cells).  A per-cell
        # SCALE cannot ride the addition-theorem split, so this branch
        # pays direct per-cell cosh/sinh like the VAH kernel; the
        # substitution is exact -- the zscale jacobian is folded into
        # f_mod below and the s(mT) jacobian into the weights.
        # width of f_mod in (y - eta): E_mod rises from its minimum by
        # ~ (mT delta / Azz)^2 / (2 E0), decaying over
        # delta_w ~ Azz sqrt(T_mod / mT) -- vs the shared map's
        # sqrt(T_ref / mT) -- so the extra compression is
        # Azz * sqrt(T_mod / T_ref-ish); use T (~T_ref) as the base the
        # s(mT) map was built for.  Mode 4 has T_mod = T (pure Azz).
        # bounded + sanitized: inert pad cells carry extrapolated df
        # coefficients (T = 1 GeV) that can drive Azz to inf/NaN, and a
        # non-finite cosh argument poisons the whole chunk through the
        # 0-mask multiply (inf * 0 = NaN); the upper bound keeps
        # cosh(zscale * s * eta_max) finite in f32
        # Azz <= 0 means A is indefinite even when detA > deta_min (two
        # negative eigenvalues): the compression factor is meaningless
        # there, so revert those cells to the shared map (zscale ~ 1)
        # instead of letting the clip floor collapse their node span.
        Azz = c["A"][5]
        Azz = jnp.where(Azz > 1e-3, Azz, 1.0)
        zscale = Azz * jnp.sqrt(jnp.clip(c["T_mod"], 1e-6, None) / c["T"])
        zscale = jnp.clip(jnp.nan_to_num(zscale, nan=1.0, posinf=1.0,
                                         neginf=1.0), 1e-3, 10.0)
        yf = lrf.flow_rapidity(tau, c["ut"], c["un"])
        delta_s = (yf[:, None, None, None]
                   + zscale[:, None, None, None]
                   * grid.eta[None, :, None, None] * s_flat[None, None])
        # ONE full-rank exp instead of the cosh/sinh pair: with
        # E = e^delta and R = 1/E, every cosh/sinh-bilinear composite
        # refactors into E/R (and E^2/R^2) coefficients hoisted per cell
        # or per (cell, m) -- ch = (E+R)/2, sh = (E-R)/2, ch^2 =
        # (E^2+R^2+2)/4, sh^2 = (E^2+R^2-2)/4, ch sh = (E^2-R^2)/4.  The
        # delta_s nodes are full-rank (C, R, S, M) in rescaled mode (the
        # per-cell zscale cannot ride the addition-theorem split), so the
        # saved transcendental is a full-rank op (cosh overflow -> inf is
        # preserved: E or R overflows identically).  NOTE a VAH-style
        # (C, R, S, P)-rank exp with phi-broadcast into the block was
        # tried and measured SLOWER (56.5 vs 64.2 clean-path Geval/s,
        # round 3): XLA materializes the broadcast+reshape here instead
        # of fusing it (the VAH kernel's bb() composites fuse because
        # they enter through mT-monomial fmas, not as transcendental
        # outputs).  Keep the full-rank exp.
        eq = jnp.exp(delta_s)
        rq = 1.0 / eq
        E2q, R2q = eq * eq, rq * rq
        dan_t = c["dan"] / tau
        pds_s = (sm(mTf) * (cb(0.5 * (c["dat"] + dan_t)) * eq
                            + cb(0.5 * (c["dat"] - dan_t)) * rq)
                 + cm(W1))
        t1 = ((0.25 * (qaa + qbb + 2.0 * qab)) * E2q
              + (0.25 * (qaa + qbb - 2.0 * qab)) * R2q
              + 0.5 * (qaa - qbb))
        t2 = 0.5 * (qag + qbg) * eq + 0.5 * (qag - qbg) * rq
    else:
        A1s, _, t_sh_s = lin_factors(ch_s, sh_s)
        pds_s = sm(mTf) * cr(A1s) + cm(W1)
        ch_q, sh_q = cr(ch_s), cr(sh_s)
        t1 = (ch_q * ch_q * qaa + 2.0 * (ch_q * sh_q) * qab
              + sh_q * sh_q * qbb)
        t2 = ch_q * qag + sh_q * qbg

    # |x|^2 = |Minv p|^2 via the expanded quadratic form (x = A^-1 p with
    # the 2-pass residual refinement folded into Minv, _refined_inverse --
    # the reference does <= 5 refinement passes per point)
    x2 = sm(mT2f) * t1 + 2.0 * sm(mTf) * t2 + qgg
    # unlike the sum-of-squares form, the expanded quadratic can overflow
    # to inf - inf = NaN on extreme (masked / breakdown-routed) cells;
    # saturate it so overflow means E_mod = inf -> f_mod = 0, the exact
    # behavior of the x^2 formulation
    # -inf can only come from overflow of a negative intermediate (the true
    # |x|^2 is huge positive), so it too must saturate to +inf -> f_mod = 0
    x2 = jnp.nan_to_num(x2, nan=jnp.inf, posinf=jnp.inf, neginf=jnp.inf)
    E_mod = jnp.sqrt(mass2_b + jnp.maximum(x2, 0.0))

    chem_mod = baryon_b * cb(c["alphaB_mod"])
    # NaN-free derivative under AD, bit-identical forward: see common.py
    # (per-cell reciprocal: a broadcast division would cost a full-rank
    # divide per momentum point)
    f_mod = scaled_fermi_bose(jnp.abs(c["renorm"])[:, None, :, None],  # (C,1,S,1)
                              E_mod * cb(1.0 / c["T_mod"]) - chem_mod, sign_b)
    if rescaled:
        # jacobian of the per-cell zscale node compression (the shared
        # s(mT) jacobian is applied to the reduced output instead)
        f_mod = f_mod * zscale[:, None, None, None]

    # ---- branch selection -------------------------------------------------
    if branch == "both":
        breakdown = c["breakdown"][:, None, None, None]
        if cfg.dimension == 3:
            narrow = ((c["detA"][:, None] < 0.01)
                      & (jnp.abs(delta_u) < c["detA"][:, None]))
            breakdown = breakdown | narrow[:, :, None, None]

        pds = jnp.where(breakdown, pds_u, pds_s)
        f = jnp.where(breakdown, f_fallback, f_mod)
    elif branch == "lin":
        pds, f = pds_u, f_fallback
    else:
        pds, f = pds_s, f_mod

    contrib = pds * f
    if cfg.outflow:
        # keep the compare + select here (unlike the linear/VAH kernels'
        # max(pds, 0) * f): the fallback df chain can be NaN/inf at
        # non-emitting points on degenerate coefficient tables, and the
        # where() doubles as the filter that zeroes them
        contrib = jnp.where(pds > 0.0, contrib, 0.0)

    mask = (valid & c["valid"]).astype(contrib.dtype)
    ok = c["renorm_ok"].astype(contrib.dtype)[:, None, :, None]
    contrib = contrib * cb(mask) * ok

    if not reduce:
        # pointwise consumers need common nodes across (cell, species)
        assert not rescaled, "reduce=False requires fixed eta nodes"
        return contrib                                 # (C,R,S,M)

    if cfg.dimension == 2:
        w = grid.eta_weight[None, :, None, None]
        out = jnp.sum(contrib * w, axis=(0, 1))        # (S,M)
        if rescaled:
            # jacobian of the eta -> shift + s(mT) eta substitution
            out = out * s_flat
        out = out.reshape(S, P, F, 1)
    else:
        out = jnp.sum(contrib, axis=0)                 # (R,S,M)
        out = jnp.transpose(out, (1, 2, 0)).reshape(S, P, F, grid.n_y)

    deg = species.degeneracy[:, None, None, None]
    return CF_PREFACTOR * deg * out


def routed_switch(cells, valid_mask, branch_fn):
    """Per-chunk routing between the three feqmod evaluation variants.

    The predicate reads the SAME in-program ``routing``/``breakdown``
    values the per-point mask uses, so the selected branch is always
    consistent with the select it replaces:

    * no valid cell routed          -> "mod"  (feqmod chain only)
    * every valid cell broken down  -> "lin"  (fallback chain only)
    * otherwise                     -> "both" (per-point select)

    Chunk composition follows the canonical group tree, so the routing --
    hence every output bit -- is identical for every device count.
    ``branch_fn(branch)`` must return the chunk's (small, reduced)
    contribution pytree; the switch output is that pytree, so the
    full-rank emission block never materializes across the branch
    boundary."""
    v = valid_mask & cells["valid"]
    any_route = jnp.any(cells["routing"] & v)
    all_bd = ~jnp.any(~cells["breakdown"] & v)
    idx = jnp.where(any_route, jnp.where(all_bd, 1, 2), 0).astype(jnp.int32)
    return lax.switch(idx, [lambda: branch_fn("mod"),
                            lambda: branch_fn("lin"),
                            lambda: branch_fn("both")])


def feqmod_kernel_mode(cfg: Config, n_cells: int) -> str:
    """Static kernel mode for a feqmod dispatch: "routed" (per-chunk
    lax.switch, the production default) or "both" (single branch-select
    kernel -- AD/vmap paths set feqmod_partition=0, and surfaces below
    feqmod_partition_min_cells skip routing so tiny parity fixtures keep
    pinning the exact both-branch artifact)."""
    if cfg.feqmod_partition and n_cells >= cfg.feqmod_partition_min_cells:
        return "routed"
    return "both"


def _routing_sort(cols, df_data, laguerre, cfg: Config) -> dict:
    """Stable in-kernel ordering of a cell block by its routing flag
    (clean first, fallback-routed last), so the scan chunks the routed
    switch sees are mostly PURE and take a single-branch arm -- on a
    mixed surface with scattered breakdown cells every chunk would
    otherwise contain both kinds and pay the both-branch kernel.

    Purely a performance hint: the switch re-derives the flags in-kernel
    from the (possibly re-fused) chunk data, so a cell that lands on the
    'wrong' side only costs speed, never correctness.  The permutation is
    a stable argsort of a function of the block's cells alone -- group
    blocks are canonical (parallel/mesh.py) -- so chunk composition, and
    hence every output bit, stays identical across device AND process
    counts."""
    c = prepare_cells(cols, cfg, df_data)
    c = _feqmod_transform(c, laguerre, cfg)
    key = (c["routing"] & c["valid"]).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    return {k: v[order] for k, v in cols.items()}


@partial(jax.jit, static_argnames=("cfg", "mode"))
def _feqmod_spectra_jit(cols, species, grid, df_data, laguerre, cfg: Config,
                        mode: str = "both"):
    per_cell = 4 * species.n_species * grid.n_pT * grid.n_phi * grid.n_eta * \
        (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    if mode == "routed" and cols["tau"].shape[0] > chunk:
        cols = _routing_sort(cols, df_data, laguerre, cfg)
    chunked, mask, _ = pad_and_chunk(cols, chunk)
    n_y_out = 1 if cfg.dimension == 2 else grid.n_y
    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit; the
    # carry is >= f32 even for bf16 inputs (common.accum_dtype)
    from .common import accum_dtype
    adt = accum_dtype(cols["tau"].dtype)
    acc0 = jnp.zeros((species.n_species, grid.n_pT, grid.n_phi, n_y_out),
                     dtype=adt) + carry_seed_zero(cols)

    rescaled = cfg.dimension == 2 and grid.eta_mT_rescale

    def body(acc, inp):
        chunk_cols, m = inp
        cells = prepare_cells(chunk_cols, cfg, df_data)
        cells = _prepare_feqmod_cells(cells, species, laguerre, cfg,
                                      eta_rescaled=rescaled)
        contrib_of = lambda b: _chunk_contribution_feqmod(
            cells, m, species, grid, cfg, branch=b)
        if mode == "routed":
            part = routed_switch(cells, m, contrib_of)
        else:
            part = contrib_of(mode)
        return acc + part.astype(adt), None

    if cfg.remat_scan:
        body = jax.checkpoint(body)
    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


@partial(jax.jit, static_argnames=("cfg",))
def _breakdown_probe_jit(cols, df_data, laguerre, cfg: Config):
    """(routing, breakdown) per cell -- a DIAGNOSTIC twin of the flags the
    kernel computes in-program (_feqmod_transform).  The production
    routing itself happens inside the kernel (routed_switch), where
    predicate and per-point select share one set of values by
    construction; this probe exists for benchmarks and tests that want
    the breakdown fraction without running the full kernel."""
    c = prepare_cells(cols, cfg, df_data)
    c = _feqmod_transform(c, laguerre, cfg)
    return c["routing"], c["breakdown"]


def _feqmod_spectra_dispatch(cols, species, grid, df_data, laguerre,
                             cfg: Config, mesh=None):
    """Feqmod spectra over raw cell columns, chunk-routed.

    The SIMD "both" kernel evaluates the momentum-transform branch AND the
    linearized fallback at every (cell, momentum) point, where the
    reference's scalar loop branches once per cell
    (emissionfunction_smooth_kernels.cpp:811-877).  The production kernel
    instead routes per CHUNK inside the compiled scan (routed_switch):
    clean chunks pay only the feqmod chain, all-breakdown chunks only the
    cheaper linearized chain, and only genuinely mixed chunks pay both.
    The routing is a function of the surface alone (canonical chunk
    boundaries, in-program flags), so results stay bit-identical across
    device counts and the reduction still runs through the canonical
    group tree."""
    from ..parallel.mesh import grouped_cell_reduce

    # compute thermal moments in the surface precision: a f64 laguerre
    # table against f32 cell columns (x64-enabled runtime) would promote
    # the chunk contribution and break the scan-carry dtype
    from ..io.tables import laguerre_in_precision
    laguerre = laguerre_in_precision(laguerre, cols["tau"].dtype)
    mode = feqmod_kernel_mode(cfg, cols["tau"].shape[0])
    return grouped_cell_reduce(
        lambda c, s, g, d, lag: _feqmod_spectra_jit(c, s, g, d, lag, cfg,
                                                    mode),
        cols, (species, grid, df_data, laguerre), cfg, mesh=mesh)


def smooth_spectra_feqmod(surface, species: SpeciesArrays, grid: MomentumGrid,
                          df_data: DeltafData, cfg: Config,
                          laguerre=None) -> jnp.ndarray:
    """dN/(pT dpT dphi dy) with modified equilibrium df (modes 3-4).

    Reduced through the canonical group tree (parallel/mesh.py) so the
    result is bit-identical to the mesh-sharded path; chunks are routed
    between the feqmod/fallback/both evaluation variants in-kernel
    (_feqmod_spectra_dispatch)."""
    if cfg.df_mode not in (3, 4):
        raise ValueError("smooth_spectra_feqmod handles df modes 3-4")
    if laguerre is None:
        from ..io.tables import laguerre_device
        laguerre = laguerre_device()
    cols = surface_columns(surface, cfg)
    return _feqmod_spectra_dispatch(cols, species, grid, df_data, laguerre,
                                    cfg)
