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
                     fermi_bose,
                     carry_seed_zero, accum_dtype,
                     effective_chunk)


def _momentum_monomials(species: SpeciesArrays, grid: MomentumGrid):
    """Species/momentum-side factors shared by all kernels."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (S,P)
    px = grid.pT[:, None] * jnp.cos(grid.phi)[None, :]                 # (P,F)
    py = grid.pT[:, None] * jnp.sin(grid.phi)[None, :]                 # (P,F)
    return mT, px, py


def _flat_monomials(species: SpeciesArrays, grid: MomentumGrid):
    """Momentum monomials for the lane-tiled (C, R, S, M = PT*PHI) block
    layout shared by the VH, VAH, and polzn kernels: returns
    (mT (S,P), mTf (S,M), pxf (M,), pyf (M,))."""
    S, P, F = species.n_species, grid.n_pT, grid.n_phi
    mT, px, py = _momentum_monomials(species, grid)
    mTf = jnp.broadcast_to(mT[:, :, None], (S, P, F)).reshape(S, P * F)
    return mT, mTf, px.reshape(P * F), py.reshape(P * F)


def _phi_broadcast(x, F: int):
    """(C, R[, s, p]) composite -> (C, R, s, p*F) block operand: broadcast
    the trailing pT axis over phi so it aligns with the flattened M = P*F
    minor dim.  Rank-preserving no-op for p = 1 composites."""
    if x.shape[-1] == 1:
        return x
    xb = jnp.broadcast_to(x[..., None], x.shape + (F,))
    return xb.reshape(x.shape[:-1] + (x.shape[-1] * F,))


def _block_delta(c: dict, grid: MomentumGrid, dimension: int):
    """Fixed-node Delta = (y - eta) at (C, R, 1, 1) block rank (2+1D: y = 0
    with eta the quadrature axis; 3+1D: y grid minus per-cell surface eta).
    The `+ 0.0 * tau` term seeds the cell axis so the operand is
    device-varying under shard_map."""
    if dimension == 2:
        return (-grid.eta[None, :, None, None]
                + 0.0 * c["tau"][:, None, None, None])
    return grid.y[None, :, None, None] - c["eta"][:, None, None, None]


def _reduce_cells_3d(x, S: int, P: int, F: int, n_y: int):
    """3+1D reduction of a (C, R, S, M) block: cell sum, then the
    (R, S, M) -> (S, P, F, n_y) transpose/reshape (R is the y grid)."""
    out = jnp.sum(x, axis=0)
    return jnp.transpose(out, (1, 2, 0)).reshape(S, P, F, n_y)


def _rapidity_factors(c: dict, grid: MomentumGrid, dimension: int):
    """cosh/sinh of (y - eta) per (cell, rapidity node), fixed-node form.

    2+1D: y = 0, eta is the quadrature axis.  3+1D: y is the grid axis,
    eta is the per-cell surface value.  Returns (ch, sh) of shape (C, R).
    (The mT-adaptive node remap has its own operand builder,
    _rescaled_eta_operands; the feqmod kernel builds its detA-scaled
    deltas inline.)
    """
    C = c["tau"].shape[0]
    if dimension == 2:
        delta = jnp.broadcast_to(-grid.eta[None, :], (C, grid.n_eta))
    else:
        delta = grid.y[None, :] - c["eta"][:, None]      # (C,R)
    return jnp.cosh(delta), jnp.sinh(delta)


def _chunk_contribution(c: dict, valid, species: SpeciesArrays,
                        grid: MomentumGrid, cfg: Config,
                        reduce: bool = True):
    """Spectra contribution of one cell chunk: (S, PT, PHI, Y_out).
    With reduce=False, returns the masked pointwise emission block
    p.dsigma * f at (C, R, S, M) instead -- no quadrature weights, no
    prefactor/degeneracy -- consumed by the dN/dX spacetime kernel.

    TPU layout optimization: the elementwise block is computed as
    (C, R, S, M) with the transverse momentum grid flattened to
    M = PT * PHI, so the two minor dims (S, M) map onto full
    (sublane, lane) tiles -- the naive (..., PHI=24, Y=21) layout leaves
    ~5/6 of the 128 vector lanes idle, which profiling showed to be the
    actual limiter (not transcendentals)."""
    S = species.n_species
    P, F = grid.n_pT, grid.n_phi
    M = P * F
    cr = lambda x: x[:, :, None, None]                 # (C,R)
    cm = lambda x: x[:, None, None, :]                 # (C,M)
    sm = lambda x: x[None, None, :, :]                 # (S,M)

    mT, mTf, pxf, pyf = _flat_monomials(species, grid)
    mT2f = mTf * mTf
    mTpxf = mTf * pxf[None, :]
    mTpyf = mTf * pyf[None, :]

    tau = c["tau"]
    shear_on, _, diff_on = df_switches(cfg)

    # fold the validity mask into the per-cell dsigma fields: pds (and so
    # the contribution) is exactly 0 on invalid / pad cells, replacing a
    # full-rank mask multiply per momentum point (bit-identical -- valid
    # cells multiply by 1.0, masked contributions were (finite) * 0 = 0)
    mask = (valid & c["valid"]).astype(tau.dtype)
    c = dict(c)
    for k in ("dat", "dan", "dax", "day"):
        c[k] = c[k] * mask

    # NOTE (round 4, negative result): folding the per-cell shear df
    # coefficient into the pi columns (removing the full-rank
    # cb(coef) * pipp multiply) was tried and MEASURED: paired
    # same-session headline runs lost 2.7% (83.6 vs 86.0 Geval/s), and
    # the dN/dX df1 delta (+3%) sat inside the rig's session noise
    # (identical-code df3 drew 59.4 vs 62.1 across adjacent runs).  XLA
    # evidently already places the scalar multiply optimally; keep the
    # simpler unfolded chain.  docs/PERF.md "dN/dX df1" entry.

    W1 = c["dax"][:, None] * pxf[None] + c["day"][:, None] * pyf[None]
    W2 = c["ux"][:, None] * pxf[None] + c["uy"][:, None] * pyf[None]
    C4 = ((c["pixx"][:, None] * (pxf * pxf)[None]
           + c["piyy"][:, None] * (pyf * pyf)[None]
           + 2.0 * c["pixy"][:, None] * (pxf * pyf)[None])
          if shear_on else None)
    D2 = (c["Vx"][:, None] * pxf[None] + c["Vy"][:, None] * pyf[None]
          if diff_on else None)

    rescaled = cfg.dimension == 2 and grid.eta_mT_rescale
    if rescaled:
        # mT-adaptive eta-node remap (exact substitution): the quadrature
        # evaluates at eta_phys = y_flow(cell) + s(mT) * eta_r with
        # s = sqrt(T_ref / max(mT, T_ref)), centering the nodes on the
        # integrand's peak (longitudinal-flow rapidity) and matching their
        # span to its width sigma ~ sqrt(T / (mT u^tau)) -- a fixed node
        # table loses up to 12% at pT = 4 GeV (n_eta = 64, measured).  The
        # jacobian s multiplies the weights in the reduction below.  Every
        # cosh/sinh(Delta)-linear composite X = ch*a + sh*b splits by the
        # addition theorem against (chr, shr) = (cosh, sinh)(s eta_r) into
        # X = chr*(chs*a - shs*b) + shr*(shs*a - chs*b), which preserves
        # the per-point fused-multiply-add structure at ~2x the fma count
        # (the kernel is transcendental/layout-bound, not fma-bound).
        ops = _rescaled_eta_operands(c, species, grid, S, P, F, M)
        s_flat = ops[-1]
        pds, pdotu, pipp, Vp = _rescaled_vh_terms(c, ops, W1, W2, C4, D2,
                                                  pxf, pyf)
    else:
        ch, sh = _rapidity_factors(c, grid, cfg.dimension)  # (C,R)
        t_sh = sh * tau[:, None]

        A1 = ch * c["dat"][:, None] + sh * (c["dan"] / tau)[:, None]
        B1 = ch * c["ut"][:, None] - sh * (tau * c["un"])[:, None]

        # ---- (C, R, S, M) block
        pds = sm(mTf) * cr(A1) + cm(W1)
        pdotu = sm(mTf) * cr(B1) - cm(W2)
        pipp = Vp = None
        if shear_on:
            C1 = (ch * ch * c["pitt"][:, None]
                  + t_sh * t_sh * c["pinn"][:, None]
                  - 2.0 * ch * t_sh * c["pitn"][:, None])
            C2 = -2.0 * (ch * c["pitx"][:, None] - t_sh * c["pixn"][:, None])
            C3 = -2.0 * (ch * c["pity"][:, None] - t_sh * c["piyn"][:, None])
            pipp = (sm(mT2f) * cr(C1) + sm(mTpxf) * cr(C2)
                    + sm(mTpyf) * cr(C3) + cm(C4))
        if diff_on:
            D1 = ch * c["Vt"][:, None] - t_sh * c["Vn"][:, None]
            Vp = sm(mTf) * cr(D1) - cm(D2)

    sb = lambda x: x[None, None, :, None]              # (S,)
    sign_b = sb(species.sign)
    baryon_b = sb(species.baryon)
    mass2_b = sb(species.mass ** 2)
    cb = lambda x: x[:, None, None, None]              # (C,)
    # per-cell reciprocal: a broadcast division would cost a full-rank
    # divide per momentum point
    arg = pdotu * cb(1.0 / c["T"])
    if cfg.include_baryon:
        arg = arg - baryon_b * cb(c["alphaB"])

    feq = fermi_bose(arg, sign_b)   # NaN-free derivative, see common.py
    feqbar = 1.0 - sign_b * feq

    df = _linear_df_flat(cfg, c["df"], c, pdotu, pipp, Vp, mass2_b, baryon_b,
                         feqbar)
    # feq * (1 + df) written as one full-rank fma (+4% measured, round 4)
    f = feq if df is None else feq * df + feq

    if cfg.outflow:
        # max(p.ds, 0) * f == where(p.ds > 0, p.ds * f, 0) for finite f
        # (fermi_bose and the df chain are NaN-free): one op instead of a
        # compare + select on the full-rank block
        contrib = jnp.maximum(pds, 0.0) * f
    else:
        contrib = pds * f

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
        out = _reduce_cells_3d(contrib, S, P, F, grid.n_y)

    deg = species.degeneracy[:, None, None, None]
    return CF_PREFACTOR * deg * out


# reference temperature of the eta-node remap's s(mT) = sqrt(T_ref/mT)
# span matching; shared by smooth, feqmod, and polzn
ETA_REMAP_T_REF = 0.15


def _rescaled_vh_terms(c: dict, ops, W1, W2, C4, D2, pxf, pyf):
    """(pds, pdotu, pipp, Vp) in the (C, R, S, M) block from the remapped
    eta operands -- the addition-theorem split shared verbatim by the
    linear-df and feqmod kernels (see _chunk_contribution for the
    derivation and sign conventions).  C4 / D2 arrive as None when the
    shear / diffusion switches are off (df_switches); the corresponding
    output is None and its composite chain is absent from the kernel."""
    CHR, SHR, CHR2, SHR2, CHRSHR, chs, shs, _ = ops
    cm = lambda x: x[:, None, None, :]
    cb4 = lambda x: x[:, None, None, None]
    tau = c["tau"]
    dan_t = c["dan"] / tau
    tun = tau * c["un"]
    A1a = cb4(chs * c["dat"] - shs * dan_t)
    A1b = cb4(shs * c["dat"] - chs * dan_t)
    B1a = cb4(chs * c["ut"] + shs * tun)
    B1b = cb4(shs * c["ut"] + chs * tun)
    pds = CHR * A1a + SHR * A1b + cm(W1)
    pdotu = CHR * B1a + SHR * B1b - cm(W2)

    pipp = Vp = None
    if C4 is not None:
        t_pinn = tau * tau * c["pinn"]
        t_pitn = tau * c["pitn"]
        C2a = cb4(-2.0 * (chs * c["pitx"] + shs * tau * c["pixn"]))
        C2b = cb4(-2.0 * (shs * c["pitx"] + chs * tau * c["pixn"]))
        C3a = cb4(-2.0 * (chs * c["pity"] + shs * tau * c["piyn"]))
        C3b = cb4(-2.0 * (shs * c["pity"] + chs * tau * c["piyn"]))
        chshs2 = 2.0 * chs * shs
        C1a = cb4(chs * chs * c["pitt"] + shs * shs * t_pinn
                  + chshs2 * t_pitn)
        C1b = cb4(shs * shs * c["pitt"] + chs * chs * t_pinn
                  + chshs2 * t_pitn)
        C1c = cb4(chshs2 * (c["pitt"] + t_pinn)
                  + 2.0 * (chs * chs + shs * shs) * t_pitn)
        pxm = pxf[None, None, None, :]
        pym = pyf[None, None, None, :]
        pipp = (CHR2 * C1a + SHR2 * C1b + CHRSHR * C1c
                + (CHR * C2a + SHR * C2b) * pxm
                + (CHR * C3a + SHR * C3b) * pym + cm(C4))
    if D2 is not None:
        tVn = tau * c["Vn"]
        D1a = cb4(chs * c["Vt"] + shs * tVn)
        D1b = cb4(shs * c["Vt"] + chs * tVn)
        Vp = CHR * D1a + SHR * D1b - cm(D2)
    return pds, pdotu, pipp, Vp


def _rescaled_eta_operands(c: dict, species, grid, S: int, P: int, F: int,
                           M: int):
    """Block operands + per-cell boost pair + jacobian for the 2+1D
    mT-adaptive eta-node remap eta_phys = y_flow(cell) + s(mT) * eta_r
    (see _chunk_contribution).  Returns (CHR, SHR, CHR2, SHR2, CHRSHR)
    with logical shape (1, R, S, M) (loop-invariant, hoisted out of the
    chunk scan), (chs, shs) = (cosh, sinh)(-y_flow) per cell, and the
    s(mT) jacobian flattened to (S, M)."""
    mT, _, _ = _momentum_monomials(species, grid)
    T_REF = jnp.asarray(ETA_REMAP_T_REF, mT.dtype)
    s_sp = jnp.sqrt(T_REF / jnp.maximum(mT, T_REF))        # (S,P)
    se = s_sp[:, :, None] * grid.eta[None, None, :]        # (S,P,R)
    chr_, shr_ = jnp.cosh(se), jnp.sinh(se)
    R = grid.n_eta

    def smr(x):  # (S,P,R) -> (1,R,S,M)
        xb = jnp.broadcast_to(x[:, :, None, :], (S, P, F, R))
        return jnp.transpose(xb.reshape(S, M, R), (2, 0, 1))[None]

    CHR = smr(mT[:, :, None] * chr_)
    SHR = smr(mT[:, :, None] * shr_)
    CHR2 = smr((mT * mT)[:, :, None] * chr_ * chr_)
    SHR2 = smr((mT * mT)[:, :, None] * shr_ * shr_)
    CHRSHR = smr((mT * mT)[:, :, None] * chr_ * shr_)

    # per-cell longitudinal-flow recentering: the integrand peaks at
    # Delta = y_flow = atanh(tau u^eta / u^tau), so the node map's shift is
    # -y_flow; (chs, shs) = (cosh, sinh)(-y_flow)
    u0p = jnp.sqrt(1.0 + c["ux"] ** 2 + c["uy"] ** 2)
    chs = c["ut"] / u0p
    shs = -c["tau"] * c["un"] / u0p
    s_flat = jnp.broadcast_to(s_sp[:, :, None], (S, P, F)).reshape(S, M)
    return CHR, SHR, CHR2, SHR2, CHRSHR, chs, shs, s_flat


def df_switches(cfg: Config) -> tuple[bool, bool, bool]:
    """(shear_on, bulk_on, diff_on) as STATIC trace-time predicates.

    The reference zero-fills switched-off viscous blocks and still runs
    the full arithmetic on them (emissionfunction.cpp:1420-1499); here the
    switches are static config, so the corresponding composites and df
    terms are structurally absent from the compiled kernel -- the same
    exact-zero terms removed from the sum, bit-identical output, fewer
    fma per point (diffusion alone is ~6 full-rank fma)."""
    return (bool(cfg.include_shear_deltaf),
            bool(cfg.include_bulk_deltaf),
            bool(cfg.include_baryon and cfg.include_baryondiff_deltaf))


def _linear_df_flat(cfg: Config, df, c, pdotu, pipp, Vp, mass2_b, baryon_b,
                    feqbar):
    """Linear viscous correction, df modes 1 (Grad 14-moment) and
    2 (Chapman-Enskog), with (C, R, S, M) block broadcasting (reference:
    emissionfunction_smooth_kernels.cpp:214-242, 299-326; formulas
    documented in SURVEY Appendix B).  pipp/Vp are None when the shear /
    diffusion switches are off (df_switches); those terms drop out of the
    compiled chain entirely.  Returns None when every term is off."""
    cb = lambda x: x[:, None, None, None]
    shear_on, bulk_on, diff_on = df_switches(cfg)
    terms = []

    if cfg.df_mode == 1:
        if shear_on:
            terms.append(cb(0.5 / (c["T"] ** 2 * (c["E"] + c["P"]))) * pipp)
        if bulk_on:
            # bulkPi folded into the hoisted per-cell / per-(cell, species)
            # coefficients instead of a full-rank multiply per point
            bulkPi = c["bulkPi"]
            bulk0 = cb((df.c0 - df.c2) * bulkPi) * mass2_b
            bulk1 = cb(df.c1 * bulkPi) * baryon_b
            bulk2 = cb((4.0 * df.c2 - df.c0) * bulkPi)
            terms.append(bulk0 + (bulk1 + bulk2 * pdotu) * pdotu)
        if diff_on:
            terms.append((cb(df.c3) * baryon_b + cb(df.c4) * pdotu) * Vp)
    elif cfg.df_mode == 2:
        # The CE chain is regrouped as  R_TERM/(u.p) + P_TERM*(u.p) + C_TERM
        # with every per-cell / per-(cell, species) coefficient (bulkPi,
        # 1/betabulk, m^2, baryon) folded OUTSIDE the full-rank block --
        # same math as the reference's per-point form
        # (emissionfunction_smooth_kernels.cpp:313-321), one reciprocal and
        # ~8 instead of ~12 full-rank ops per momentum point:
        #   shear:  pi:pp / (2 betapi T (u.p))                  -> R
        #   bulk:   [ (F/T^2 + 1/3T)(u.p) + b G - m^2/(3T(u.p)) ] Pi/betabulk
        #                                                        -> P, C, R
        #   diff:   [ nB/(E+P) - b/(u.p) ] V.p / betaV           -> C, R
        if not (shear_on or bulk_on or diff_on):
            return None
        r = 1.0 / pdotu
        r_term = p_term = c_term = None
        acc = lambda a, b: b if a is None else a + b
        if shear_on:
            r_term = cb(0.5 / (df.betapi * c["T"])) * pipp
        if bulk_on:
            bulkPi = c["bulkPi"]
            inv_bb = 1.0 / df.betabulk
            b2 = inv_bb / (3.0 * c["T"])
            p_term = cb((df.F / c["T"] ** 2 * inv_bb + b2) * bulkPi)
            c_term = cb(df.G * inv_bb * bulkPi) * baryon_b
            r_term = acc(r_term, -(cb(b2 * bulkPi) * mass2_b))
        if diff_on:
            inv_bV = cb(1.0 / df.betaV)
            c_term = acc(c_term, cb(c["baryon_enthalpy_ratio"]
                                    / df.betaV) * Vp)
            r_term = acc(r_term, -(inv_bV * baryon_b) * Vp)
        out = r_term * r
        if p_term is not None:
            out = out + p_term * pdotu
        if c_term is not None:
            out = out + c_term
        out = feqbar * out
        if cfg.regulate_deltaf:
            out = jnp.clip(out, -1.0, 1.0)
        return out
    else:
        raise ValueError("linear df kernel supports df_mode 1 or 2")

    if not terms:
        return None
    out = feqbar * sum(terms[1:], terms[0])
    if cfg.regulate_deltaf:
        out = jnp.clip(out, -1.0, 1.0)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _smooth_spectra_jit(cols, species, grid, df_data, cfg: Config):
    per_cell = species.n_species * grid.n_pT * grid.n_phi * grid.n_eta * \
        (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    chunked, mask, n_chunks = pad_and_chunk(cols, chunk)
    n_y_out = 1 if cfg.dimension == 2 else grid.n_y
    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit; the
    # carry is >= f32 even for bf16 inputs (accum_dtype)
    adt = accum_dtype(cols["tau"].dtype)
    acc0 = jnp.zeros((species.n_species, grid.n_pT, grid.n_phi, n_y_out),
                     dtype=adt) + carry_seed_zero(cols)

    def body(acc, inp):
        chunk_cols, m = inp
        cells = prepare_cells(chunk_cols, cfg, df_data)
        part = _chunk_contribution(cells, m, species, grid, cfg)
        return acc + part.astype(adt), None

    if cfg.remat_scan:
        body = jax.checkpoint(body)
    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def smooth_spectra(surface, species: SpeciesArrays, grid: MomentumGrid,
                   df_data: DeltafData, cfg: Config) -> jnp.ndarray:
    """dN/(pT dpT dphi dy) with linear df (modes 1-2), shape
    (S, n_pT, n_phi, n_y_out).

    The fused-XLA kernel is the production path; the hand-written Pallas
    kernel (kernels/pallas_smooth.py) is a validated opt-in experiment
    that currently loses to it (see its docstring).

    The cell reduction runs through the canonical group tree
    (parallel/mesh.grouped_cell_reduce): bit-identical to the mesh-sharded
    path, with per-group dispatches bounding single-call runtime (the
    successor of the cell_slab splitting)."""
    if cfg.df_mode not in (1, 2):
        raise ValueError("smooth_spectra handles df modes 1-2; use "
                         "smooth_spectra_feqmod for modes 3-4")
    cols = surface_columns(surface, cfg)
    from .pallas_smooth import pallas_available, smooth_spectra_pallas
    from ..parallel.mesh import grouped_cell_reduce
    # the pallas experiment has no eta-node remap: never let it silently
    # replace the mT-adaptive quadrature on native 2+1D grids (fixed nodes
    # lose up to ~12% at pT = 4 GeV there, see _chunk_contribution)
    use_pallas = (pallas_available(cfg, surface.tau.dtype)
                  and not (cfg.dimension == 2 and grid.eta_mT_rescale))
    kern = smooth_spectra_pallas if use_pallas else _smooth_spectra_jit
    return grouped_cell_reduce(lambda c, s, g, d: kern(c, s, g, d, cfg),
                               cols, (species, grid, df_data), cfg)
