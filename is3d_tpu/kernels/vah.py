"""Anisotropic-hydro (VAH) smooth Cooper-Frye spectra, MODE 2 surfaces.

TPU-native re-derivation of calculate_dN_pTdpTdphidy_VAH_PL (reference:
emissionfunction_smooth_kernels.cpp:2140-2393).  The anisotropic distribution

    f_a = 1 / (exp(sqrt((u.p)^2 + xi_L (z.p)^2) / Lambda) + sign),
    xi_L = 1/a_L^2 - 1

with residual 14-moment corrections

    df = c3 (z.p)(W.p) + c4 pi_perp : pp   (shear)
       + (c0 m^2 + c1 (z.p)^2 + c2 (u.p)^2) bulkPi   (bulk)

and regulation f = f_a (1 + clamp(fabar df, -1, 1)).

Notes vs the reference:
* its VAH call sites are commented out (emissionfunction.cpp:1650-1656) --
  and would not compile if revived (the dispatcher never allocates the
  full-10 pi_perp SoA arrays the kernel takes) -- and its eta quadrature
  multiplies the trapezoid weight by delta_eta a second time (:2237-2245 --
  the weight column of tables/eta/* already contains delta_eta); we use the
  weights once, like the VH kernel (:79-80).  Golden parity < 1e-6 against
  a patched oracle build that supplies the missing plumbing
  (tests/test_oracle_parity.py::test_parity_vah_smooth_kernel),
* per-cell df coefficients c0..c4 are optional inputs (zero -> pure f_a);
  the reference reads them from FO_surf fields that its mode-2 reader never
  fills.
* W^mu orthogonality completion Wt = (ux Wx + uy Wy) ut / u0^2, Wn = Wt un/ut
  (reference :2247-2251).
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
from .common import (pad_and_chunk, effective_chunk, carry_seed_zero,
                     fermi_bose)
from .smooth import (_flat_monomials, _phi_broadcast, _block_delta,
                     _reduce_cells_3d)
from ..physics import lrf


def _chunk_vah_spectra(c, valid, species, grid, cfg, reduce: bool = True):
    """Spectra contribution of one cell chunk: (S, PT, PHI, Y_out).
    With reduce=False, returns the masked pointwise emission block
    p.dsigma * f at (C, R, S, M) -- no weights or prefactor -- consumed by
    the dN/dX spacetime kernel (fixed eta nodes only).

    Layout: the elementwise block runs as (C, R, S, M = PT*PHI) so the two
    minor dims map onto full (sublane, lane) vector tiles -- same layout as
    the VH kernel (smooth._chunk_contribution), and for the same measured
    reason: the naive (C, S, PT, PHI, R) layout leaves 5/8 of the 128
    lanes idle (R = 48 minor), which bounds the kernel at ~39 Geval/s while
    a transcendental-stub probe shows sqrt/exp/cosh/sinh are fully hidden.
    Every composite that is linear/quadratic in (p^tau, tau p^eta) =
    mT (cosh, sinh)(Delta) is built at (C, R[, S, P]) rank and enters the
    full-rank block through an mT-monomial fma.

    2+1D eta quadrature: nodes rescaled per (cell, species, pT) by
    s = a_L * sqrt(Lambda / max(mT, Lambda)) -- an exact substitution
    (jacobian folded into the reduction).  The f_a integrand's (y - eta)
    width is sigma ~ a_L sqrt(Lambda/mT) (exponent (mT/Lambda)
    (1 + D^2/(2 a_L^2)) near the peak), so both small a_L and large mT
    narrow it; a fixed node table under-resolves the high-pT tail (the
    reference carries a 9..4001-point eta-table ladder, tables/eta/ +
    iS3D.cpp:161-167, for exactly this trade).  With the mT term the
    worst-case quadrature error at the pT = 4 GeV grid edge drops from
    6e-2 (a_L-only rescale, n_eta = 48) to < 1e-6 (measured vs a
    2048-node reference).  The node span is recentered on the cell's
    longitudinal-flow rapidity y_flow = atanh(tau u^eta / u^tau) (the f_a
    argument peaks there); without it a flow-shifted peak at high pT
    falls outside the s-narrowed span.
    """
    S, P, F = species.n_species, grid.n_pT, grid.n_phi
    M = P * F
    mT, mTf, pxf, pyf = _flat_monomials(species, grid)

    cb = lambda x: x[:, None, None, None]              # (C,) -> block
    cm = lambda x: x[:, None, None, :]                 # (C,M)
    sm = lambda x: x[None, None, :, :]                 # (S,M)
    sb = lambda x: x[None, None, :, None]              # (S,)
    MT = sm(mTf)
    MT2 = sm(mTf * mTf)
    bb = lambda x: _phi_broadcast(x, F)

    tau = c["tau"]
    # fold the validity mask into the per-cell dsigma fields: pds (and so
    # the contribution) is exactly 0 on invalid / pad cells, replacing the
    # full-rank mask multiply per momentum point (bit-identical -- valid
    # cells multiply by 1.0, masked contributions were (finite) * 0 = 0)
    mask = valid.astype(tau.dtype)
    c = dict(c)
    for k in ("dat", "dan", "dax", "day"):
        c[k] = c[k] * mask
    remap = cfg.dimension == 2 and grid.eta_mT_rescale
    if remap:
        lam_cp = c["Lambda"][:, None, None]
        s_cp = c["aL"][:, None, None] * jnp.sqrt(
            lam_cp / jnp.maximum(mT[None, :, :], lam_cp))    # (C,S,P)
        y_flow = lrf.flow_rapidity(tau, c["ut"], c["un"])
        delta = (y_flow[:, None, None, None]
                 - s_cp[:, None, :, :] * grid.eta[None, :, None, None])
    else:
        delta = _block_delta(c, grid, cfg.dimension)           # (C,R,1,1)
    ch = jnp.cosh(delta)
    sh = jnp.sinh(delta)

    c_ = cb
    t_sh = sh * c_(tau)

    # --- composites at (C, R[, S, P]) rank: coefficients of mT / mT^2.
    # NOTE a variant that folds the mT monomials and 1/Lambda into these
    # composites (removing ~8 full-rank multiplies) measured SLOWER
    # (36 vs 49 Geval/s on a v5e chip): XLA schedules the hoisted
    # loop-invariant (S, M) monomial operands better than deeper
    # cell-varying composite chains.  Keep the monomials in the block.
    A1 = ch * c_(c["dat"]) + sh * c_(c["dan"] / tau)           # p.dsigma
    B1 = ch * c_(c["ut"]) - sh * c_(tau * c["un"])             # u.p
    Z1 = ch * c_(c["zt"]) - sh * c_(tau * c["zn"])             # z.p / mT
    xiL = 1.0 / (c["aL"] ** 2) - 1.0
    ZZ = c_(xiL) * Z1 * Z1                                     # (Ea^2-u.p^2)/mT^2
    inv_lam = cb(1.0 / c["Lambda"])

    # --- transverse composites (C, M)
    W1 = c["dax"][:, None] * pxf[None] + c["day"][:, None] * pyf[None]
    W2 = c["ux"][:, None] * pxf[None] + c["uy"][:, None] * pyf[None]

    sign_b = sb(species.sign)
    mass2_b = sb(species.mass ** 2)

    # --- full-rank block (C, R, S, M): a handful of fmas + exp/sqrt/div
    pds = MT * bb(A1) + cm(W1)
    pdotu = MT * bb(B1) - cm(W2)
    Ea = jnp.sqrt(pdotu * pdotu + MT2 * bb(ZZ))
    # NaN-free derivative under AD, bit-identical forward: see common.py
    fa = fermi_bose(Ea * inv_lam, sign_b)
    fabar = 1.0 - sign_b * fa

    df = None
    if cfg.include_shear_deltaf:
        # c4 * pi_perp:pp with c4 folded into the composites
        c4c = c_(c["c4"])
        C1 = c4c * (ch * ch * c_(c["pitt"]) + t_sh * t_sh * c_(c["pinn"])
                    - 2.0 * ch * t_sh * c_(c["pitn"]))
        C2 = -2.0 * c4c * (ch * c_(c["pitx"]) - t_sh * c_(c["pixn"]))
        C3 = -2.0 * c4c * (ch * c_(c["pity"]) - t_sh * c_(c["piyn"]))
        C4 = c["c4"][:, None] * (
            c["pixx"][:, None] * (pxf * pxf)[None]
            + c["piyy"][:, None] * (pyf * pyf)[None]
            + 2.0 * c["pixy"][:, None] * (pxf * pyf)[None])    # (C,M)
        # c3 (z.p)(W.p) = mT^2 (c3 Z1 E1) - mT (c3 Z1) WW
        E1 = ch * c_(c["Wt"]) - sh * c_(tau * c["Wn"])
        WW = c["Wx"][:, None] * pxf[None] + c["Wy"][:, None] * pyf[None]
        Z3 = c_(c["c3"]) * Z1
        low2 = C1 + Z3 * E1                  # coefficient of mT^2
        df = (MT2 * bb(low2) + (MT * bb(C2)) * pxf[None, None, None, :]
              + (MT * bb(C3)) * pyf[None, None, None, :]
              + cm(C4) - (MT * bb(Z3)) * cm(WW))
    if cfg.include_bulk_deltaf:
        # (c0 m^2 + c1 (z.p)^2 + c2 (u.p)^2) * bulkPi
        bulk0 = cb(c["bulkPi"] * c["c0"]) * mass2_b
        bulk1 = MT2 * bb(c_(c["bulkPi"] * c["c1"]) * Z1 * Z1)
        bulk2 = cb(c["bulkPi"] * c["c2"]) * pdotu * pdotu
        dfb = bulk0 + bulk1 + bulk2
        df = dfb if df is None else df + dfb

    if df is None:
        f = fa
    elif cfg.regulate_deltaf:
        # fa*(1+clip) as one full-rank fma (same +4% pattern as the
        # linear kernel's feq*(1+df) rewrite, round 4)
        f = fa * jnp.clip(fabar * df, -1.0, 1.0) + fa
    else:
        f = fa * (1.0 + fabar * df)

    if cfg.outflow:
        # max(p.ds, 0) * f == where(p.ds > 0, p.ds * f, 0) for finite f:
        # one op instead of a compare + select on the full-rank block
        contrib = jnp.maximum(pds, 0.0) * f
    else:
        contrib = pds * f

    if not reduce:
        # pointwise consumers need common nodes across (cell, species);
        # the validity mask is already folded into pds
        assert not remap, "reduce=False requires fixed eta nodes"
        return contrib                                 # (C,R,S,M)

    if cfg.dimension == 2:
        w = grid.eta_weight[None, :, None, None]
        if remap:
            # jacobian of the eta-node rescale (exact substitution)
            contrib = contrib * (w * bb(s_cp[:, None, :, :]))
        else:
            contrib = contrib * w
        out = jnp.sum(contrib, axis=(0, 1)).reshape(S, P, F, 1)
    else:
        out = _reduce_cells_3d(contrib, S, P, F, grid.n_y)

    deg = species.degeneracy[:, None, None, None]
    return CF_PREFACTOR * deg * out


@partial(jax.jit, static_argnames=("cfg",))
def _vah_jit(cols, species, grid, cfg: Config):
    per_cell = species.n_species * grid.n_pT * grid.n_phi * grid.n_eta * \
        (1 if cfg.dimension == 2 else grid.n_y)
    chunk = effective_chunk(cfg.cell_chunk, cols["tau"].shape[0], per_cell)
    chunked, mask, _ = pad_and_chunk(cols, chunk)
    n_y_out = 1 if cfg.dimension == 2 else grid.n_y
    # seed the carry from the (possibly device-varying) surface data so the
    # scan carry type matches under shard_map as well as plain jit; the
    # carry is >= f32 even for bf16 inputs (common.accum_dtype)
    from .common import accum_dtype
    adt = accum_dtype(cols["tau"].dtype)
    acc0 = jnp.zeros((species.n_species, grid.n_pT, grid.n_phi, n_y_out),
                     dtype=adt) + carry_seed_zero(cols)

    def body(acc, inp):
        chunk_cols, m = inp
        c = _complete_vah_cells(chunk_cols)
        part = _chunk_vah_spectra(c, m, species, grid, cfg)
        return acc + part.astype(adt), None

    if cfg.remat_scan:
        body = jax.checkpoint(body)
    acc, _ = lax.scan(body, acc0, (chunked, mask))
    return acc


def _complete_vah_cells(chunk_cols: dict) -> dict:
    """Per-cell completion for the VAH kernels: u^tau, the longitudinal
    basis vector z = (zt, 0, 0, zn), and the W^mu orthogonality completion
    (reference: emissionfunction_smooth_kernels.cpp:2247-2251)."""
    c = dict(chunk_cols)
    tau = c["tau"]
    ut = lrf.u_tau(c["ux"], c["uy"], c["un"], tau)
    u0 = jnp.sqrt(1.0 + c["ux"] ** 2 + c["uy"] ** 2)
    c["ut"] = ut
    c["zt"] = tau * c["un"] / u0
    c["zn"] = ut / (u0 * tau)
    c["Wt"] = (c["ux"] * c["Wx"] + c["uy"] * c["Wy"]) * ut / (u0 * u0)
    c["Wn"] = c["Wt"] * c["un"] / ut
    return c


def _col_provably_zero(x) -> bool:
    """True iff the column is absent (None) or a concrete array of exact
    zeros.  Tracers (vmap batching, AD) cannot be proven zero, so they
    gate nothing -- batched runs keep the chains and gradients w.r.t. a
    zero coefficient column stay correct."""
    if x is None:
        return True
    if isinstance(x, jax.core.Tracer):
        return False
    import numpy as np
    return not bool(np.any(np.asarray(x)))


def effective_vah_cfg(cols, cfg: Config) -> Config:
    """Drop VAH residual-df chains whose coefficient columns are exact
    zeros from the compiled kernel (host-side probe; bit-identical output).

    The reference zero-fills c0..c4 -- no mode-2/3 reader fills them, its
    own included (they are read from FO_surf fields `new FO_surf[]` never
    initializes) -- and would run the full shear+bulk arithmetic on the
    zeros; here the switches are static config, so a provably-zero chain
    is structurally absent (same pattern as smooth.df_switches for the
    VH kernels).  Measured: 48.6 -> 99.6 Geval/s on the production case
    (no c columns) on one v5e chip.  Set ``cfg.vah_df_gate = 0`` to force
    the ungated program (the gate-equivalence test does)."""
    if not (cfg.vah_df_gate and cfg.mode in (2, 3)):
        return cfg
    shear = bool(cfg.include_shear_deltaf) and not (
        _col_provably_zero(cols["c3"]) and _col_provably_zero(cols["c4"]))
    bulk = bool(cfg.include_bulk_deltaf) and not (
        _col_provably_zero(cols["bulkPi"])
        or (_col_provably_zero(cols["c0"]) and _col_provably_zero(cols["c1"])
            and _col_provably_zero(cols["c2"])))
    if (shear, bulk) != (bool(cfg.include_shear_deltaf),
                         bool(cfg.include_bulk_deltaf)):
        cfg = cfg.replace(include_shear_deltaf=int(shear),
                          include_bulk_deltaf=int(bulk))
    return cfg


def vah_surface_cols(surface) -> dict:
    """Column dict for the VAH kernels from a mode-2/3 Surface (zeros for
    absent optional fields; raises without Lambda/aL)."""
    z = jnp.zeros_like(surface.tau)
    get = lambda name: (getattr(surface, name)
                        if getattr(surface, name) is not None else z)
    cols = dict(tau=surface.tau, dat=surface.dat, dax=surface.dax,
                day=surface.day, dan=surface.dan,
                ux=surface.ux, uy=surface.uy, un=surface.un)
    cols["eta"] = get("eta")
    for name in ("pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
                 "piyy", "piyn", "pinn", "bulkPi", "Wx", "Wy",
                 "c0", "c1", "c2", "c3", "c4"):
        cols[name] = get(name) if hasattr(surface, name) else z
    if surface.Lambda is None or surface.aL is None:
        raise ValueError("VAH kernel needs Lambda and aL (mode 2/3 surface)")
    cols["Lambda"] = surface.Lambda
    cols["aL"] = surface.aL
    return cols


def smooth_spectra_vah(surface, species: SpeciesArrays, grid: MomentumGrid,
                       cfg: Config, mesh=None) -> jnp.ndarray:
    """VAH smooth spectra from a mode-2/3 surface: (S, PT, PHI, Y_out).

    With ``mesh``, the cell axis is sharded over the device mesh and the
    spectra accumulator is psum-reduced over ICI (same skeleton as the VH
    kernels; the reference OpenMP-parallelizes its VAH loop at
    emissionfunction_smooth_kernels.cpp:2206)."""
    cols = vah_surface_cols(surface)
    cfg = effective_vah_cfg(cols, cfg)
    from ..parallel.mesh import grouped_cell_reduce
    kern = lambda c, s, g: _vah_jit(c, s, g, cfg)
    return grouped_cell_reduce(kern, cols, (species, grid), cfg, mesh)
