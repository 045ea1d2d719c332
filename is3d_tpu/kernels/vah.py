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
from .common import pad_and_chunk, effective_chunk, carry_seed_zero
from .smooth import _momentum_monomials, _rapidity_factors
from ..physics import lrf


def _chunk_vah(c, valid, species, grid, cfg, pointwise: bool = False):
    """VAH emission contribution of one cell chunk.

    pointwise=False (spectra): eta-reduced (S, PT, PHI, Y_out) with
    degeneracy and CF prefactor, mT-adaptive eta nodes in 2+1D.
    pointwise=True (dN/dX): masked p.dsigma*f at every
    (C, S, PT, PHI, R) point at FIXED eta nodes (common across cells, as
    the spacetime binning requires), no weights/prefactor -- mirrors
    smooth._pointwise_contribution."""
    cc = lambda x: x[:, None, None, None, None]
    mT, px, py = _momentum_monomials(species, grid)
    mT_b = mT[None, :, :, None, None]
    px_b = px[None, None, :, :, None]
    py_b = py[None, None, :, :, None]

    # 2+1D: integrate over eta with nodes rescaled per (cell, species, pT)
    # by s = a_L * sqrt(Lambda / max(mT, Lambda)) -- an exact substitution
    # (jacobian applied below).  The f_a integrand's (y - eta) width is
    # sigma ~ a_L sqrt(Lambda/mT) (exponent (mT/Lambda)(1 + D^2/(2 a_L^2))
    # near the peak), so both small a_L and large mT narrow it; a fixed
    # node table under-resolves the high-pT tail (the reference carries a
    # 9..4001-point eta-table ladder, tables/eta/ + iS3D.cpp:161-167, for
    # exactly this trade).  With the mT term the worst-case quadrature
    # error at the pT = 4 GeV grid edge drops from 6e-2 (a_L-only rescale,
    # n_eta = 48) to < 1e-6 (measured vs a 2048-node reference).
    if cfg.dimension == 2 and not pointwise and grid.eta_mT_rescale:
        lam_c = c["Lambda"][:, None, None]
        eta_scale = c["aL"][:, None, None] * jnp.sqrt(
            lam_c / jnp.maximum(mT[None, :, :], lam_c))      # (C,S,P)
        # recenter on the cell's longitudinal-flow rapidity: the f_a
        # argument peaks at delta = y_flow = atanh(tau u^eta / u^tau)
        # (p.u = mT u0_perp cosh(delta - y_flow) - p_perp.u_perp), so the
        # narrowed node span is placed there, delta = y_flow - s*eta --
        # same recentering as the VH remap (_rescaled_eta_operands) and
        # the polzn kernel; without it a flow-shifted peak at high pT
        # falls outside the s-narrowed span
        y_flow = lrf.flow_rapidity(c["tau"], c["ut"], c["un"])
        delta = (y_flow[:, None, None, None]
                 - eta_scale[..., None] * grid.eta[None, None, None, :])
        ch_b = jnp.cosh(delta)[:, :, :, None, :]             # (C,S,P,1,R)
        sh_b = jnp.sinh(delta)[:, :, :, None, :]
    else:
        ch, sh = _rapidity_factors(c, grid, cfg.dimension)
        ch_b = ch[:, None, None, None, :]
        sh_b = sh[:, None, None, None, :]
    pt = mT_b * ch_b
    taupn = mT_b * sh_b                              # tau * p^eta

    tau = c["tau"]
    pds = (pt * cc(c["dat"]) + px_b * cc(c["dax"]) + py_b * cc(c["day"])
           + taupn * cc(c["dan"] / tau))
    pdotu = (pt * cc(c["ut"]) - px_b * cc(c["ux"]) - py_b * cc(c["uy"])
             - taupn * cc(tau * c["un"]))
    # z.p with z = (zt, 0, 0, zn): zt pt - tau^2 zn pn = zt pt - (tau zn) taupn
    pdotz = pt * cc(c["zt"]) - taupn * cc(tau * c["zn"])

    sign_b = species.sign[None, :, None, None, None]
    mass2_b = (species.mass ** 2)[None, :, None, None, None]

    xiL = cc(1.0 / (c["aL"] ** 2) - 1.0)
    Ea = jnp.sqrt(pdotu * pdotu + xiL * pdotz * pdotz)
    fa = 1.0 / (jnp.exp(Ea / cc(c["Lambda"])) + sign_b)
    fabar = 1.0 - sign_b * fa

    df = jnp.zeros_like(fa)
    if cfg.include_shear_deltaf:
        Wp = (cc(c["Wt"]) * pt - cc(c["Wx"]) * px_b - cc(c["Wy"]) * py_b
              - cc(c["Wn"] * tau) * taupn)
        pipp = lrf.milne_pipp_full(c, cc, pt, px_b, py_b, taupn, tau)
        df = df + cc(c["c3"]) * pdotz * Wp + cc(c["c4"]) * pipp
    if cfg.include_bulk_deltaf:
        df = df + (cc(c["c0"]) * mass2_b + cc(c["c1"]) * pdotz * pdotz
                   + cc(c["c2"]) * pdotu * pdotu) * cc(c["bulkPi"])

    if cfg.regulate_deltaf:
        f = fa * (1.0 + jnp.clip(fabar * df, -1.0, 1.0))
    else:
        f = fa * (1.0 + fabar * df)

    contrib = pds * f
    if cfg.outflow:
        contrib = jnp.where(pds > 0.0, contrib, 0.0)
    mask = valid.astype(contrib.dtype)
    contrib = contrib * cc(mask)

    if pointwise:
        return contrib

    if cfg.dimension == 2:
        contrib = contrib * grid.eta_weight[None, None, None, None, :]
        if grid.eta_mT_rescale:
            # jacobian of the eta-node rescale (exact substitution)
            contrib = contrib * eta_scale[:, :, :, None, None]
        out = jnp.sum(contrib, axis=(0, 4))[..., None]
    else:
        out = jnp.sum(contrib, axis=0)
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
    # scan carry type matches under shard_map as well as plain jit
    acc0 = jnp.zeros((species.n_species, grid.n_pT, grid.n_phi, n_y_out),
                     dtype=cols["tau"].dtype) + carry_seed_zero(cols)

    def body(acc, inp):
        chunk_cols, m = inp
        c = _complete_vah_cells(chunk_cols)
        return acc + _chunk_vah(c, m, species, grid, cfg), None

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
    from ..parallel.mesh import grouped_cell_reduce
    kern = lambda c, s, g: _vah_jit(c, s, g, cfg)
    return grouped_cell_reduce(kern, cols, (species, grid), cfg, mesh)
