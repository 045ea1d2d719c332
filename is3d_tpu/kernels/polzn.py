"""Thermal-vorticity spin polarization (MODE 5).

TPU-native re-derivation of calculate_spin_polzn (reference:
src/cpp/emissionfunction_polzn_kernels.cpp:27-265): per momentum point the
covariant polarization vector

    S_mu(p) = -(1 - sign f0) / (8 m) * 2 * eps_{mu nu rho sigma} p^nu w^{rho sigma}

is integrated over the surface with measure p.dsigma f0, normalized by
Snorm = int p.dsigma f0.  Same chunked lax.scan skeleton as the spectra
kernels; the (C x S x PT x PHI x R) block is fused on the VPU and reduced
over cells.

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
from .common import pad_and_chunk, effective_chunk, carry_seed_zero
from .smooth import _momentum_monomials, _rapidity_factors


def _chunk_polzn(c, valid, species, grid, cfg, T_avg):
    cc = lambda x: x[:, None, None, None, None]
    mT, px, py = _momentum_monomials(species, grid)
    mT_b = mT[None, :, :, None, None]
    px_b = px[None, None, :, :, None]
    py_b = py[None, None, :, :, None]

    if cfg.dimension == 2 and grid.eta_mT_rescale:
        # mT-adaptive eta-node remap (exact substitution, same trick as
        # the spectra kernels): S_mu(p) and Snorm are pT-differential, so
        # per-(species, pT) node positions are legitimate here (unlike
        # dN/dX's eta-differential outputs).  Like the spectra kernels the
        # nodes are recentered on the cell's longitudinal-flow rapidity
        # y_flow = atanh(tau u^eta / u^tau) -- without the shift the
        # narrowed span can miss a flow-shifted integrand peak at high pT.
        # Jacobian applied below (the shift's jacobian is 1).
        from .smooth import ETA_REMAP_T_REF
        T_REF = jnp.asarray(ETA_REMAP_T_REF, mT.dtype)
        s_sp = jnp.sqrt(T_REF / jnp.maximum(mT, T_REF))     # (S,P)
        from ..physics import lrf
        yfl = lrf.flow_rapidity(c["tau"], c["ut"], c["un"])  # (C,)
        # Delta = y - eta_phys sampled at y_flow - s*eta_r: centered on the
        # integrand peak Delta* = +y_flow = atanh(tau u^eta / u^tau)
        delta = (yfl[:, None, None, None, None]
                 - s_sp[None, :, :, None, None]
                 * grid.eta[None, None, None, None, :])     # (C,S,P,1,R)
        ch = jnp.cosh(delta)
        sh = jnp.sinh(delta)
        eta_jac = s_sp[None, :, :, None, None]
    else:
        ch2, sh2 = _rapidity_factors(c, grid, cfg.dimension)
        ch = ch2[:, None, None, None, :]
        sh = sh2[:, None, None, None, :]
        eta_jac = None
    pt = mT_b * ch
    # p^eta (not tau p^eta): the vorticity contraction uses pn directly
    pn = (mT_b / cc(c["tau"])) * sh

    tau2 = c["tau"] ** 2
    pds = (pt * cc(c["dat"]) + px_b * cc(c["dax"]) + py_b * cc(c["day"])
           + pn * cc(c["dan"]))
    pdotu = (pt * cc(c["ut"]) - px_b * cc(c["ux"]) - py_b * cc(c["uy"])
             - pn * cc(tau2 * c["un"]))

    sign_b = species.sign[None, :, None, None, None]
    f0 = 1.0 / (jnp.exp(pdotu / T_avg) + sign_b)

    mass_b = species.mass[None, :, None, None, None]
    pref = -(1.0 / (8.0 * mass_b)) * (1.0 - sign_b * f0) * 2.0

    wtx, wty, wtn = cc(c["wtx"]), cc(c["wty"]), cc(c["wtn"])
    wxy, wxn, wyn = cc(c["wxy"]), cc(c["wxn"]), cc(c["wyn"])

    St = pref * (wxy * pn - wxn * py_b + wyn * px_b)
    Sx = pref * (wyn * pt - wtn * py_b + wty * pn)
    Sy = pref * (-wxn * pt + wtn * px_b - wtx * pn)
    Sn = pref * (wtx * py_b + wxy * pt - wty * px_b)

    meas = pds * f0
    mask = (valid & c["valid"]).astype(meas.dtype)
    meas = meas * cc(mask)

    if cfg.dimension == 2:
        if eta_jac is not None:
            # clean quadrature weight x substitution jacobian (the raw
            # S_mu/Snorm sums rescale together; normalized outputs are
            # identical up to quadrature accuracy)
            w = grid.eta_weight[None, None, None, None, :] * eta_jac
        else:
            # eta_weight * delta_eta with uniform spacing assumed
            # (reference quirk, :62-71; divides out in S_mu/Snorm)
            eta = grid.eta
            delta = (eta[1] - eta[0]) if eta.shape[0] > 1 else 1.0
            w = (grid.eta_weight * delta)[None, None, None, None, :]
        red = lambda a: jnp.sum(a * w, axis=(0, 4))[..., None]
    else:
        red = lambda a: jnp.sum(a, axis=0)

    return (red(meas * St), red(meas * Sx), red(meas * Sy), red(meas * Sn),
            red(meas))


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
    T_avg = jnp.asarray(plasma.temperature, surface.tau.dtype)
    from ..parallel.mesh import grouped_cell_reduce
    kern = lambda c, s, g, t: _polzn_jit(c, s, g, t, cfg)
    St, Sx, Sy, Sn, Snorm = grouped_cell_reduce(
        kern, cols, (species, grid, T_avg), cfg, mesh, unroll_groups=True)
    safe = jnp.where(Snorm == 0.0, 1.0, Snorm)
    return dict(St=St, Sx=Sx, Sy=Sy, Sn=Sn, Snorm=Snorm,
                St_over_Snorm=St / safe, Sx_over_Snorm=Sx / safe,
                Sy_over_Snorm=Sy / safe, Sn_over_Snorm=Sn / safe)
