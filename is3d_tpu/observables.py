"""Momentum-space observables derived from the smooth spectra.

Vectorized (jnp) equivalents of the reference's writer-side integrations
(emissionfunction.cpp:593-772, 1053-1136): dN/dphidy, dN/(2pi pT dpT dy),
dN/dy, and the continuous anisotropic-flow harmonics v_n(pT, y).
"""

from __future__ import annotations

import jax.numpy as jnp

from .io.tables import MomentumGrid

K_MAX = 7  # v_1 .. v_7, reference emissionfunction.h K_MAX


def dN_dphidy(spectra: jnp.ndarray, grid: MomentumGrid) -> jnp.ndarray:
    """(S, PT, PHI, Y) -> (S, PHI, Y): Gauss pT integral of pT * spectra
    (reference: emissionfunction.cpp:620-630)."""
    w = grid.pT_weight * grid.pT
    return jnp.einsum("spfy,p->sfy", spectra, w)


def dN_twopipTdpTdy(spectra: jnp.ndarray, grid: MomentumGrid) -> jnp.ndarray:
    """(S, PT, PHI, Y) -> (S, PT, Y): phi average / 2pi
    (reference: emissionfunction.cpp:662-676)."""
    return jnp.einsum("spfy,f->spy", spectra, grid.phi_weight) / (2.0 * jnp.pi)


def dN_dy(spectra: jnp.ndarray, grid: MomentumGrid,
          include_pT_jacobian: bool = True) -> jnp.ndarray:
    """(S, PT, PHI, Y) -> (S, Y): full transverse-momentum integral
    dN/dy = int pT dpT dphi dN/(pT dpT dphi dy).

    Note: the reference's write_dN_dy_toFile (emissionfunction.cpp:745-768)
    omits the pT Jacobian, inconsistently with its own write_dN_dphidy_toFile
    (:620-630) which includes it.  Default is the physically correct
    integral (also required for sampler-vs-smooth parity); pass
    include_pT_jacobian=False (cfg.reference_compat_dndy) to reproduce the
    reference's files exactly."""
    w = grid.pT_weight * grid.pT if include_pT_jacobian else grid.pT_weight
    return jnp.einsum("spfy,p,f->sy", spectra, w, grid.phi_weight)


def mean_pT(spectra: jnp.ndarray, grid: MomentumGrid) -> jnp.ndarray:
    """(S, Y) mean transverse momentum."""
    num = jnp.einsum("spfy,p,f->sy", spectra, grid.pT_weight * grid.pT ** 2,
                     grid.phi_weight)
    den = dN_dy(spectra, grid)
    return num / jnp.where(den == 0.0, 1.0, den)


def continuous_vn(spectra: jnp.ndarray, grid: MomentumGrid,
                  k_max: int = K_MAX):
    """|V_n|(pT, y) for n = 1..k_max
    (reference: emissionfunction.cpp:1053-1136).

    Returns (vn, denominator) with vn shape (S, k_max, PT, Y); vn is zeroed
    where the phi-integrated denominator is below 1e-15."""
    ks = jnp.arange(1, k_max + 1, dtype=spectra.dtype)
    ang = ks[:, None] * grid.phi[None, :]                  # (K, PHI)
    wcos = jnp.cos(ang) * grid.phi_weight[None, :]
    wsin = jnp.sin(ang) * grid.phi_weight[None, :]
    re = jnp.einsum("spfy,kf->skpy", spectra, wcos)
    im = jnp.einsum("spfy,kf->skpy", spectra, wsin)
    den = jnp.einsum("spfy,f->spy", spectra, grid.phi_weight)
    mag = jnp.sqrt(re * re + im * im)
    vn = mag / jnp.where(jnp.abs(den) < 1e-300, 1.0, den)[:, None]
    vn = jnp.where(den[:, None] < 1.0e-15, 0.0, vn)
    return vn, den
