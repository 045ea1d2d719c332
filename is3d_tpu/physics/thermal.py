"""Thermal momentum-space integrals over the hadron resonance gas.

Gauss-Laguerre evaluations of the equilibrium density and the J_rs moments
used by the linearized delta-f corrections (reference: src/cpp/gaussThermal.cpp).
All integrands are written in reduced variables pbar = p/T, mbar = m/T; the
generalized Gauss-Laguerre rule of order alpha absorbs pbar^alpha e^-pbar, so
each integrand carries a compensating e^{+pbar} factor exactly as in the
reference.

Everything broadcasts: scalars or arrays of any matching shape for
(mbar, alphaB, baryon, sign); the quadrature axis is appended internally.
Dimensionful prefactors (powers of T / two_pi2_hbarC3, degeneracy) are applied
by the callers (reference: deltafReader.cpp:536-650).

Dispatch: the integrals run in whichever array library the inputs live in.
JAX arrays / tracers use jnp (the kernels call these inside jit); plain
numpy inputs stay in numpy end to end -- the host-side density setup
(io/deltaf.compute_particle_densities) is a handful of (species x 32)-point
quadratures, and evaluating them eagerly through the JAX CPU backend costs
dozens of tiny op-by-op compiles per process (~4 s measured) for microseconds
of arithmetic.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _mod(*xs):
    """jnp if any input is a JAX array/tracer, else numpy."""
    for x in xs:
        if isinstance(x, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def _ebar(pbar, mbar):
    return _mod(pbar, mbar).sqrt(pbar * pbar + mbar * mbar)


def _expand(xp, roots, mbar, alphaB, baryon, sign):
    """Broadcast species args against the quadrature axis."""
    mbar = xp.asarray(mbar)[..., None]
    alphaB = xp.asarray(alphaB)[..., None]
    baryon = xp.asarray(baryon)[..., None]
    sign = xp.asarray(sign)[..., None]
    return roots, mbar, alphaB, baryon, sign


def gauss_thermal(integrand, roots, weights, mbar, alphaB, baryon, sign):
    """sum_k w_k * integrand(r_k, ...) (reference: gaussThermal.cpp:7-15)."""
    xp = _mod(roots, weights, mbar, alphaB, baryon, sign)
    pbar, mbar, alphaB, baryon, sign = _expand(xp, roots, mbar, alphaB,
                                               baryon, sign)
    return xp.sum(weights * integrand(pbar, mbar, alphaB, baryon, sign),
                  axis=-1)


# ---- integrands (reference: gaussThermal.cpp:19-85); quadrature alpha noted
#
# All forms are algebraically identical to the reference but written with
# exp() of non-positive arguments only, so they do not overflow in float32
# (Gauss-Laguerre roots reach pbar ~ 114; exp(114) = inf in f32):
#   e^pbar f_eq          = e^{pbar - x} / (1 + sign e^{-x}),   x = Ebar - chem
#   e^pbar f_eq f_eqbar  = e^{pbar - x} / (1 + sign e^{-x})^2
# with pbar - x <= chem bounded.

def _feq_w(pbar, mbar, alphaB, baryon, sign):
    """e^pbar / (e^{Ebar - chem} + sign), overflow-safe."""
    x = _ebar(pbar, mbar) - baryon * alphaB
    xp = _mod(x, sign)
    return xp.exp(pbar - x) / (1.0 + sign * xp.exp(-x))


def _ff_w(pbar, mbar, alphaB, baryon, sign):
    """e^{pbar + Ebar - chem} / (e^{Ebar - chem} + sign)^2, overflow-safe."""
    x = _ebar(pbar, mbar) - baryon * alphaB
    xp = _mod(x, sign)
    d = 1.0 + sign * xp.exp(-x)
    return xp.exp(pbar - x) / (d * d)


def neq_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 1
    return pbar * _feq_w(pbar, mbar, alphaB, baryon, sign)


def J10_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 1
    return pbar * _ff_w(pbar, mbar, alphaB, baryon, sign)


def J11_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 1
    e = _ebar(pbar, mbar)
    return pbar**3 / (e * e) * _ff_w(pbar, mbar, alphaB, baryon, sign)


def J20_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 2
    return _ebar(pbar, mbar) * _ff_w(pbar, mbar, alphaB, baryon, sign)


def J30_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 3
    e = _ebar(pbar, mbar)
    return e * e / pbar * _ff_w(pbar, mbar, alphaB, baryon, sign)


def J31_int(pbar, mbar, alphaB, baryon, sign):     # alpha = 3
    return pbar * _ff_w(pbar, mbar, alphaB, baryon, sign)


# ---- Jonah's isotropically-scaled moments (reference: gaussThermal.cpp:93-116)

def E_mod_int(pbar, mbar, lam, sign):              # alpha = 2
    scale2 = (1.0 + lam) ** 2
    return (_mod(pbar, mbar, lam).sqrt(pbar * pbar * scale2 + mbar * mbar)
            * _feq_w(pbar, mbar, 0.0, 0.0, sign))


def P_mod_int(pbar, mbar, lam, sign):              # alpha = 2
    scale2 = (1.0 + lam) ** 2
    xp = _mod(pbar, mbar, lam)
    return (pbar * pbar * scale2 / xp.sqrt(pbar * pbar * scale2 + mbar * mbar)
            * _feq_w(pbar, mbar, 0.0, 0.0, sign))


def gauss_mod(integrand, roots, weights, mbar, lam, sign):
    """Quadrature for the Jonah modified-EoS integrands
    (reference: gaussThermal.cpp:93-98)."""
    xp = _mod(roots, weights, mbar, lam, sign)
    mbar = xp.asarray(mbar)[..., None]
    sign = xp.asarray(sign)[..., None]
    lam = xp.asarray(lam)[..., None]
    return xp.sum(weights * integrand(roots, mbar, lam, sign), axis=-1)
