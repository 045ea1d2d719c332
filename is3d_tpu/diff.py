"""Differentiable Cooper-Frye: gradients of smooth observables with respect
to the freeze-out surface.

No reference counterpart: the reference (C++/OpenMP, derekeverett/iS3D)
computes spectra only, and calibration pipelines built on it (Bayesian
model-to-data fits of viscosities / freeze-out parameters) resort to finite
differences over full re-runs.  Here every smooth kernel is a pure jnp
function of the ``Surface`` pytree, so the whole emission pass composes
with JAX automatic differentiation: d(observable)/d(T, u^mu, pi^munu,
bulkPi, dsigma_mu, ...) in ONE reverse pass at roughly the cost of two
forward passes, exact to machine precision, on the same TPU kernels the
production path runs.

Memory: reverse-mode through the chunked ``lax.scan`` would normally store
every per-chunk (C, R, S, M) emission block.  ``spectra_fn`` therefore
forces ``cfg.remat_scan`` on, which ``jax.checkpoint``s the scan bodies:
the backward pass recomputes each chunk's block, so AD memory is ~one
chunk regardless of surface size (the forward production path is
unaffected by default -- the flag exists so the bit-parity suite keeps
pinning the exact forward artifact).

Supported surface maps:

* linear df (df_mode 1-2) spectra            [kernels.smooth.smooth_spectra]
* feqmod (df_mode 3-4) spectra               [kernels.feqmod, see below]
* VAH spectra (mode 2/3 surfaces)            [kernels.vah.smooth_spectra_vah]
* spin polarization (mode 5 surfaces)        [kernels.polzn.spin_polarization]
* POST-feed-down spectra                     [decayed_spectra_fn: smooth CF
  + the resonance-decay cascade (kernels.decays.resonance_feed_down_traced)
  in one reverse pass -- gradients of final-state observables]

feqmod runs with the host-side breakdown partition disabled (it is a pure
perf optimization; the both-branch kernel is one jnp map with a jnp.where
branch select, so it traces and differentiates).  A cell sitting exactly
on the breakdown threshold has a jump discontinuity inherited from the
physics (the reference's per-cell goto fallback, emissionfunction.cpp:
109-150); gradients are exact one-sided derivatives everywhere else.

Non-smooth points inherited from the physics (all yield correct one-sided
subgradients, never NaN): the |df| <= 1 regulator (jnp.clip), the outflow
Theta(p.dsigma) cut, and the u.dsigma > 0 cell mask.

The observable helpers here are jnp twins of the deliberately-numpy
post-processing in ``observables.py`` (that module trades jit-ability for
zero compile latency in the CLI writers; AD needs the jnp versions).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from .config import Config
from .data import SpeciesArrays
from .io.tables import MomentumGrid
from .io.deltaf import DeltafData


# --------------------------------------------------------------- core API

def surface_value_and_grad(fn: Callable, surface, wrt: Iterable[str]):
    """Value and gradient of ``fn(surface)`` (a scalar) with respect to the
    named ``Surface`` fields.

    Returns ``(value, grads)`` with ``grads`` a dict mapping each name in
    ``wrt`` to an array of that field's shape.  Fields not in ``wrt`` are
    treated as constants.  Raises on fields the surface doesn't carry
    (None) -- a gradient with respect to an absent block is a config
    error, not a zero.
    """
    wrt = tuple(wrt)
    for k in wrt:
        if getattr(surface, k, None) is None:
            raise ValueError(
                f"cannot differentiate with respect to '{k}': the surface "
                f"does not carry that field (None)")
    theta0 = {k: getattr(surface, k) for k in wrt}

    def scalar(theta):
        return fn(surface.replace(**theta))

    value, grads = jax.value_and_grad(scalar)(theta0)
    return value, grads


def surface_vjp(fn: Callable, surface, wrt: Iterable[str]):
    """Forward value plus a pullback on the named surface fields.

    ``fn(surface)`` may return any pytree (e.g. the full (S, PT, PHI, Y)
    spectra).  Returns ``(value, pullback)`` where ``pullback(cotangent)``
    -- ``cotangent`` shaped like ``value`` -- yields the ``wrt``-keyed
    gradient dict.  This is the building block for calibration losses that
    weight many bins at once: one reverse pass instead of one per bin.
    """
    wrt = tuple(wrt)
    for k in wrt:
        if getattr(surface, k, None) is None:
            raise ValueError(
                f"cannot differentiate with respect to '{k}': the surface "
                f"does not carry that field (None)")
    theta0 = {k: getattr(surface, k) for k in wrt}
    value, vjp_fn = jax.vjp(lambda th: fn(surface.replace(**th)), theta0)
    return value, lambda ct: vjp_fn(ct)[0]


def spectra_fn(species: SpeciesArrays, grid: MomentumGrid,
               df_data: DeltafData | None, cfg: Config,
               mesh=None) -> Callable:
    """The differentiable surface -> spectra map for ``cfg``.

    Dispatches exactly like the production API (api.py): VAH surfaces
    (mode 2/3) to the VAH kernel, otherwise linear df (modes 1-2) or
    feqmod (modes 3-4, breakdown partition disabled -- module docstring).
    ``cfg.remat_scan`` is forced on so the reverse pass is
    chunk-rematerialized.

    With ``mesh`` the forward runs cell-sharded over the device mesh and
    the backward differentiates straight through the shard_map + psum
    collectives -- per-field gradients of a multi-chip emission pass.
    """
    if cfg.mode in (2, 3):
        vcfg = cfg.replace(remat_scan=1)

        def fn(surface):
            from .kernels.vah import smooth_spectra_vah
            return smooth_spectra_vah(surface, species, grid, vcfg,
                                      mesh=mesh)
        return fn

    if cfg.df_mode in (3, 4):
        # the host-side breakdown PARTITION (a pure perf optimization:
        # np.flatnonzero routing on concrete probe values) is disabled so
        # the whole surface runs the both-branch kernel -- a single pure
        # jnp map in which breakdown cells are selected by jnp.where, hence
        # traceable and differentiable.  The branch select itself is a
        # step function of the surface (a cell crossing the breakdown
        # threshold switches evaluations discontinuously -- inherited
        # physics, same as the reference's per-cell goto), so gradients
        # are the correct one-sided derivatives away from the threshold.
        fcfg = cfg.replace(remat_scan=1, feqmod_partition=0)

        if mesh is not None:
            def fn(surface):
                from .parallel.mesh import smooth_spectra_sharded
                return smooth_spectra_sharded(surface, species, grid,
                                              df_data, fcfg, mesh=mesh)
            return fn

        def fn(surface):
            from .kernels.feqmod import smooth_spectra_feqmod
            return smooth_spectra_feqmod(surface, species, grid, df_data,
                                         fcfg)
        return fn

    scfg = cfg.replace(remat_scan=1)

    if mesh is not None:
        def fn(surface):
            from .parallel.mesh import smooth_spectra_sharded
            return smooth_spectra_sharded(surface, species, grid, df_data,
                                          scfg, mesh=mesh)
        return fn

    def fn(surface):
        from .kernels.smooth import smooth_spectra
        return smooth_spectra(surface, species, grid, df_data, scfg)
    return fn


def decayed_spectra_fn(species: SpeciesArrays, grid: MomentumGrid,
                       df_data: DeltafData | None, cfg: Config,
                       table, mcids, mesh=None) -> Callable:
    """The differentiable surface -> POST-feed-down spectra map: smooth
    Cooper-Frye (spectra_fn) composed with the resonance-decay cascade
    (kernels.decays.resonance_feed_down_traced) as one traced
    computation, so a single reverse pass yields gradients of
    final-state (decayed) observables with respect to the freeze-out
    surface.  No reference counterpart exists at either level: the
    reference's decay routine is exit(-1)-disabled, and calibration
    pipelines built on it finite-difference full re-runs.

    ``species`` rows, ``mcids``, and the spectra row order must be
    aligned (chosen-particle order, as the api produces).  ``table`` is
    the full ParticleTable (decay channels).  Memory: each cascade wave
    is checkpointed, so backward memory is ~one wave."""
    base = spectra_fn(species, grid, df_data, cfg, mesh=mesh)

    def fn(surface):
        from .kernels.decays import resonance_feed_down_traced
        return resonance_feed_down_traced(base(surface), table, mcids,
                                          grid, cfg)
    return fn


def polarization_fn(species: SpeciesArrays, grid: MomentumGrid,
                    cfg: Config, plasma, mesh=None) -> Callable:
    """The differentiable surface -> polarization-dict map (mode 5):
    gradients of the Lambda polarization vector with respect to the
    thermal-vorticity components (wtx..wyn), flow, and dsigma."""
    pcfg = cfg.replace(remat_scan=1)

    def fn(surface):
        from .kernels.polzn import spin_polarization
        return spin_polarization(surface, species, grid, pcfg, plasma,
                                 mesh=mesh)
    return fn


# ------------------------------------------------- differentiable observables
# jnp twins of observables.py (which is deliberately numpy, see its
# docstring); same contractions, same reference citations.

def dN_dy_j(spectra, grid: MomentumGrid,
            include_pT_jacobian: bool = True) -> jnp.ndarray:
    """(S, PT, PHI, Y) -> (S, Y) transverse-momentum integral
    (observables.dN_dy, reference emissionfunction.cpp:745-768)."""
    pw = grid.pT_weight
    w = pw * grid.pT if include_pT_jacobian else pw
    return jnp.einsum("spfy,p,f->sy", spectra, w, grid.phi_weight)


def mean_pT_j(spectra, grid: MomentumGrid) -> jnp.ndarray:
    """(S, Y) mean transverse momentum (observables.mean_pT)."""
    num = jnp.einsum("spfy,p,f->sy", spectra,
                     grid.pT_weight * grid.pT ** 2, grid.phi_weight)
    den = dN_dy_j(spectra, grid)
    return num / jnp.where(den == 0.0, 1.0, den)


def vn_j(spectra, grid: MomentumGrid, n: int) -> jnp.ndarray:
    """pT-integrated |v_n|(y), shape (S, Y) (observables.continuous_vn
    integrated over pT; reference emissionfunction.cpp:1053-1136).

    The magnitude sqrt(re^2 + im^2) is guarded with the double-where
    pattern so bins where the harmonic vanishes identically get gradient
    0 instead of NaN (d|v|/dv at v = 0 is taken as the subgradient 0).
    """
    w = grid.pT_weight * grid.pT
    wc = jnp.cos(n * grid.phi) * grid.phi_weight
    ws = jnp.sin(n * grid.phi) * grid.phi_weight
    re = jnp.einsum("spfy,p,f->sy", spectra, w, wc)
    im = jnp.einsum("spfy,p,f->sy", spectra, w, ws)
    den = dN_dy_j(spectra, grid)
    r2 = re * re + im * im
    mag = jnp.where(r2 > 0.0, jnp.sqrt(jnp.where(r2 > 0.0, r2, 1.0)), 0.0)
    return mag / jnp.where(den == 0.0, 1.0, den)
