"""Monte-Carlo particle sampler: discrete hadron lists from the Cooper-Frye
emission function.

TPU-native re-derivation of the reference sampler
(reference: src/cpp/emissionfunction_sampling_kernels.cpp:653-1225).  The
reference walks cells serially, draws a Poisson count per (cell, event), and
rejection-samples each hadron momentum in a data-dependent while-loop.  That
control flow is hostile to SPMD, so the rebuild restructures it:

* Phase A (vectorized over cells): all per-cell quantities -- LRF tetrads,
  dsigma/pi/V in the LRF, df coefficients, feqmod transform + breakdown,
  per-(cell, species) mean yields dn -- are computed as (C,) / (C, S) arrays
  in one jit (the reference's per-cell scalar block, :878-1077).

* Phase B (vectorized over hadron slots): by Poisson superposition, drawing
  N_c ~ Poisson(dn_c) per cell is equivalent to drawing one total
  N ~ Poisson(sum_c dn_c) and assigning each hadron a cell from the
  categorical distribution p(c) = dn_c / sum dn.  Each event therefore becomes
  a fixed-capacity batch of hadron slots: cell via inverse-CDF searchsorted,
  species via per-row CDF, momenta via *batched* rejection rounds inside a
  lax.while_loop (all pending hadrons propose simultaneously each round),
  flux/viscous thinning as a single Bernoulli mask.  Identical target
  distribution, fully shaped for the VPU.

* Acceptance bookkeeping and compaction to variable-length per-event particle
  lists happen on the host (numpy boolean indexing).

Deterministic counter-based RNG: one base key (sampler_seed) folded per event;
no analog of the reference's 5 seeded mt19937 streams is needed.

Divergences from the reference (documented):
* negative per-species mean densities are clamped to 0 for the categorical
  draw (std::discrete_distribution with negative weights is UB in C++);
* `calculate_total_yield` reads `dsigma_space` without ever calling
  compute_dsigma_magnitude() (uninitialized member, sampling_kernels.cpp:777);
  we compute it.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..units import TWO_PI2_HBARC3
from ..config import Config
from ..data import SpeciesArrays
from ..io.deltaf import DeltafData
from ..physics import lrf, thermal
from .common import surface_columns, prepare_cells
from .feqmod import _adjugate_sym, _mode3_breakdown

TWO_PI = 2.0 * math.pi
MBAR_LIGHT = 1.008        # light/heavy sampler split (reference :481)
MAX_REJECTION_ROUNDS = 256


def pion_thermal_weight_max(x):
    """Max of the light-hadron equilibrium weight for m/T < 0.8554
    (rational fit, reference: emissionfunction_sampling_kernels.cpp:172-195)."""
    x2 = x * x
    x3 = x2 * x
    x4 = x3 * x
    num = (143206.88623164667 - 95956.76008684626 * x - 21341.937407169076 * x2
           + 14388.446116867359 * x3 - 6083.775788504437 * x4)
    den = (-0.3541350577684533 + 143218.69233952634 * x - 24516.803600065778 * x2
           - 115811.59391199696 * x3 + 35814.36403387459 * x4)
    return 1.00001 * num / den


# ======================================================================
# Alias tables: O(1) categorical draws (Walker's method)
# ======================================================================
# Round-4 device-rate work: the sampler's phase-B budget is DOMINATED by
# the categorical machinery (probe_sampler_device: draw = 1.26 s of a
# 1.61 s event batch) because every slot pays a 17-round binary search
# over the cell CDF plus a 9-round binary search over its species row --
# each round a data-dependent scalar gather, and TPU gathers run near
# scalar speed.  Alias tables replace both searches with ONE 8-byte
# gather per draw.  Construction is exact (Walker/Vose), fully
# vectorized across rows, and runs on device inside phase A -- no host
# round-trip (an 80 MB (C, S) pull would cost ~3 s on the tunneled rig).

_CELL_BLOCK = 512     # cells per block of the 2-level cell alias


def _alias_build(weights):
    """Walker alias tables for R independent categorical distributions.

    weights: (R, K) nonnegative.  Returns (prob (R, K), alias (R, K)
    int32) such that  b = floor(u K); b if frac(u K) < prob[b] else
    alias[b]  is exactly Categorical(weights / sum(weights)) up to fp
    rounding of the table entries.  Quantified (tests/test_sampler.py::
    test_alias_tables_f32_rounding_bound): the pmf the f32 production
    tables realize stays within 1e-6 total variation per row of the
    exact categorical (measured max 2.3e-7 on adversarial rows -- 1e6
    dynamic range, 60% zeros, 512-wide blocks, 1e12 dominant ratio),
    with zero-weight entries exactly unreachable; at 1e9 sampled hadrons
    that mis-allocates ~1e3 across all species, two orders below Poisson
    resolution.  Rows with zero total weight get a uniform table
    (callers only reach them with zero marginal weight).

    Vectorized two-pointer construction on the descending sort: each of
    the K fori steps finalizes EXACTLY one slot per row -- the current
    donor i when it has dropped below 1 (its residual becomes a small
    whose deficit the next donor absorbs), else the smallest untouched
    entry j against donor i.  The i/j gap shrinks by one per step, so
    all rows complete in exactly K steps; no row-divergent control flow
    survives into the compiled loop."""
    R, K = weights.shape
    dtype = weights.dtype
    W = jnp.sum(weights, axis=1, keepdims=True)
    safe = jnp.where(W > 0.0, W, 1.0)
    q0 = jnp.where(W > 0.0, weights * (jnp.asarray(K, dtype) / safe),
                   jnp.ones_like(weights))
    order = jnp.argsort(-q0, axis=1)                  # descending, stable
    qs0 = jnp.take_along_axis(q0, order, 1)
    rows = jnp.arange(R)

    def body(_, st):
        qs, prob, alias, i, j = st
        qi = qs[rows, i]
        last = i == j
        small_i = (qi < 1.0) & ~last
        ip1 = jnp.minimum(i + 1, K - 1)
        qj = qs[rows, j]

        pos = jnp.where(last | small_i, i, j)
        prob_val = jnp.where(last, jnp.ones((), dtype),
                             jnp.clip(jnp.where(small_i, qi, qj), 0.0, 1.0))
        # alias stores ORIGINAL indices: the next donor for a depleted
        # donor, the current donor for a small, itself on the last slot
        alias_pos = jnp.where(last, i, jnp.where(small_i, ip1, i))
        alias_val = order[rows, alias_pos].astype(jnp.int32)

        upd_idx = jnp.where(small_i, ip1, i)
        upd_val = jnp.where(small_i, qs[rows, ip1] - (1.0 - qi),
                            jnp.where(last, qi, qi - (1.0 - qj)))
        qs = qs.at[rows, upd_idx].set(upd_val)
        prob = prob.at[rows, pos].set(prob_val)
        alias = alias.at[rows, pos].set(alias_val)
        i = jnp.where(small_i | last, i + 1, i)
        j = jnp.where(small_i | last, j, j - 1)
        return qs, prob, alias, i, j

    # integer carries seeded from shard-VARYING data (a cast of 0 * qs0,
    # which the float carries prove is tracked as varying) so the fori
    # carry types match under shard_map as well as plain jit -- the same
    # pattern as the rejection while_loop's carry below
    vz = (0.0 * qs0).astype(jnp.int32)
    st0 = (qs0, jnp.ones_like(qs0), vz,
           vz[:, 0], vz[:, 0] + jnp.int32(K - 1))
    _, prob_s, alias_s, _, _ = lax.fori_loop(0, K, body, st0)
    # sorted space -> original slots (order[r, pos] = original index)
    prob = jnp.ones_like(prob_s).at[rows[:, None], order].set(prob_s)
    alias = jnp.zeros_like(alias_s).at[rows[:, None], order].set(alias_s)
    return prob, alias


def _alias_pick(prob, alias, row_idx, u):
    """One alias draw per query: u in [0,1) -> column index of row_idx."""
    K = prob.shape[1]
    x = u * K
    b = jnp.minimum(x.astype(jnp.int32), K - 1)
    f = x - b.astype(x.dtype)
    return jnp.where(f < prob[row_idx, b], b, alias[row_idx, b])


def _build_alias_tables(dn_list, dn_tot):
    """Phase-A alias tables: 2-level cell draw (block of _CELL_BLOCK cells
    per row keeps the construction loop short and the top table tiny) and
    the per-cell species draw."""
    C = dn_tot.shape[0]
    CB = min(_CELL_BLOCK, _next_pow2_int(C))
    G = -(-C // CB)
    pad = G * CB - C
    blocks = jnp.concatenate(
        [dn_tot, jnp.zeros((pad,), dn_tot.dtype)]).reshape(G, CB)
    grp_prob, grp_alias = _alias_build(jnp.sum(blocks, axis=1)[None])
    blk_prob, blk_alias = _alias_build(blocks)
    sp_prob, sp_alias = _alias_build(dn_list)
    return dict(grp_prob=grp_prob, grp_alias=grp_alias,
                blk_prob=blk_prob, blk_alias=blk_alias,
                sp_prob=sp_prob, sp_alias=sp_alias)


def _next_pow2_int(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _alias_cell_species_draw(cell, k_grp, k_blk, k_sp, n_cap, dtype):
    """(cidx, sidx) for every slot via three O(1) alias picks."""
    CB = cell["blk_prob"].shape[1]
    C = cell["dn_tot"].shape[0]
    u1 = jax.random.uniform(k_grp, (n_cap,), dtype=dtype)
    g = _alias_pick(cell["grp_prob"], cell["grp_alias"],
                    jnp.zeros((n_cap,), jnp.int32), u1)
    u2 = jax.random.uniform(k_blk, (n_cap,), dtype=dtype)
    within = _alias_pick(cell["blk_prob"], cell["blk_alias"], g, u2)
    cidx = jnp.minimum(g * CB + within, C - 1)
    u3 = jax.random.uniform(k_sp, (n_cap,), dtype=dtype)
    sidx = _alias_pick(cell["sp_prob"], cell["sp_alias"], cidx, u3)
    return cidx, sidx


# ======================================================================
# Phase A: per-cell data
# ======================================================================

# The complete set of DeltafCoefficients fields _species_yields_exact_block
# reads.  The chunked path in _species_yields_exact stacks EXACTLY these and
# NaN-fills the rest, so the list going stale is self-detecting (NaN output).
YIELDS_DF_FIELDS = ("F", "G", "z", "betabulk")
_YIELDS_DF_FILL = {"betabulk": 1.0}   # pad lanes only; avoids 0-division


def _species_yields_exact(c, species, laguerre, cfg, max_block=None):
    """Per-(cell, species) max densities dn for the categorical draw
    (reference max_particle_number, sampling_kernels.cpp:282-357).

    Chunked over cells with lax.map so the (cells, species, quadrature)
    block stays within a fixed element budget -- 1M-cell surfaces would
    otherwise materialize hundreds of GB here."""
    from .common import effective_chunk
    C = c["T"].shape[0]
    S = species.n_species
    Q = laguerre[1][0].shape[0]
    B = effective_chunk(C, C, S * Q)
    if max_block is not None:
        B = min(B, max_block)
    if B < C:
        nB = -(-C // B)
        pad = nB * B - C

        def prep(v, fill=0.0):
            if pad:
                v = jnp.concatenate(
                    [v, jnp.full((pad,), fill, dtype=v.dtype)])
            return v.reshape(nB, B)

        stacked = dict(
            T=prep(c["T"], fill=1.0),
            alphaB=prep(c["alphaB"]),
            bulkPi=prep(c["bulkPi"]),
            breakdown=prep(c["breakdown"], fill=False),
        )
        dfc = c["df"]
        for k in YIELDS_DF_FIELDS:
            stacked["df_" + k] = prep(getattr(dfc, k),
                                      fill=_YIELDS_DF_FILL.get(k, 0.0))

        def one(chunk):
            cc = dict(T=chunk["T"], alphaB=chunk["alphaB"],
                      bulkPi=chunk["bulkPi"], breakdown=chunk["breakdown"])
            from ..io.deltaf import DeltafCoefficients
            import dataclasses
            # Rebuild the coefficient pytree from the DECLARED field list
            # only; every undeclared field is a NaN sentinel so a future
            # df term reading (say) c0 through this chunked path fails
            # loudly instead of silently seeing zeros.
            nan = jnp.full_like(chunk["T"], jnp.nan)
            vals = {f.name: nan for f in dataclasses.fields(DeltafCoefficients)}
            for k in YIELDS_DF_FIELDS:
                vals[k] = chunk["df_" + k]
            cc["df"] = DeltafCoefficients(**vals)
            return _species_yields_exact_block(cc, species, laguerre, cfg)

        out = jax.lax.map(one, stacked)            # (nB, B, S)
        return out.reshape(nB * B, S)[:C]
    return _species_yields_exact_block(c, species, laguerre, cfg)


def _species_yields_exact_block(c, species, laguerre, cfg):
    r1, w1 = laguerre[1]
    r2, w2 = laguerre[2]
    T = c["T"][:, None]
    alphaB = c["alphaB"][:, None]
    mbar = species.mass[None, :] / T
    baryon = species.baryon[None, :]
    sign = species.sign[None, :]
    deg = species.degeneracy[None, :]
    neq_fact = T**3 / TWO_PI2_HBARC3

    gt = lambda f, r, w, mb, aB, b, s: thermal.gauss_thermal(f, r, w, mb, aB, b, s)

    if cfg.df_mode in (1, 2):
        neq = neq_fact * deg * gt(thermal.neq_int, r1, w1, mbar, alphaB, baryon, sign)
        return 2.0 * neq
    df = c["df"]
    neq = neq_fact * deg * gt(thermal.neq_int, r1, w1, mbar, alphaB, baryon, sign)
    linear = 2.0 * neq
    if cfg.df_mode == 3:
        J20_fact = T * neq_fact
        J10 = jnp.where(cfg.include_baryon,
                        neq_fact * deg * gt(thermal.J10_int, r1, w1, mbar,
                                            alphaB, baryon, sign), 0.0)
        J20 = J20_fact * deg * gt(thermal.J20_int, r2, w2, mbar, alphaB,
                                  baryon, sign)
        bulk_density = (neq + baryon * J10 * df.G[:, None]
                        + J20 * (df.F / T[:, 0] ** 2)[:, None]) / df.betabulk[:, None]
        mod = neq + c["bulkPi"][:, None] * bulk_density
    else:  # mode 4: z . neq at zero chemical potential
        neq0 = neq_fact * deg * gt(thermal.neq_int, r1, w1, mbar,
                                   jnp.zeros_like(alphaB),
                                   jnp.zeros_like(baryon), sign)
        mod = df.z[:, None] * neq0
    if cfg.df_mode in (3, 4):
        return jnp.where(c["breakdown"][:, None], linear, mod)
    return linear


def _species_yields_fast(c, species, cfg):
    """Fast mode: densities at the surface-averaged state, shared by all
    cells (reference fast_max_particle_number, sampling_kernels.cpp:239-279)."""
    neq = species.equilibrium_density[None, :]
    if cfg.df_mode in (1, 2):
        return jnp.broadcast_to(2.0 * neq, (c["T"].shape[0], species.n_species))
    if cfg.df_mode == 3:
        mod = neq + c["bulkPi"][:, None] * species.bulk_density[None, :]
    else:
        mod = c["df"].z[:, None] * neq
    return jnp.where(c["breakdown"][:, None], 2.0 * neq, mod)


@partial(jax.jit, static_argnames=("cfg",))
def _cell_data_jit(cols, species: SpeciesArrays, df_data: DeltafData,
                   laguerre, plasma_avg, cfg: Config):
    """All per-cell sampler inputs, as a dict of (C,) / (C, S) arrays."""
    return _cell_data_impl(cols, species, df_data, laguerre, plasma_avg,
                           cfg, scalars_only=False)


@partial(jax.jit, static_argnames=("cfg",))
def _cell_scalars_jit(cols, species: SpeciesArrays, df_data: DeltafData,
                      laguerre, plasma_avg, cfg: Config):
    """Scalar pre-pass for the cell-chunked sampler: (sum dn_tot,
    sum mean_cell) of a cell chunk WITHOUT retaining any (C, S) table --
    peak memory is one transient dn_list block.  Runs the same physics as
    _cell_data_jit (the chunked driver needs every chunk's lam before it
    can pin uniform batch shapes)."""
    return _cell_data_impl(cols, species, df_data, laguerre, plasma_avg,
                           cfg, scalars_only=True)


def _cell_data_impl(cols, species: SpeciesArrays, df_data: DeltafData,
                    laguerre, plasma_avg, cfg: Config, scalars_only: bool):
    c = prepare_cells(cols, cfg, df_data)
    tau = c["tau"]

    basis = lrf.milne_basis(c["ut"], c["ux"], c["uy"], c["un"], tau)
    dst, dsx, dsy, dsz = lrf.boost_dsigma_to_lrf(
        basis, c["dat"], c["dax"], c["day"], c["dan"],
        c["ut"], c["ux"], c["uy"], c["un"])
    ds_space, ds_max = lrf.dsigma_magnitude(dst, dsx, dsy, dsz)

    piL = lrf.boost_pimunu_to_lrf(basis, c["pitt"], c["pitx"], c["pity"],
                                  c["pitn"], c["pixx"], c["pixy"], c["pixn"],
                                  c["piyy"], c["piyn"], c["pinn"], tau)
    VL = lrf.boost_Vmu_to_lrf(basis, c["Vt"], c["Vx"], c["Vy"], c["Vn"], tau)
    Vdsigma = (c["Vt"] * c["dat"] + c["Vx"] * c["dax"] + c["Vy"] * c["day"]
               + c["Vn"] * c["dan"])

    df = c["df"]
    zl = jnp.zeros_like(tau)
    if cfg.df_mode == 3:
        T_mod = c["T"] + c["bulkPi"] * df.F / df.betabulk
        alphaB_mod = c["alphaB"] + c["bulkPi"] * df.G / df.betabulk
        shear_mod = 0.5 / df.betapi
        bulk_mod = c["bulkPi"] / (3.0 * df.betabulk)
        diff_mod = c["T"] / df.betaV
    elif cfg.df_mode == 4:
        T_mod, alphaB_mod = c["T"], zl
        shear_mod = 0.5 / df.betapi
        bulk_mod = df.lam
        diff_mod = zl
    else:
        T_mod, alphaB_mod = c["T"], c["alphaB"]
        shear_mod = bulk_mod = diff_mod = zl

    if cfg.df_mode in (3, 4):
        A = (1.0 + piL[0] * shear_mod + bulk_mod,
             piL[1] * shear_mod, piL[2] * shear_mod,
             1.0 + piL[3] * shear_mod + bulk_mod,
             piL[4] * shear_mod,
             1.0 + piL[5] * shear_mod + bulk_mod)
        _, detA = _adjugate_sym(A)
        c["detA"] = detA
        if cfg.df_mode == 3:
            if cfg.fast:
                # breakdown from the average state (reference fast path,
                # does_feqmod_breakdown with fast=1, emissionfunction.cpp:114-120)
                from ..io.deltaf import evaluate_df_coefficients
                T_avg, muB_avg = plasma_avg
                zero = jnp.zeros_like(T_avg)
                df_avg = evaluate_df_coefficients(
                    df_data, cfg.df_mode, bool(cfg.include_baryon),
                    T_avg, muB_avg, zero, zero, zero)
                dfb = jax.tree.map(lambda a: jnp.broadcast_to(a, tau.shape),
                                   df_avg)
                cavg = dict(T=jnp.broadcast_to(T_avg, tau.shape),
                            bulkPi=c["bulkPi"], detA=detA, df=dfb)
                breakdown = _mode3_breakdown(cavg, laguerre, cfg)
            else:
                breakdown = _mode3_breakdown(c, laguerre, cfg)
        else:
            # mode 4 normally never falls back (J. Bernhard's sampler;
            # reference: emissionfunction.cpp:139-149), EXCEPT where the
            # transform A loses positive definiteness under strong
            # negative bulk (detA <= deta_min): there f_mod is undefined,
            # so route to the linearized Jonah df -- the same deliberate,
            # documented divergence as the smooth feqmod kernel
            # (_prepare_feqmod_cells), keeping sampler and smooth spectra
            # consistent on strong-bulk surfaces.
            breakdown = detA <= cfg.deta_min
    else:
        breakdown = jnp.zeros_like(tau, dtype=bool)
    c["breakdown"] = breakdown

    if cfg.fast:
        dn_list = _species_yields_fast(c, species, cfg)
    else:
        dn_list = _species_yields_exact(c, species, laguerre, cfg)
    dn_list = jnp.maximum(dn_list, 0.0)     # negative weights would be UB
    # photons cannot be sampled by this method (reference exits at :479);
    # exclude massless species from the categorical instead
    dn_list = jnp.where(species.mass[None, :] > 0.0, dn_list, 0.0)

    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5
    dn_tot = jnp.sum(dn_list, axis=1) * (2.0 * y_max * ds_max)
    dn_tot = jnp.where(c["valid"], dn_tot, 0.0)

    # mean yield for the oversampling estimate (reference
    # estimate_mean_particle_number, sampling_kernels.cpp:200-236)
    neq_s = species.equilibrium_density[None, :]
    if cfg.df_mode == 4:
        per_sp = jnp.where(breakdown[:, None],
                           (1.0 + df.delta_z[:, None]) * neq_s,
                           df.z[:, None] * neq_s)
        mean_cell = c["udsigma"] * jnp.sum(per_sp, axis=1)
    else:
        mean_cell = (c["udsigma"] * jnp.sum(
            neq_s + c["bulkPi"][:, None] * species.bulk_density[None, :], axis=1)
            - ds_space * Vdsigma * jnp.sum(species.diff_density))
    mean_cell = jnp.where(c["valid"], mean_cell, 0.0)

    if scalars_only:
        return dict(lam=jnp.sum(dn_tot), mean=jnp.sum(mean_cell))

    out = dict(
        tau=tau, x=c["x"], y=c["y"], eta=c["eta"],
        T=c["T"], alphaB=c["alphaB"], T_mod=T_mod, alphaB_mod=alphaB_mod,
        shear_mod=shear_mod, bulk_mod=bulk_mod, diff_mod=diff_mod,
        breakdown=breakdown, benth=c["baryon_enthalpy_ratio"],
        bulkPi=c["bulkPi"],
        dst=dst, dsx=dsx, dsy=dsy, dsz=dsz, ds_max=ds_max,
        ut=c["ut"], ux=c["ux"], uy=c["uy"], un=c["un"],
        Xt=basis.Xt, Xx=basis.Xx, Xy=basis.Xy, Xn=basis.Xn,
        Yx=basis.Yx, Yy=basis.Yy, Zt=basis.Zt, Zn=basis.Zn,
        pixx=piL[0], pixy=piL[1], pixz=piL[2], piyy=piL[3], piyz=piL[4],
        pizz=piL[5],
        Vx=VL[0], Vy=VL[1], Vz=VL[2],
        # per-cell species CDF: the per-slot species draw binary-searches
        # rowcum (one scalar gather per step) instead of gathering a whole
        # (n_cap, S) block of rows -- that block was both the HBM whale
        # (n_cap x S x 4B per event) and, on TPU, the gather whale
        rowcum=jnp.cumsum(dn_list, axis=1),
        dn_tot=dn_tot, cum_dn=jnp.cumsum(dn_tot),
        mean_cell=mean_cell,
    )
    if cfg.sampler_alias:
        out.update(_build_alias_tables(dn_list, dn_tot))
    # per-cell df coefficients needed by the hadron-level viscous weight
    for name in ("c0", "c1", "c2", "c3", "c4", "shear14", "F", "G",
                 "betabulk", "betaV", "betapi", "delta_lambda", "delta_z"):
        out["df_" + name] = getattr(df, name)
    return out


def _species_yields_vah(c, species, laguerre):
    """Per-(cell, species) densities for anisotropic-hydro sampling:
    2 * a_L * neq(Lambda) (the d^3p = a_L d^3q jacobian of the
    Romatschke-Strickland stretch; factor 2 is the viscous-weight budget,
    same convention as the VH max densities)."""
    from .common import effective_chunk
    r1, w1 = laguerre[1]
    C = c["Lambda"].shape[0]
    S = species.n_species
    B = effective_chunk(C, C, S * r1.shape[0])

    def block(Lam, aL):
        mbar = species.mass[None, :] / Lam[:, None]
        zero = jnp.zeros_like(mbar)
        neq = (Lam[:, None] ** 3 / TWO_PI2_HBARC3
               * species.degeneracy[None, :]
               * thermal.gauss_thermal(thermal.neq_int, r1, w1, mbar, zero,
                                       zero, species.sign[None, :]))
        return 2.0 * aL[:, None] * neq

    if B >= C:
        return block(c["Lambda"], c["aL"])
    nB = -(-C // B)
    pad = nB * B - C

    def prep(v):
        if pad:
            v = jnp.concatenate([v, jnp.ones((pad,), dtype=v.dtype)])
        return v.reshape(nB, B)

    out = jax.lax.map(lambda t: block(t[0], t[1]),
                      (prep(c["Lambda"]), prep(c["aL"])))
    return out.reshape(nB * B, S)[:C]


@partial(jax.jit, static_argnames=("cfg",))
def _vah_cell_data_jit(cols, species: SpeciesArrays, laguerre, cfg: Config):
    """Per-cell sampler inputs for anisotropic-hydro surfaces (modes 2-3).

    The reference has no working counterpart (its VAH sampler is a stub,
    sampling_kernels.cpp:1231-1239); validation is statistical agreement
    with our VAH smooth kernel (test_sampler_vah.py)."""
    return _vah_cell_data_impl(cols, species, laguerre, cfg,
                               scalars_only=False)


@partial(jax.jit, static_argnames=("cfg",))
def _vah_cell_scalars_jit(cols, species: SpeciesArrays, laguerre,
                          cfg: Config):
    """VAH twin of _cell_scalars_jit (cell-chunked sampler pre-pass)."""
    return _vah_cell_data_impl(cols, species, laguerre, cfg,
                               scalars_only=True)


def _vah_cell_data_impl(cols, species: SpeciesArrays, laguerre, cfg: Config,
                        scalars_only: bool):
    c = dict(cols)
    tau = c["tau"]
    ut = lrf.u_tau(c["ux"], c["uy"], c["un"], tau)
    c["ut"] = ut
    basis = lrf.milne_basis(ut, c["ux"], c["uy"], c["un"], tau)
    dst, dsx, dsy, dsz = lrf.boost_dsigma_to_lrf(
        basis, c["dat"], c["dax"], c["day"], c["dan"],
        ut, c["ux"], c["uy"], c["un"])
    ds_space, ds_max = lrf.dsigma_magnitude(dst, dsx, dsy, dsz)
    udsigma = (ut * c["dat"] + c["ux"] * c["dax"] + c["uy"] * c["day"]
               + c["un"] * c["dan"])
    valid = udsigma > 0.0

    piL = lrf.boost_pimunu_to_lrf(basis, c["pitt"], c["pitx"], c["pity"],
                                  c["pitn"], c["pixx"], c["pixy"], c["pixn"],
                                  c["piyy"], c["piyn"], c["pinn"], tau)
    # W^mu orthogonality completion (vah.py / smooth_kernels.cpp:2247-2251)
    u0 = jnp.sqrt(1.0 + c["ux"] ** 2 + c["uy"] ** 2)
    Wt = (c["ux"] * c["Wx"] + c["uy"] * c["Wy"]) * ut / (u0 * u0)
    Wn = Wt * c["un"] / ut
    WL = lrf.boost_Vmu_to_lrf(basis, Wt, c["Wx"], c["Wy"], Wn, tau)

    dn_list = jnp.maximum(_species_yields_vah(c, species, laguerre), 0.0)
    dn_list = jnp.where(species.mass[None, :] > 0.0, dn_list, 0.0)

    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5
    dn_tot = jnp.sum(dn_list, axis=1) * (2.0 * y_max * ds_max)
    dn_tot = jnp.where(valid, dn_tot, 0.0)
    mean_cell = jnp.where(valid, udsigma * jnp.sum(dn_list, axis=1) * 0.5,
                          0.0)

    if scalars_only:
        return dict(lam=jnp.sum(dn_tot), mean=jnp.sum(mean_cell))

    out = dict(
        tau=tau, x=c["x"], y=c["y"], eta=c["eta"],
        Lambda=c["Lambda"], aL=c["aL"], bulkPi=c["bulkPi"],
        c0=c["c0"], c1=c["c1"], c2=c["c2"], c3=c["c3"], c4=c["c4"],
        pixx=piL[0], pixy=piL[1], pixz=piL[2], piyy=piL[3], piyz=piL[4],
        pizz=piL[5], Wlx=WL[0], Wly=WL[1], Wlz=WL[2],
        dst=dst, dsx=dsx, dsy=dsy, dsz=dsz, ds_max=ds_max,
        ut=ut, ux=c["ux"], uy=c["uy"], un=c["un"],
        Xt=basis.Xt, Xx=basis.Xx, Xy=basis.Xy, Xn=basis.Xn,
        Yx=basis.Yx, Yy=basis.Yy, Zt=basis.Zt, Zn=basis.Zn,
        rowcum=jnp.cumsum(dn_list, axis=1),
        dn_tot=dn_tot, cum_dn=jnp.cumsum(dn_tot), mean_cell=mean_cell,
    )
    if cfg.sampler_alias:
        out.update(_build_alias_tables(dn_list, dn_tot))
    return out


def _vah_sampler_cols(surface, cfg):
    """Columns the VAH sampler needs, with the same viscous-switch zero
    filling the VAH smooth kernel applies (vah.py)."""
    z = jnp.zeros_like(surface.tau)
    get = lambda name: getattr(surface, name, None)
    cols = dict(tau=surface.tau, x=surface.x, y=surface.y,
                dat=surface.dat, dax=surface.dax, day=surface.day,
                dan=surface.dan, ux=surface.ux, uy=surface.uy, un=surface.un)
    cols["eta"] = surface.eta if surface.eta is not None else z
    if surface.Lambda is None or surface.aL is None:
        raise ValueError("VAH sampler needs Lambda and aL (mode 2/3 surface)")
    cols["Lambda"] = surface.Lambda
    cols["aL"] = surface.aL
    shear_on = bool(cfg.include_shear_deltaf)
    bulk_on = bool(cfg.include_bulk_deltaf)
    for name in ("pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
                 "piyy", "piyn", "pinn", "Wx", "Wy"):
        v = get(name)
        cols[name] = v if (shear_on and v is not None) else z
    v = get("bulkPi")
    cols["bulkPi"] = v if (bulk_on and v is not None) else z
    for name in ("c0", "c1", "c2", "c3", "c4"):
        v = get(name)
        on = shear_on if name in ("c3", "c4") else bulk_on
        cols[name] = v if (on and v is not None) else z
    return cols


# ======================================================================
# Phase B: one event = a fixed-capacity batch of hadron slots
# ======================================================================

def _df_weight(cfg, g, E, px, py, pz, mass2, sign, baryon):
    """Viscous weight (1 + df)/2 for the linear branch
    (reference compute_df_weight, sampling_kernels.cpp:361-453)."""
    pipp = (px * px * g["pixx"] + py * py * g["piyy"] + pz * pz * g["pizz"]
            + 2.0 * (px * py * g["pixy"] + px * pz * g["pixz"]
                     + py * pz * g["piyz"]))
    Vp = -(px * g["Vx"] + py * g["Vy"] + pz * g["Vz"])
    T = g["T"]
    bulkPi = g["bulkPi"]

    if cfg.df_mode == 1:
        chem = baryon * g["alphaB"]
        feqbar = 1.0 - sign / (jnp.exp(E / T - chem) + sign)
        df_shear = pipp / g["df_shear14"]
        df_bulk = ((g["df_c0"] - g["df_c2"]) * mass2
                   + (baryon * g["df_c1"] + (4.0 * g["df_c2"] - g["df_c0"]) * E) * E) * bulkPi
        df_diff = (baryon * g["df_c3"] + g["df_c4"] * E) * Vp
        df_tot = feqbar * (df_shear + df_bulk + df_diff)
    elif cfg.df_mode in (2, 3):
        chem = baryon * g["alphaB"]
        feqbar = 1.0 - sign / (jnp.exp(E / T - chem) + sign)
        df_shear = pipp / (2.0 * E * g["df_betapi"] * T)
        df_bulk = (baryon * g["df_G"] + g["df_F"] * E / T**2
                   + (E - mass2 / E) / (3.0 * T)) * bulkPi / g["df_betabulk"]
        df_diff = (g["benth"] - baryon / E) * Vp / g["df_betaV"]
        df_tot = feqbar * (df_shear + df_bulk + df_diff)
    else:  # mode 4 linearized (Jonah)
        feqbar = 1.0 - sign / (jnp.exp(E / T) + sign)
        df_shear = feqbar * pipp / (2.0 * E * g["df_betapi"] * T)
        df_bulk = (g["df_delta_z"] - 3.0 * g["df_delta_lambda"]
                   + feqbar * g["df_delta_lambda"] * (E - mass2 / E) / T)
        df_tot = df_shear + df_bulk

    df_tot = jnp.clip(df_tot, -1.0, 1.0)
    return 0.5 * (1.0 + df_tot)


def _propose(key, mbar, sign, chem, pending):
    """One synchronized rejection round for all pending hadron slots.

    Light hadrons (mbar < 1.008): p^2 e^{-p} proposal via three exponential
    deviates (reference :481-517).  Heavy: 3-component k^j e^{-k} mixture
    (reference :520-599).  Both are evaluated elementwise and selected by
    mask.  Returns (accept, pbar, phi, costheta)."""
    n = mbar.shape[0]
    u = jax.random.uniform(key, (5, n), dtype=mbar.dtype,
                           minval=jnp.finfo(mbar.dtype).tiny, maxval=1.0)
    l1, l2, l3 = jnp.log(u[0]), jnp.log(u[1]), jnp.log(u[2])
    l12 = l1 + l2
    mbar2 = mbar * mbar

    # ---- light branch
    pbar_l = -(l1 + l2 + l3)
    Ebar_l = jnp.sqrt(pbar_l * pbar_l + mbar2)
    phi_l = l12 * l12 / (pbar_l * pbar_l)
    cos_l = (l1 - l2) / l12
    weq_max = jnp.where((mbar < 0.8554) & (sign == -1.0),
                        pion_thermal_weight_max(mbar), 1.0)
    # exp(pbar) / (exp(Ebar) + sign), with exp(pbar) = 1/(u0 u1 u2)
    w_l = jnp.exp(pbar_l - Ebar_l) / (1.0 + sign * jnp.exp(-Ebar_l)) / weq_max

    # ---- heavy branch: pick the k^j e^-k component
    w0 = mbar2
    w1 = 2.0 * mbar
    tot = w0 + w1 + 2.0
    r = u[3] * tot
    j1 = (r >= w0) & (r < w0 + w1)
    j2 = r >= (w0 + w1)
    kbar = jnp.where(j2, -(l1 + l2 + l3), jnp.where(j1, -l12, -l1))
    phi_h = jnp.where(j2, l12 * l12 / (kbar * kbar),
                      jnp.where(j1, -l1 / kbar, u[1]))
    cos_h = jnp.where(j2, (l1 - l2) / l12, 2.0 * u[2] - 1.0)
    Ebar_h = kbar + mbar
    pbar_h = jnp.sqrt(jnp.maximum(Ebar_h * Ebar_h - mbar2, 0.0))
    e = jnp.exp(Ebar_h - chem)
    w_h = pbar_h / Ebar_h * e / (e + sign)

    light = mbar < MBAR_LIGHT
    pbar = jnp.where(light, pbar_l, pbar_h)
    Ebar = jnp.where(light, Ebar_l, Ebar_h)
    phi = TWO_PI * jnp.where(light, phi_l, phi_h)
    cost = jnp.where(light, cos_l, cos_h)
    w = jnp.where(light, w_l, w_h)

    accept = pending & (u[4] < w)
    return accept, pbar, Ebar, phi, cost


def _row_categorical(rowcum, cidx, v):
    """First s with rowcum[cidx, s] >= v, by vectorized binary search --
    one scalar gather per halving instead of gathering whole rows.  The
    search interval has width S, so pinning lo needs ceil(log2(S+1)) <=
    S.bit_length() halvings (one fewer mis-assigns species whenever S is
    a power of two)."""
    S = rowcum.shape[1]
    flat = rowcum.reshape(-1)
    base = cidx * S
    lo = jnp.zeros(cidx.shape, dtype=jnp.int32)
    hi = jnp.full(cidx.shape, S, dtype=jnp.int32)
    for _ in range(S.bit_length()):
        mid = (lo + hi) // 2
        go_right = flat[base + mid] < v
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.clip(lo, 0, S - 1)


# per-cell fields needed before the keep decision (momentum sampling +
# feqmod rescale + viscous/flux weights), pruned per df_mode so the hot
# per-slot row gather moves as few bytes as possible
_PRE_COMMON = ("T", "alphaB", "benth", "bulkPi",
               "pixx", "pixy", "pixz", "piyy", "piyz", "pizz",
               "Vx", "Vy", "Vz", "dst", "dsx", "dsy", "dsz", "ds_max")
_PRE_DF = {
    1: ("df_c0", "df_c1", "df_c2", "df_c3", "df_c4", "df_shear14"),
    2: ("df_betapi", "df_F", "df_G", "df_betabulk", "df_betaV"),
    3: ("df_betapi", "df_F", "df_G", "df_betabulk", "df_betaV",
        "T_mod", "alphaB_mod", "breakdown", "shear_mod", "bulk_mod",
        "diff_mod"),
    4: ("df_betapi", "df_delta_lambda", "df_delta_z",
        "T_mod", "breakdown", "shear_mod", "bulk_mod", "diff_mod"),
}

# anisotropic-hydro (VAH) sampling: f_a at (Lambda, a_L) + residual
# 14-moment corrections in the LRF.  The shear / bulk groups are gathered
# only when their (static) switches are on -- with the vah_df_gate that
# means a production VAH surface (no c0..c4 columns) gathers 7 + 16
# instead of 22 + 16 row fields per slot
_PRE_VAH_BASE = ("Lambda", "aL", "dst", "dsx", "dsy", "dsz", "ds_max")
_PRE_VAH_SHEAR = ("c3", "c4", "pixx", "pixy", "pixz", "piyy", "piyz",
                  "pizz", "Wlx", "Wly", "Wlz")
_PRE_VAH_BULK = ("bulkPi", "c0", "c1", "c2")


def _pre_fields(cfg):
    if cfg.mode in (2, 3):
        fields = _PRE_VAH_BASE
        if cfg.include_shear_deltaf:
            fields = fields + _PRE_VAH_SHEAR
        if cfg.include_bulk_deltaf:
            fields = fields + _PRE_VAH_BULK
        return fields
    return _PRE_COMMON + _PRE_DF[cfg.df_mode]

# per-cell fields used only after the keep decision (lab-frame boost +
# spacetime coordinates); gathered per SLOT in the same combined row
# gather as the pre-keep fields -- a kept-only post-compaction gather was
# tried and measured ~20% slower (see _one_event_lrf docstring)
_LAB_FIELDS = ("tau", "x", "y", "eta", "ut", "ux", "uy", "un",
               "Xt", "Xx", "Xy", "Xn", "Yx", "Yy", "Zt", "Zn")
# the 8 Milne tetrad components are pure arithmetic of (u, tau), both
# already in the row: cfg.sampler_gather_tetrad=0 drops them from the
# gather and rebuilds the basis per slot (TPU gathers cost per ELEMENT,
# so 8 fewer gathered fields trade against cheap VPU math; see
# experiments/probe_sampler_device.py round-5 A/B)
_LAB_FIELDS_NOTETRAD = ("tau", "x", "y", "eta", "ut", "ux", "uy", "un")


def _lab_fields(cfg) -> tuple:
    return (_LAB_FIELDS if getattr(cfg, "sampler_gather_tetrad", 1)
            else _LAB_FIELDS_NOTETRAD)


def _lab_kinematics(rows, mass, E, px, py, pz, key_y, cfg):
    """Boost LRF momenta to the lab frame and reconstruct spacetime /
    rapidity coordinates (tail of the reference's per-hadron loop,
    sampling_kernels.cpp:1144-1192).  The tetrad either rides the row
    gather or is recomputed per slot from (u, tau) -- same formula as
    phase A's lrf.milne_basis, so the boost consumes identical values
    either way (reference: viscous_correction.cpp:10-29, where the
    tetrad is likewise derived data)."""
    fields = _lab_fields(cfg)
    g = {k: rows[:, i] for i, k in enumerate(fields)}
    if "Xt" in g:
        basis = lrf.MilneBasis(Xt=g["Xt"], Xx=g["Xx"], Xy=g["Xy"],
                               Xn=g["Xn"], Yx=g["Yx"], Yy=g["Yy"],
                               Zt=g["Zt"], Zn=g["Zn"])
    else:
        basis = lrf.milne_basis(g["ut"], g["ux"], g["uy"], g["un"],
                                g["tau"])
    ptau, px_lab, py_lab, pn = lrf.boost_pLRF_to_lab(
        basis, g["ut"], g["ux"], g["uy"], g["un"], E, px, py, pz)

    tau = g["tau"]
    mass2 = mass * mass
    mT = jnp.sqrt(mass2 + px_lab**2 + py_lab**2)
    dtype = rows.dtype
    if cfg.dimension == 2:
        # boost-invariant: sample rapidity uniformly, reconstruct (pz, eta)
        # (reference :1168-1192)
        y_max = cfg.y_cut
        u = jax.random.uniform(key_y, (rows.shape[0],), dtype=dtype)
        yp = y_max * (2.0 * u - 1.0)
        sinhy = jnp.sinh(yp)
        coshy = jnp.sqrt(1.0 + sinhy * sinhy)
        sinheta = (ptau * sinhy - tau * pn * coshy) / mT
        eta_out = jnp.arcsinh(sinheta)
        cosheta = jnp.sqrt(1.0 + sinheta * sinheta)
        pz_lab = mT * sinhy
        E_lab = mT * coshy
    else:
        eta_out = g["eta"]
        sinheta = jnp.sinh(eta_out)
        cosheta = jnp.cosh(eta_out)
        pz_lab = tau * pn * cosheta + ptau * sinheta
        E_lab = jnp.sqrt(mass2 + px_lab**2 + py_lab**2 + pz_lab**2)
        yp = 0.5 * jnp.log((E_lab + pz_lab) / (E_lab - pz_lab))

    return dict(tau=tau, x=g["x"], y=g["y"], eta=eta_out,
                sinheta=sinheta, cosheta=cosheta,
                E=E_lab, px=px_lab, py=py_lab, pz=pz_lab, yp=yp)


def _one_event_lrf(cell, species: SpeciesArrays, key, lam, n_cap: int,
                   cfg: Config):
    """Sample one event's hadron slots through the keep decision.

    Returns per-slot (keep, cidx, sidx), LRF-frame (E, px, py, pz), mass,
    lab_rows, and acceptance counters.  The row gather pulls the 16
    lab-boost fields together with the pre-keep fields: one combined
    gather is cheaper on TPU than a second post-compaction gather (a
    kept-only-boost variant measured ~20% slower end to end; the
    per-df-mode pruning here is neutral-to-slightly-positive -- 199 vs
    195 k hadrons/s medians, within the rig's measurement noise -- and
    moves fewer HBM bytes)."""
    dtype = cell["tau"].dtype
    ks = jax.random.split(key, 8)

    n = jax.random.poisson(ks[0], lam)
    slot = jnp.arange(n_cap) < n

    if cfg.sampler_alias:
        # O(1) alias draws: the binary-search formulation below costs
        # 17 + 9 data-dependent scalar-gather rounds per slot and was the
        # dominant device phase (probe_sampler_device, round 4)
        cidx, sidx = _alias_cell_species_draw(cell, ks[1], ks[5], ks[2],
                                              n_cap, dtype)
    else:
        # cell assignment ~ Categorical(dn_tot / lam) via inverse CDF
        u_cell = jax.random.uniform(ks[1], (n_cap,), dtype=dtype) * lam
        cidx = jnp.clip(
            jnp.searchsorted(cell["cum_dn"], u_cell, side="right"),
            0, cell["cum_dn"].shape[0] - 1)

        # species assignment ~ Categorical(dn_list[cell]) via binary
        # search in the cell's cumulative row: sidx = first s with
        # rowcum[c, s] >= v, identical to counting (cum < u_s) over a
        # gathered row but using ceil(log2 S) scalar gathers per slot
        # instead of an (n_cap, S) block
        S = species.n_species
        v = (jax.random.uniform(ks[2], (n_cap,), dtype=dtype)
             * cell["rowcum"][cidx, S - 1])
        sidx = _row_categorical(cell["rowcum"], cidx, v)

    # one contiguous row gather for the per-cell scalars, pruned per df_mode:
    # separate (C,) gathers cost one index resolution each on TPU; the stack
    # is event-independent so XLA hoists it out of the event vmap
    gkeys = _pre_fields(cfg) + _lab_fields(cfg)
    packed = jnp.stack([cell[k].astype(dtype) for k in gkeys], axis=1)
    rows = packed[cidx]                                # (n_cap, NF)
    g = {k: rows[:, i] for i, k in enumerate(gkeys)}
    mass = species.mass[sidx]
    mass2 = mass * mass
    sign = species.sign[sidx]
    baryon = species.baryon[sidx]

    if cfg.mode in (2, 3):
        # VAH: f_a(p) = feq_iso(q; Lambda) under q = (px, py, pz / a_L)
        # (Romatschke-Strickland form; E_a^2 = (u.p)^2 + xi_L (z.p)^2
        #  = m^2 + q^2 with xi_L = 1/a_L^2 - 1), so sample q isotropically
        # at temperature Lambda, zero chemical potential, then stretch
        # pz = a_L qz.  The reference's VAH sampler is a stub
        # (sampling_kernels.cpp:1231-1239); the d^3p = a_L d^3q jacobian
        # lives in the a_L * neq(Lambda) categorical densities.
        use_mod = jnp.zeros_like(slot)
        T_eff = g["Lambda"]
        chem_s = jnp.zeros_like(T_eff)
    elif cfg.df_mode in (1, 2):
        use_mod = jnp.zeros_like(slot)
        T_eff = g["T"]
        chem_s = baryon * g["alphaB"]
    else:
        use_mod = ~(g["breakdown"] > 0.5)
        T_eff = jnp.where(use_mod, g["T_mod"], g["T"])
        if cfg.df_mode == 4:
            # Jonah's feqmod samples at zero chemical potential (:1111-1117)
            chem_s = jnp.where(use_mod, 0.0, baryon * g["alphaB"])
        else:
            chem_s = baryon * jnp.where(use_mod, g["alphaB_mod"], g["alphaB"])
    mbar = mass / T_eff

    # ---- batched rejection: all pending slots propose each round
    def cond(st):
        done, _, _, _, _, rounds, _, nsamp = st
        return (~jnp.all(done)) & (rounds < MAX_REJECTION_ROUNDS)

    def body(st):
        done, pbar, Ebar, phi, cost, rounds, k, nsamp = st
        k, sub = jax.random.split(k)
        nsamp = nsamp + jnp.sum(~done).astype(nsamp.dtype)
        acc, pb, Eb, ph, ct = _propose(sub, mbar, sign, chem_s, ~done)
        pbar = jnp.where(acc, pb, pbar)
        Ebar = jnp.where(acc, Eb, Ebar)
        phi = jnp.where(acc, ph, phi)
        cost = jnp.where(acc, ct, cost)
        return (done | acc, pbar, Ebar, phi, cost, rounds + 1, k, nsamp)

    # seed the carry from shard-varying data so the while_loop carry types
    # match under shard_map as well as plain jit
    z = 0.0 * T_eff
    st0 = (~slot, z, z + 1.0, z, z, jnp.int32(0), ks[3],
           (0 * n).astype(jnp.int32))
    done, pbar, Ebar, phi, cost, rounds, _, nsamp = lax.while_loop(cond, body, st0)
    sampled_ok = done & slot

    sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 0.0))
    E = Ebar * T_eff
    p = pbar * T_eff
    px = p * sint * jnp.cos(phi)
    py = p * sint * jnp.sin(phi)
    pz = p * cost

    # ---- VAH momentum stretch pz = a_L qz + residual 14-moment weight
    if cfg.mode in (2, 3):
        pz = g["aL"] * pz
        E = jnp.sqrt(mass2 + px * px + py * py + pz * pz)
        # residual df in the LRF: (z.p) = -pz, (W.p) = -(W_L . p_vec),
        # pi_munu p^mu p^nu = sum_ij pi_ij p_i p_j (vah.py / smooth_kernels
        # :2306-2349); f_abar at the anisotropic energy is exactly the
        # proposal's 1 - sign/(exp(Ebar) + sign) since Ebar = E_a / Lambda
        fabar = 1.0 - sign / (jnp.exp(Ebar) + sign)
        df_tot = jnp.zeros_like(E)
        if cfg.include_shear_deltaf:
            Wp = g["Wlx"] * px + g["Wly"] * py + g["Wlz"] * pz
            pipp = (px * px * g["pixx"] + py * py * g["piyy"]
                    + pz * pz * g["pizz"]
                    + 2.0 * (px * py * g["pixy"] + px * pz * g["pixz"]
                             + py * pz * g["piyz"]))
            df_tot = df_tot + g["c3"] * pz * Wp + g["c4"] * pipp
        if cfg.include_bulk_deltaf:
            df_tot = df_tot + (g["c0"] * mass2 + g["c1"] * pz * pz
                               + g["c2"] * E * E) * g["bulkPi"]
        df_tot = fabar * df_tot
        if cfg.regulate_deltaf:
            df_tot = jnp.clip(df_tot, -1.0, 1.0)
        # NOTE: the outer clip of (1 + df)/2 to [0, 1] is required by the
        # budget-2 rejection scheme and stays even with regulate_deltaf=0,
        # so on cells where |fabar*df| > 1 the unregulated VAH sampler
        # diverges statistically from smooth_spectra_vah (which applies the
        # unclipped df) -- the same inherent |df| <= 1 budget limitation as
        # the VH sampler's w_visc = (1+df)/2 weight
        w_visc_vah = jnp.clip(0.5 * (1.0 + df_tot), 0.0, 1.0)

    # ---- feqmod momentum rescale p = A p_mod + shifts (reference :619-650)
    if cfg.df_mode in (3, 4) and cfg.mode not in (2, 3):
        dm = g["diff_mod"] * (E * g["benth"] + baryon)
        bx = (1.0 + g["bulk_mod"]) * px + g["shear_mod"] * (
            g["pixx"] * px + g["pixy"] * py + g["pixz"] * pz) + dm * g["Vx"]
        by = (1.0 + g["bulk_mod"]) * py + g["shear_mod"] * (
            g["pixy"] * px + g["piyy"] * py + g["piyz"] * pz) + dm * g["Vy"]
        bz = (1.0 + g["bulk_mod"]) * pz + g["shear_mod"] * (
            g["pixz"] * px + g["piyz"] * py + g["pizz"] * pz) + dm * g["Vz"]
        px = jnp.where(use_mod, bx, px)
        py = jnp.where(use_mod, by, py)
        pz = jnp.where(use_mod, bz, pz)
        E = jnp.where(use_mod, jnp.sqrt(mass2 + px**2 + py**2 + pz**2), E)

    # ---- viscous + flux acceptance
    if cfg.mode in (2, 3):
        w_visc = w_visc_vah
    else:
        w_visc = jnp.where(use_mod, 1.0,
                           _df_weight(cfg, g, E, px, py, pz, mass2, sign,
                                      baryon))
    w_flux = jnp.maximum(0.0, E * g["dst"] - px * g["dsx"] - py * g["dsy"]
                         - pz * g["dsz"]) / (E * g["ds_max"])
    u_keep = jax.random.uniform(ks[4], (n_cap,), dtype=dtype)
    keep = sampled_ok & (u_keep < w_flux * w_visc)

    out = dict(keep=keep, cidx=cidx, sidx=sidx, E=E, px=px, py=py, pz=pz,
               mass=mass, acceptances=jnp.sum(sampled_ok), samples=nsamp)
    out["lab_rows"] = rows[:, len(gkeys) - len(_lab_fields(cfg)):]
    return out


def _one_event(cell, species: SpeciesArrays, key, lam, n_cap: int,
               cfg: Config):
    """Sample one event into fixed-capacity arrays + keep mask.

    Ships the species INDEX as int16 (not the int32 PDG mcid): the PDG
    list is <=~460 species, so 2 bytes suffice, and the host maps
    sidx -> (mcid, mass) with one fancy-index each -- cheaper on the
    bottleneck D2H link and simpler than the searchsorted-on-mcid
    reconstruction it replaces."""
    assert species.n_species <= 32767, "species index must fit int16"
    core = _one_event_lrf(cell, species, key, lam, n_cap, cfg)
    mass = core["mass"]
    lab = _lab_kinematics(core["lab_rows"], mass, core["E"], core["px"],
                          core["py"], core["pz"],
                          jax.random.fold_in(key, 987654321), cfg)
    return dict(
        keep=core["keep"], sidx=core["sidx"].astype(jnp.int16),
        cidx=core["cidx"].astype(jnp.int32), mass=mass,
        tau=lab["tau"], x=lab["x"], y=lab["y"], eta=lab["eta"],
        t=lab["tau"] * lab["cosheta"], z=lab["tau"] * lab["sinheta"],
        E=lab["E"], px=lab["px"], py=lab["py"], pz=lab["pz"], yp=lab["yp"],
        acceptances=core["acceptances"], samples=core["samples"],
    )


EVENT_FIELDS = ("mcid", "mass", "tau", "x", "y", "eta", "t", "z",
                "E", "px", "py", "pz", "yp")


def _index_pack_bits(n_species: int, n_cells: int):
    """Bit position for fusing (species, cell) indices into ONE int32
    transfer word: sidx << cbits | cidx.  Returns None when they don't
    fit in 31 bits (sign bit left clear) -- then sidx ships as int16 and
    cidx as int32 separately.  Both sides derive this from the same
    static shapes, so no layout metadata rides the link."""
    cbits = max(1, (max(n_cells, 1) - 1).bit_length())
    sbits = max(1, (max(n_species, 1) - 1).bit_length())
    return cbits if (cbits + sbits) <= 31 else None


def _pack_fields(cfg: Config, fused_idx: bool) -> tuple:
    """Fields actually transferred device->host; the rest are exact
    functions of these and get rebuilt host-side (the D2H link is the
    bottleneck): mcid = mcids[sidx], mass = mass(sidx),
    E = sqrt(mass^2 + p^2) (on-shell by construction), t = tau cosh(eta),
    z = tau sinh(eta), yp = atanh(pz / E).  Positions ride as the CELL
    INDEX: tau/x/y (and eta in 3+1D -- in 2+1D eta is sampled per hadron)
    are per-cell quantities, so one index replaces 3 (2+1D) or 4 (3+1D)
    f16 fields and the host rebuilds them exactly from a one-time cell
    position table; when species and cell index fit one int32
    (_index_pack_bits) they fuse into ``scidx`` -- 16 -> 12 (2+1D) / 10
    (3+1D) bytes per hadron, and the positions stop paying the f16
    rounding entirely."""
    idx = ("scidx",) if fused_idx else ("sidx", "cidx")
    if cfg.dimension == 2:
        return idx + ("eta", "px", "py", "pz")
    return idx + ("px", "py", "pz")


_PACK_INT = ("sidx", "cidx", "scidx")    # never f16-cast


def _empty_event() -> dict:
    """A zero-hadron event with the full EVENT_FIELDS schema (downstream
    writers/histograms index e['mcid'] etc. unconditionally)."""
    return {k: (np.zeros(0, dtype=np.int64) if k == "mcid"
                else np.zeros(0)) for k in EVENT_FIELDS}


def _pack_cast(packed: dict, cfg: Config) -> dict:
    """Optionally halve the D2H bytes: ship the float fields as f16
    (cfg.sampler_pack == "f16", the default).  f16 keeps 11 significand
    bits -> relative rounding <= 2^-11 ~ 4.9e-4 on momenta (and the 2+1D
    per-hadron eta), far below both the sampler's statistical resolution
    and the reference's own %.6e output precision; E stays exactly
    on-shell because it is rebuilt host-side from the rounded momenta,
    and positions are exact (cell-table indirection, _pack_fields).  The
    species / cell indices ship as int16 / int32 always.  "auto" packs
    f16 only on the f32/bf16 fast path -- f64 parity runs ship exact
    float values."""
    mode = cfg.sampler_pack
    if mode == "auto":
        mode = "f16" if cfg.precision in ("f32", "bf16") else "f32"
    if mode != "f16":
        return packed
    return {k: (v if k in _PACK_INT else v.astype(jnp.float16))
            for k, v in packed.items()}


@partial(jax.jit, static_argnames=("n_cap", "cap_total", "cfg"))
def _event_batch_packed_jit(cell, species, keys, lam, n_cap: int,
                            cap_total: int, cfg: Config):
    """Event batch with on-device stream compaction: only kept hadrons are
    returned, packed event-major into (cap_total,) arrays.  The device to
    host link is the sampler's bottleneck (tens of MB/s through a serving
    tunnel), and typically <30% of slots survive the Poisson+flux+viscous
    acceptance, so packing cuts the transfer by ~4x and removes the host-
    side boolean compaction entirely.  (A kept-only post-compaction boost
    was tried and measured SLOWER -- 176k vs 224k hadrons/s -- because the
    second random-index gather of the 16 lab fields costs more than the
    transcendentals it saves; the single combined row gather wins.)"""
    out = jax.vmap(
        lambda k: _one_event(cell, species, k, lam, n_cap, cfg)
    )(keys)
    cbits = _index_pack_bits(species.n_species, cell["tau"].shape[0])
    if cbits is not None:
        out["scidx"] = (out["sidx"].astype(jnp.int32) << cbits) | out["cidx"]
    keep = out["keep"].reshape(-1)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, pos, cap_total)     # unkept -> OOB, dropped
    packed = {
        k: jnp.zeros((cap_total,), out[k].dtype)
             .at[idx].set(out[k].reshape(-1), mode="drop")
        for k in _pack_fields(cfg, cbits is not None)}
    counts = jnp.sum(out["keep"], axis=1).astype(jnp.int32)   # (B,)
    return _pack_cast(packed, cfg), counts, out["acceptances"], out["samples"]


# ======================================================================
# Host orchestration
# ======================================================================

def _phase_timer():
    """Opt-in breakdown of the sampler host loop (IS3D_SAMPLER_TIMINGS=1):
    wall seconds in dispatch (async enqueue), transfer_wait (blocking on
    device results), host_assembly (numpy reconstruction + per-event
    slicing)."""
    from ..utils import EnvGatedAccumTimer
    return EnvGatedAccumTimer("IS3D_SAMPLER_TIMINGS")


def _start_host_transfers(packed: dict, *extras) -> None:
    """Queue the device->host copies for a just-dispatched batch.

    np.asarray on a jax.Array only STARTS the transfer when called, so
    without this the drain loop serializes transfer behind compute.
    copy_to_host_async makes the copy begin the moment each result is
    ready on device, overlapping with the in-flight batches' compute on
    the bottleneck link."""
    for v in (*packed.values(), *extras):
        try:
            v.copy_to_host_async()
        except AttributeError:
            pass                        # already a numpy array (CPU tests)


def _bucket_len(n_kept: int, cap: int, granule: int) -> int:
    """Transfer length for a drained batch: the kept-hadron count rounded
    up to a granule.  The packed buffer is sized with ~25% systematic
    headroom (_packed_capacity) that would otherwise ride the bottleneck
    D2H link as dead bytes every batch; slicing to the actual count needs
    a concrete length per dispatch, and the granule bounds the number of
    distinct slice shapes (compiled executables) at O(cap / granule)."""
    if n_kept >= cap:
        return cap
    return min(cap, -(-max(n_kept, 1) // granule) * granule)


def _transfer_granule(cap: int) -> int:
    return max(cap // 8, 1 << 14)


class _DrainWorker:
    """Single FIFO drain thread: overlaps the host-side numpy event
    assembly of batch k with the device compute and D2H transfer of
    batches k+1..  (Sequential drains on the dispatch thread leave the
    bottleneck link idle during every reconstruction -- measured ~15% of
    the sampler's end-to-end budget.)  One thread, FIFO queue: event
    order is preserved and numpy/transfer waits release the GIL.  The
    bounded queue is the in-flight batch limit (device buffers stay alive
    while queued)."""

    def __init__(self, fn, maxsize: int = 3):
        import queue
        import threading
        self._q = queue.Queue(maxsize=maxsize)
        self._err = None

        def loop():
            while True:
                item = self._q.get()
                if item is None:
                    return
                if self._err is None:
                    try:
                        fn(item)
                    except BaseException as e:   # re-raised on the caller
                        self._err = e

        self._t = threading.Thread(target=loop, daemon=True,
                                   name="is3d-sampler-drain")
        self._t.start()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def put(self, item) -> None:
        self._check()
        self._q.put(item)

    def close(self) -> None:
        self._q.put(None)
        self._t.join()
        self._check()


def _cell_positions(cell, cfg: Config) -> dict:
    """One-time host copy of the per-cell positions the packed stream
    references by index (see _pack_fields).  (C,) arrays -- tiny next to
    the per-hadron payload they replace."""
    names = ("tau", "x", "y") if cfg.dimension == 2 else ("tau", "x", "y",
                                                          "eta")
    return {k: np.asarray(cell[k], dtype=np.float64) for k in names}


def _reconstruct_packed(packed: dict, mcids_np, mass_np, cellpos: dict,
                        cfg: Config) -> None:
    """Rebuild the derived per-hadron fields host-side from the packed
    transfer fields (in place): (mcid, mass) from the int16 species index,
    (tau, x, y[, eta]) from the int32 cell index via the cell position
    table, on-shell E, (t, z) from (tau, eta), yp.  f16-transferred
    fields are upcast to f32 first (see _pack_cast)."""
    for k, v in packed.items():
        if v.dtype == np.float16:
            packed[k] = v.astype(np.float32)
    n_cells = len(cellpos["tau"])
    if "scidx" in packed:
        cbits = _index_pack_bits(len(mcids_np), n_cells)
        sc = packed.pop("scidx").astype(np.int64)
        sidx = sc >> cbits
        cidx = sc & ((1 << cbits) - 1)
    else:
        sidx = packed.pop("sidx").astype(np.int64)
        cidx = packed.pop("cidx").astype(np.int64)
    sidx = np.clip(sidx, 0, len(mcids_np) - 1)
    packed["mcid"] = mcids_np[sidx]
    packed["mass"] = mass_np[sidx].astype(packed["px"].dtype)
    cidx = np.clip(cidx, 0, n_cells - 1)
    dtype = packed["px"].dtype
    for k in cellpos:
        if k == "eta" and "eta" in packed:
            continue            # 2+1D: eta is per hadron, transferred
        packed[k] = cellpos[k][cidx].astype(dtype)
    # on-shell by construction: E is not transferred at all
    packed["E"] = np.sqrt(packed["mass"]**2 + packed["px"]**2
                          + packed["py"]**2 + packed["pz"]**2)
    packed["t"] = packed["tau"] * np.cosh(packed["eta"])
    packed["z"] = packed["tau"] * np.sinh(packed["eta"])
    with np.errstate(divide="ignore", invalid="ignore"):
        packed["yp"] = 0.5 * np.log(
            (packed["E"] + packed["pz"])
            / np.maximum(packed["E"] - packed["pz"], 1e-45))

def _laguerre_device(dtype):
    from ..io.tables import laguerre_device
    return laguerre_device(32, (1, 2), dtype=dtype)


def _sampler_dtype(surface_dtype):
    """Statistical floor of the sampler: >= f32.  In bfloat16 the cell-CDF
    cumsum saturates (adding a cell's dn ~ 0.3 to a running total a few
    hundred times larger is a no-op with an 8-bit mantissa), so most cells
    of a large surface would silently never emit, and every uniform draw
    and acceptance weight would carry ~2^-8 quantization.  bf16/f16
    surfaces are therefore upcast at the sampler boundary; f64 stays f64."""
    return jnp.promote_types(surface_dtype, jnp.float32)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, tree)


def _sampler_cols(surface, cfg):
    cols = surface_columns(surface, cfg)
    cols["x"] = surface.x
    cols["y"] = surface.y
    return cols


def _sampler_effective_cfg(surface, cfg: Config) -> Config:
    """VAH residual-df gate for the sampler (modes 2/3): chains whose
    coefficient columns are absent or exact zeros are structurally absent
    from the compiled event kernel, and their per-cell rows drop out of
    the per-slot gather (kernels/vah.effective_vah_cfg).  Bit-identical
    events: with zero coefficients the ungated kernel computes df_tot = 0
    exactly, so w_visc = clip(0.5 * (1 + 0)) = 0.5 either way -- the same
    acceptance comparisons against the same RNG stream."""
    if cfg.vah_df_gate and cfg.mode in (2, 3):
        from .vah import effective_vah_cfg
        probe = {k: getattr(surface, k, None)
                 for k in ("c0", "c1", "c2", "c3", "c4", "bulkPi")}
        cfg = effective_vah_cfg(probe, cfg)
    # warn only when a residual-df chain is actually live AFTER the gate:
    # with every chain off (or gated out on zero coefficients) df_tot == 0
    # exactly, the clip is a no-op, and no sampler/smooth divergence exists
    if (cfg.mode in (2, 3) and not cfg.regulate_deltaf
            and (cfg.include_shear_deltaf or cfg.include_bulk_deltaf)):
        import warnings
        warnings.warn(
            "VAH sampling with regulate_deltaf=0: the sampler's rejection "
            "scheme still clips the viscous weight (1+df)/2 to [0,1], so on "
            "cells where |f̄_a df| > 1 sampled events diverge "
            "statistically from the unclipped smooth_spectra_vah "
            "(docs/PHYSICS.md, 'VAH sampling and df regulation').",
            stacklevel=3)
    return cfg


def _build_cell_data(surface, species, df_data, cfg, plasma, laguerre):
    """Phase-A dispatch: VH (modes 0/1/4/5/6/7) or VAH (modes 2/3).
    Inputs are upcast to _sampler_dtype."""
    dtype = _sampler_dtype(surface.tau.dtype)
    species = _cast_floats(species, dtype)
    if cfg.mode in (2, 3):
        cols = _cast_floats(_vah_sampler_cols(surface, cfg), dtype)
        return _vah_cell_data_jit(cols, species, laguerre, cfg)
    plasma_avg = (jnp.asarray(plasma.temperature, dtype),
                  jnp.asarray(plasma.baryon_chemical_potential, dtype))
    return _cell_data_jit(_cast_floats(_sampler_cols(surface, cfg), dtype),
                          species, _cast_floats(df_data, dtype), laguerre,
                          plasma_avg, cfg)


def _mean_total_yield(cell, cfg) -> float:
    """Physical mean hadrons per event (2+1D includes the 2 y_cut factor)."""
    ntot = float(jnp.sum(cell["mean_cell"]))
    if cfg.dimension == 2:
        ntot *= 2.0 * cfg.y_cut
    return abs(ntot)


def _oversample_nevents(nevents, cell, cfg) -> int:
    """Oversampling event-count policy, shared by the single-chip and
    sharded paths (reference: emissionfunction.cpp:1524-1532)."""
    if nevents is not None:
        return nevents
    return _oversample_nevents_scalar(nevents, _mean_total_yield(cell, cfg),
                                      cfg)


def _oversample_nevents_scalar(nevents, ntot: float, cfg) -> int:
    """Same policy from the already-reduced physical mean yield (the
    cell-chunked driver accumulates ntot across chunks)."""
    if nevents is not None:
        return nevents
    if not cfg.oversample:
        return 1
    return max(1, min(int(math.ceil(cfg.min_num_hadrons / max(ntot, 1e-30))),
                      cfg.max_num_samples))


def _slot_capacity(lam: float) -> int:
    """Per-event hadron-slot capacity: mean + 10 sigma, padded to 128."""
    n_cap = int(lam + 10.0 * math.sqrt(lam) + 64.0)
    return -(-n_cap // 128) * 128


def _resolve_seed(seed, cfg) -> int:
    if seed is None:
        seed = cfg.sampler_seed
    if seed < 0:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    return seed


def _batch_width(nevents: int, n_cap: int) -> int:
    """Events per compiled batch under the 4M slot budget: the device-side
    cost is fixed per slot, so wider batches amortize dispatch round-trips
    and drain overhead (measured 299 -> 410 k kept hadrons/s going 2M ->
    4M at lambda ~ 350k; peak scratch ~0.9 GB).  Equal-size batches avoid
    both a ragged-tail recompile and padded-batch waste."""
    b_max = max(1, min(nevents, (1 << 22) // n_cap))
    n_batches = -(-nevents // b_max)
    return -(-nevents // n_batches)


def _packed_capacity(B: int, ntot_est: float, n_cap: int) -> int:
    """Packed-output capacity for a B-event batch: mean yield + 10 sigma
    + 25% systematic headroom (the linearized mean-yield estimate can run
    a few percent off the sampled yield -- clipped df weights, feqmod
    breakdown branches -- and overflow aborts the run)."""
    cap = int(1.25 * B * ntot_est + 10.0 * math.sqrt(B * ntot_est) + 1024.0)
    return min(-(-cap // 128) * 128, B * n_cap)


def calculate_total_yield(surface, species, df_data, cfg, plasma,
                          laguerre=None) -> float:
    """Mean total hadron yield of the surface (reference:
    sampling_kernels.cpp:653-831).  In 2+1D the yield is dN/dy * 2 Y_CUT.
    Above the sampler_cell_chunk bound the mean accumulates over cell
    chunks through the scalar pre-pass (no (C, S) materialization)."""
    if laguerre is None:
        laguerre = _laguerre_device(surface.tau.dtype)
    C = surface.tau.shape[0]
    chunk = _resolve_cell_chunk(cfg, C)
    if chunk is not None:
        cfg_eff = _sampler_effective_cfg(surface, cfg)
        dtype = _sampler_dtype(surface.tau.dtype)
        sp = _cast_floats(species, dtype)
        vah = cfg_eff.mode in (2, 3)
        cols = _cast_floats(
            _vah_sampler_cols(surface, cfg_eff) if vah
            else _sampler_cols(surface, cfg_eff), dtype)
        if not vah:
            df_cast = _cast_floats(df_data, dtype)
            plasma_avg = (jnp.asarray(plasma.temperature, dtype),
                          jnp.asarray(plasma.baryon_chemical_potential,
                                      dtype))
        ntot = 0.0
        for lo in range(0, C, chunk):
            cc = _chunk_cols(cols, lo, min(lo + chunk, C), chunk)
            s = (_vah_cell_scalars_jit(cc, sp, laguerre, cfg_eff) if vah
                 else _cell_scalars_jit(cc, sp, df_cast, laguerre,
                                        plasma_avg, cfg_eff))
            ntot += float(s["mean"])
    else:
        cell = _build_cell_data(surface, species, df_data, cfg, plasma,
                                laguerre)
        ntot = float(jnp.sum(cell["mean_cell"]))
    if cfg.dimension == 2:
        ntot *= 2.0 * cfg.y_cut
    return ntot


def sample_particles(surface, species: SpeciesArrays, mcids, grid,
                     df_data: DeltafData, cfg: Config, plasma,
                     particle_table=None, nevents: Optional[int] = None,
                     seed: Optional[int] = None, laguerre=None,
                     events_per_batch: Optional[int] = None,
                     mesh=None,
                     event_partition: Optional[tuple] = None,
                     info: Optional[dict] = None) -> list:
    """Sample particle event lists.  Returns a list of per-event dicts of
    numpy arrays (keys: mcid, t, x, y, z, E, px, py, pz, mass, tau, eta, yp).

    Orchestration mirrors the reference's operation=2 path
    (emissionfunction.cpp:1504-1562): optional oversampling picks
    Nevents = min(ceil(min_num_hadrons / Ntot), max_num_samples).

    With ``mesh``, the cell axis is sharded over the device mesh and every
    device samples its own cell shard (exact by Poisson superposition);
    see sample_particles_sharded.

    ``event_partition=(k, n)`` samples only the k-th of n balanced
    contiguous slices of the GLOBAL event range.  Event i's stream depends
    only on fold_in(base_key, i) with the GLOBAL index i, so the
    concatenation of all n workers' slices is BYTE-identical to the
    single-worker run -- the pod-mode sampler (api.py operation=2 under
    jax.distributed) and any share-nothing worker pool split work this
    way.  The global event count (oversampling included) is derived
    identically by every worker from the same surface.

    ``info``: optional dict the call fills with ``event_lo`` (the GLOBAL
    index of the first returned event) and ``nevents_global`` -- callers
    decaying a partition slice pass event_lo to decay_events so the MC
    cascade's lineage streams stay partition-invariant.
    """
    if event_partition is not None:
        k, n = event_partition
        if mesh is not None:
            raise ValueError("event_partition composes with the per-process "
                             "single-chip sampler; the cell-sharded mesh "
                             "sampler has its own per-device streams")
        if not (0 <= int(k) < int(n)):
            raise ValueError(f"event_partition must be (k, n) with "
                             f"0 <= k < n, got {event_partition}")
    if mesh is not None:
        if events_per_batch is not None:
            raise ValueError("events_per_batch is a single-chip batching "
                             "knob; the sharded sampler derives its batch "
                             "width from the slot budget")
        ev = sample_particles_sharded(
            surface, species, mcids, df_data, cfg, plasma, mesh,
            nevents=nevents, seed=seed, laguerre=laguerre)
        if info is not None:
            info.update(event_lo=0, nevents_global=len(ev))
        return ev
    cfg = _sampler_effective_cfg(surface, cfg)
    dtype = _sampler_dtype(surface.tau.dtype)
    species = _cast_floats(species, dtype)
    if laguerre is None:
        laguerre = _laguerre_device(dtype)
    chunk = _resolve_cell_chunk(cfg, surface.tau.shape[0])
    if chunk is not None:
        return _sample_cell_chunked(
            surface, species, mcids, df_data, cfg, plasma, laguerre,
            dtype, chunk, nevents=nevents, seed=seed,
            event_partition=event_partition, info=info)
    cell = _build_cell_data(surface, species, df_data, cfg, plasma, laguerre)

    def _slice(n_global: int) -> tuple:
        if event_partition is None:
            return 0, n_global
        k, n = (int(v) for v in event_partition)
        return (k * n_global) // n, ((k + 1) * n_global) // n

    lam = float(jnp.sum(cell["dn_tot"]))
    if lam <= 0.0:
        lo0, hi0 = _slice(nevents or 1)
        if info is not None:
            info.update(event_lo=lo0, nevents_global=nevents or 1)
        return [_empty_event() for _ in range(hi0 - lo0)]

    nevents = _oversample_nevents(nevents, cell, cfg)
    ev_lo, ev_hi = _slice(nevents)
    if info is not None:
        info.update(event_lo=ev_lo, nevents_global=nevents)
    if ev_hi == ev_lo:
        return []
    n_cap = _slot_capacity(lam)
    base_key = jax.random.key(_resolve_seed(seed, cfg))
    if events_per_batch is None:
        events_per_batch = _batch_width(ev_hi - ev_lo, n_cap)

    mcids_np = np.asarray(mcids, dtype=np.int64)
    mass_np = np.asarray(species.mass, dtype=np.float64)
    lam_dev = jnp.asarray(lam, dtype)

    B = events_per_batch
    ntot_est = min(_mean_total_yield(cell, cfg), lam) or lam
    cap_total = _packed_capacity(B, ntot_est, n_cap)
    timings = _phase_timer()
    events = []
    total_acc, total_samp = _drain_event_range(
        cell, species, cfg, base_key, ev_lo, ev_hi, B, n_cap, cap_total,
        lam_dev, mcids_np, mass_np, timings, events)
    timings.report("sample_particles")

    if total_samp:
        eff = 100.0 * total_acc / total_samp
        print(f"Momentum sampling efficiency = {eff:.2f} %")
    return events


def _drain_event_range(cell, species, cfg: Config, base_key, ev_lo: int,
                       ev_hi: int, B: int, n_cap: int, cap_total: int,
                       lam_dev, mcids_np, mass_np, timings,
                       events: list) -> tuple:
    """Dispatch + drain every event batch in [ev_lo, ev_hi) against ONE
    cell-data dict, appending per-event dicts to ``events``.  The shapes
    (B, n_cap, cap_total) are caller-pinned so the cell-chunked driver can
    run MANY chunks through one compiled program.  Returns
    (acceptances, samples) totals."""
    granule = _transfer_granule(cap_total)
    cellpos = _cell_positions(cell, cfg)
    total_acc = total_samp = 0

    def drain(item):
        nonlocal total_acc, total_samp
        b, packed, counts, acc, samp = item
        with timings("transfer_wait"):
            counts = np.asarray(counts)  # blocks until this batch computed
            # hadrons are packed event-major, so the first b events occupy
            # exactly the first sum(counts[:b]) slots; slice the transfer
            # to that (bucketed) length -- the capacity headroom and any
            # ragged-tail events never ride the bottleneck link
            n_kept = int(counts[:b].sum())
            if n_kept > cap_total:
                raise RuntimeError(
                    f"sampler packed-output overflow: {n_kept} kept "
                    f"hadrons > capacity {cap_total}; the mean-yield estimate "
                    "is inconsistent with the sampled yield")
            n_pad = _bucket_len(n_kept, cap_total, granule)
            cut = {k: v[:n_pad] for k, v in packed.items()}
            _start_host_transfers(cut)
            cut = {k: np.asarray(v) for k, v in cut.items()}
            total_acc += int(np.asarray(acc)[:b].sum())
            total_samp += int(np.asarray(samp)[:b].sum())
        with timings("host_assembly"):
            offsets = np.concatenate([[0], np.cumsum(counts[:b])])
            _reconstruct_packed(cut, mcids_np, mass_np, cellpos, cfg)
            for e in range(b):
                lo, hi = int(offsets[e]), int(offsets[e + 1])
                events.append({k: cut[k][lo:hi] for k in EVENT_FIELDS})

    # pipeline: the dispatch thread keeps batches in flight while a single
    # FIFO drain thread overlaps transfer waits AND numpy event assembly
    # with the in-flight batches' compute; the bounded queue is the
    # in-flight limit
    worker = _DrainWorker(drain)
    try:
        for start in range(ev_lo, ev_hi, B):
            b = min(B, ev_hi - start)
            # dispatch a full-width batch even for the ragged tail: one
            # compiled shape total, and per-event statistics are unchanged
            # because event i depends only on fold_in(base_key, i)
            with timings("dispatch"):
                keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                    jnp.arange(start, start + B))
                packed, counts, acc, samp = _event_batch_packed_jit(
                    cell, species, keys, lam_dev, n_cap, cap_total, cfg)
                _start_host_transfers({}, counts, acc, samp)
            worker.put((b, packed, counts, acc, samp))
    finally:
        worker.close()
    return total_acc, total_samp

# ======================================================================
# Cell-chunked sampling: bounded phase-A memory at any surface size
# ======================================================================
# The reference sampler streams cells serially with O(S) memory per cell
# (dn_list.resize inside the cell loop, sampling_kernels.cpp:878,
# 1040-1042), so it handles arbitrarily large surfaces.  The vectorized
# phase A above instead materializes ~4 (C, S) tables (rowcum + alias
# pair + transient dn_list) -- ~51 GB at 10M cells x 444 species vs 16 GB
# HBM.  This driver restores the unbounded-surface capability the TPU
# way: disjoint cell chunks are INDEPENDENT sub-surfaces by Poisson
# superposition (the same argument the cell-sharded mesh sampler uses
# across devices, applied serially), so each chunk runs the full
# two-phase sampler under its own derived seed and the per-event hadron
# lists concatenate across chunks.  Exact in distribution; the random
# streams depend on the (deterministic) chunk plan, so results are
# reproducible given (seed, cfg.sampler_cell_chunk, C) but differ from
# the unchunked path's streams -- the same contract as the mesh sampler.
#
# Memory: one chunk's phase A lives at a time (<= chunk x S tables);
# batch shapes (n_cap, cap_total, B) are pinned from the worst chunk's
# scalar pre-pass so every chunk reuses ONE compiled event program.  The
# pre-pass re-runs the species-yield quadrature (scalars only, no (C, S)
# retention) -- a one-time ~2x phase-A compute cost, paid instead of an
# unbounded (C, S) footprint.

def _resolve_cell_chunk(cfg: Config, n_cells: int):
    """Chunk size in cells, or None for the single-phase-A fast path
    (see Config.sampler_cell_chunk)."""
    v = int(getattr(cfg, "sampler_cell_chunk", 0))
    if v < 0:
        return None
    if v == 0:
        return (1 << 19) if n_cells > (1 << 20) else None
    return v if n_cells > v else None


def _chunk_seed(seed: int, chunk_idx: int) -> int:
    """Independent per-chunk sampler seed: a pure function of (seed,
    chunk index) through a SeedSequence branch distinct from both the
    event fold_in stream and the decay-seed branch (0x6D63)."""
    return int(np.random.SeedSequence(
        (int(seed), 0x63636B, int(chunk_idx))).generate_state(
            2, dtype=np.uint64)[0] % (2**63))


def _chunk_cols(cols: dict, lo: int, hi: int, target: int) -> dict:
    """Slice [lo, hi) of every cell column, padded to ``target`` cells
    with inert entries (dsigma = 0 => udsigma = 0 => invalid => zero
    yield; physical fields pad to 1 to keep 1/T etc. finite)."""
    from ..parallel.mesh import _pad_cols_to
    out = {k: v[lo:hi] for k, v in cols.items()}
    out, n_valid = _pad_cols_to(out, target)
    if n_valid != target:
        mask = (jnp.arange(target) < n_valid).astype(out["tau"].dtype)
        for k in ("dat", "dax", "day", "dan"):
            out[k] = out[k] * mask
    return out


def _sample_cell_chunked(surface, species: SpeciesArrays, mcids,
                         df_data, cfg: Config, plasma, laguerre, dtype,
                         chunk: int, nevents=None, seed=None,
                         event_partition=None, info=None) -> list:
    """Cell-chunked sampling driver (module comment above).  Composes
    with event_partition: streams key on (chunk, GLOBAL event), so the
    union of event slices is byte-identical to the full chunked run."""
    vah = cfg.mode in (2, 3)
    cols = _cast_floats(
        _vah_sampler_cols(surface, cfg) if vah else _sampler_cols(surface,
                                                                  cfg),
        dtype)
    if not vah:
        df_cast = _cast_floats(df_data, dtype)
        plasma_avg = (jnp.asarray(plasma.temperature, dtype),
                      jnp.asarray(plasma.baryon_chemical_potential, dtype))
    C = cols["tau"].shape[0]
    n_chunks = -(-C // chunk)
    bounds = [(ci * chunk, min((ci + 1) * chunk, C))
              for ci in range(n_chunks)]

    def build(ci, scalars: bool):
        cc = _chunk_cols(cols, *bounds[ci], chunk)
        if vah:
            fn = _vah_cell_scalars_jit if scalars else _vah_cell_data_jit
            return fn(cc, species, laguerre, cfg)
        fn = _cell_scalars_jit if scalars else _cell_data_jit
        return fn(cc, species, df_cast, laguerre, plasma_avg, cfg)

    # scalar pre-pass: every chunk's (lam, mean) without (C, S) retention
    lam_chunks, mean_chunks = [], []
    for ci in range(n_chunks):
        s = build(ci, scalars=True)
        lam_chunks.append(float(s["lam"]))
        mean_chunks.append(float(s["mean"]))
    lam_max = max(lam_chunks)
    ntot = sum(mean_chunks)
    if cfg.dimension == 2:
        ntot *= 2.0 * cfg.y_cut
    ntot = abs(ntot)

    def _slice(n_global: int) -> tuple:
        if event_partition is None:
            return 0, n_global
        k, n = (int(v) for v in event_partition)
        return (k * n_global) // n, ((k + 1) * n_global) // n

    if lam_max <= 0.0:
        lo0, hi0 = _slice(nevents or 1)
        if info is not None:
            info.update(event_lo=lo0, nevents_global=nevents or 1)
        return [_empty_event() for _ in range(hi0 - lo0)]

    nevents = _oversample_nevents_scalar(nevents, ntot, cfg)
    ev_lo, ev_hi = _slice(nevents)
    if info is not None:
        info.update(event_lo=ev_lo, nevents_global=nevents)
    if ev_hi == ev_lo:
        return []

    # shapes pinned to the WORST chunk -> one compiled event program
    seed = _resolve_seed(seed, cfg)
    n_cap = _slot_capacity(lam_max)
    B = _batch_width(ev_hi - ev_lo, n_cap)
    ntot_est = max(min(m * ((2.0 * cfg.y_cut) if cfg.dimension == 2
                            else 1.0), lm) or lm
                   for m, lm in zip(np.abs(mean_chunks), lam_chunks))
    cap_total = _packed_capacity(B, ntot_est, n_cap)

    mcids_np = np.asarray(mcids, dtype=np.int64)
    mass_np = np.asarray(species.mass, dtype=np.float64)
    timings = _phase_timer()
    n_ev = ev_hi - ev_lo
    merged = [{k: [] for k in EVENT_FIELDS} for _ in range(n_ev)]
    total_acc = total_samp = 0
    for ci in range(n_chunks):
        if lam_chunks[ci] <= 0.0:
            continue                      # inert chunk: zero contribution
        cell = build(ci, scalars=False)
        base_key = jax.random.key(_chunk_seed(seed, ci))
        ev_chunk = []
        acc, samp = _drain_event_range(
            cell, species, cfg, base_key, ev_lo, ev_hi, B, n_cap,
            cap_total, jnp.asarray(lam_chunks[ci], dtype), mcids_np,
            mass_np, timings, ev_chunk)
        total_acc += acc
        total_samp += samp
        for i, ev in enumerate(ev_chunk):
            for k in EVENT_FIELDS:
                merged[i][k].append(ev[k])
    timings.report("sample_particles (cell-chunked)")

    events = []
    for m in merged:
        if m["mcid"]:
            events.append({k: np.concatenate(v) for k, v in m.items()})
        else:
            events.append(_empty_event())
    if total_samp:
        eff = 100.0 * total_acc / total_samp
        print(f"Momentum sampling efficiency = {eff:.2f} %")
    return events


# ======================================================================
# Multi-chip sampling: shard the cell axis over a device mesh
# ======================================================================

def sample_particles_sharded(surface, species: SpeciesArrays, mcids,
                             df_data: DeltafData, cfg: Config, plasma, mesh,
                             nevents: Optional[int] = 1,
                             seed: Optional[int] = None,
                             laguerre=None) -> list:
    """Cell-sharded multi-chip sampling.

    By Poisson superposition the union of hadrons emitted by disjoint cell
    subsets IS an exact sample of the full surface, so each device runs the
    complete two-phase sampler on its own cell shard (local categorical,
    local Poisson total) for every event, and the per-event lists are
    concatenated on the host.  No collectives are needed beyond the final
    gather -- the TPU-native analog of the reference's share-nothing
    process ensemble (SURVEY.md parallelism inventory).
    """
    from jax.sharding import PartitionSpec as P

    cfg = _sampler_effective_cfg(surface, cfg)
    axis = cfg.mesh_axis
    n_dev = mesh.shape[axis]
    dtype = _sampler_dtype(surface.tau.dtype)
    species = _cast_floats(species, dtype)
    df_data = (None if df_data is None else _cast_floats(df_data, dtype))
    if laguerre is None:
        laguerre = _laguerre_device(dtype)
    cols = _cast_floats(
        _vah_sampler_cols(surface, cfg) if cfg.mode in (2, 3)
        else _sampler_cols(surface, cfg), dtype)

    # pad to a multiple of n_dev with inert cells (dsigma pads to 0 =>
    # dn_tot = 0; physical fields pad to 1 -- shared fill list with the
    # smooth sharded path)
    from ..parallel.mesh import _pad_cols_to
    n = cols["tau"].shape[0]
    per_dev = -(-n // n_dev)
    cols, _ = _pad_cols_to(cols, per_dev * n_dev)

    plasma_avg = (jnp.asarray(plasma.temperature, dtype),
                  jnp.asarray(plasma.baryon_chemical_potential, dtype))

    def cell_data(cols_in, species_in, df_in, lag_in, plasma_in):
        if cfg.mode in (2, 3):
            return _vah_cell_data_jit(cols_in, species_in, lag_in, cfg)
        return _cell_data_jit(cols_in, species_in, df_in, lag_in, plasma_in,
                              cfg)

    # Phase A once, shard-locally: the cell-data pipeline (LRF tetrads, df
    # coefficients, feqmod breakdown, exact species-yield quadratures) is
    # the expensive per-surface work, so it must not re-run per batch.
    # out_specs P(axis) re-assembles the per-shard results into global
    # arrays that re-shard to the identical slices in the per-batch call
    # (cum_dn/rowcum are per-shard cumulatives and stay shard-local).
    cell_specs = ({k: P(axis) for k in cols}, P(), P(), P(), P())

    @partial(jax.shard_map, mesh=mesh, in_specs=cell_specs,
             out_specs=P(axis))
    def build_cells(cols_shard, species_r, df_r, lag_r, plasma_r):
        return cell_data(cols_shard, species_r, df_r, lag_r, plasma_r)

    cell_global = build_cells(cols, species, df_data, laguerre, plasma_avg)
    dn_tot = np.asarray(cell_global["dn_tot"]).reshape(n_dev, per_dev)
    lam_max = float(dn_tot.sum(axis=1).max())
    if lam_max <= 0.0:
        return [_empty_event() for _ in range(nevents or 1)]

    nevents = _oversample_nevents(nevents, cell_global, cfg)
    # per-event per-shard slot capacity: worst shard's mean + 10 sigma
    n_cap = _slot_capacity(lam_max)
    base_key = jax.random.key(_resolve_seed(seed, cfg))

    # event batching (one compiled shape) + per-shard packed-output
    # capacity: kept hadrons per event per shard average ntot_shard, so
    # size to the worst shard's mean, exactly like the single-chip path
    B = _batch_width(nevents, n_cap)
    mean_cell = np.asarray(cell_global["mean_cell"]).reshape(n_dev, per_dev)
    ntot_shard = np.abs(mean_cell.sum(axis=1))
    if cfg.dimension == 2:
        ntot_shard = ntot_shard * 2.0 * cfg.y_cut
    ntot_shard_max = float(np.maximum(ntot_shard, 1e-3).max())
    cap_shard = _packed_capacity(B, ntot_shard_max, n_cap)
    # fused (species, GLOBAL cell) transfer index, sized to the padded
    # global cell axis the host position table covers
    cbits_global = _index_pack_bits(species.n_species, per_dev * n_dev)

    in_specs = ({k: P(axis) for k in cell_global}, P(), P())

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=P(axis))
    def run(cell, species_r, keys_r):
        # on-device stream compaction per shard: the device-to-host link is
        # the sampler's bottleneck, so each shard ships only its kept
        # hadrons (packed event-major) + per-event counts instead of the
        # dense (B, n_cap) slot arrays + keep mask
        lam_local = cell["cum_dn"][-1]
        dev = jax.lax.axis_index(axis)

        def one(k):
            return _one_event(cell, species_r, jax.random.fold_in(k, dev),
                              lam_local, n_cap, cfg)

        out = jax.vmap(one)(keys_r)
        # globalize the cell index: the per-shard cell arrays are the
        # contiguous slice [dev*per_dev, (dev+1)*per_dev) of the padded
        # global columns, so one offset makes cidx index the global cell
        # position table on the host
        out["cidx"] = out["cidx"] + jnp.int32(dev) * jnp.int32(
            cell["tau"].shape[0])
        if cbits_global is not None:
            out["scidx"] = ((out["sidx"].astype(jnp.int32) << cbits_global)
                            | out["cidx"])
        keep = out["keep"].reshape(-1)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        idx = jnp.where(keep, pos, cap_shard)    # unkept -> OOB, dropped
        packed = {
            k: jnp.zeros((cap_shard,), out[k].dtype)
                 .at[idx].set(out[k].reshape(-1), mode="drop")
            for k in _pack_fields(cfg, cbits_global is not None)}
        counts = jnp.sum(out["keep"], axis=1).astype(jnp.int32)   # (B,)
        # per-event statistics so the host can exclude ragged-tail events
        # (dispatched for shape stability but never returned)
        res = (_pack_cast(packed, cfg), counts, out["acceptances"],
               out["samples"])
        return jax.tree.map(lambda a: a[None], res)  # leading device axis

    mcids_np = np.asarray(mcids, dtype=np.int64)
    mass_np = np.asarray(species.mass, dtype=np.float64)
    granule = _transfer_granule(cap_shard)
    cellpos = _cell_positions(
        {k: cell_global[k] for k in ("tau", "x", "y", "eta")}, cfg)

    events = []
    total_acc = total_samp = 0
    timings = _phase_timer()

    def drain(item):
        nonlocal total_acc, total_samp
        b, packed, counts, acc, samp = item
        with timings("transfer_wait"):
            counts = np.asarray(counts)          # (D, B)
            kept_shard = counts[:, :b].sum(axis=1)
            if int(kept_shard.max()) > cap_shard:
                raise RuntimeError(
                    f"sharded sampler packed-output overflow: "
                    f"{int(kept_shard.max())} kept hadrons on one "
                    f"shard > capacity {cap_shard}")
            # slice every shard to the worst shard's (bucketed) kept count
            # before the transfer (hadrons are event-major per shard, so
            # the first b events sit in the first kept_shard[d] slots)
            n_pad = _bucket_len(int(kept_shard.max()), cap_shard, granule)
            cut = {k: v[:, :n_pad] for k, v in packed.items()}
            _start_host_transfers(cut)
            cut = {k: np.asarray(v) for k, v in cut.items()}  # (D, n_pad)
            total_acc += int(np.asarray(acc)[:, :b].sum())
            total_samp += int(np.asarray(samp)[:, :b].sum())
        with timings("host_assembly"):
            _reconstruct_packed(cut, mcids_np, mass_np, cellpos, cfg)
            offsets = np.concatenate(
                [np.zeros((n_dev, 1), np.int64),
                 np.cumsum(counts[:, :b], axis=1)], axis=1)   # (D, b+1)
            for e in range(b):
                ev = {}
                for k in EVENT_FIELDS:
                    ev[k] = np.concatenate(
                        [cut[k][d, offsets[d, e]:offsets[d, e + 1]]
                         for d in range(n_dev)])
                events.append(ev)

    worker = _DrainWorker(drain)
    try:
        for start in range(0, nevents, B):
            b = min(B, nevents - start)
            with timings("dispatch"):
                keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                    jnp.arange(start, start + B))
                packed, counts, acc, samp = run(cell_global, species, keys)
                _start_host_transfers({}, counts, acc, samp)
            worker.put((b, packed, counts, acc, samp))
    finally:
        worker.close()
    timings.report("sample_particles_sharded")

    if total_samp:
        eff = 100.0 * total_acc / total_samp
        print(f"Momentum sampling efficiency = {eff:.2f} %")
    return events
