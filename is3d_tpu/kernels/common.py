"""Shared cell-side preparation for the Cooper-Frye kernels.

Everything here is pure jnp over (C,) cell arrays: velocity completion,
shear-stress closure, diffusion completion, delta-f coefficient evaluation,
and padding/chunking helpers for the lax.scan reduction over cells.

TPU-first design note: instead of the reference's per-cell OpenMP loop with
scalar locals (emissionfunction_smooth_kernels.cpp:106-197), every per-cell
quantity is a vector over the cell axis, computed once per chunk and fused by
XLA into the downstream (cell x momentum) contraction.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..io.surface import Surface
from ..io.deltaf import DeltafData, evaluate_df_coefficients
from ..physics import lrf


@jax.custom_jvp
def fermi_bose(x, s):
    """f = 1 / (e^x + s), the Fermi/Bose/Boltzmann occupation (s = +1/-1/0).

    The primal keeps the kernels' original expression -- the compiled
    forward is BIT-identical to a plain 1/(exp(x)+s), which the
    sharded-vs-single bit-identity suite pins (an algebraically
    rearranged overflow-safe form measurably drifts by ~1 ulp between
    the shard_map and single-device compilations).  The custom derivative
    replaces AD's -e^x/(e^x+s)^2 -- NaN (inf/inf) once e^x overflows at
    fixed-node eta_max ~ 7 grid edges, x ~ 1.4e4 -- with the simplified
    df/dx = -f(1-sf), df/ds = -f^2, which are exact zeros there
    (is3d_tpu.diff needs this; forward-only paths are unaffected)."""
    return 1.0 / (jnp.exp(x) + s)


@fermi_bose.defjvp
def _fermi_bose_jvp(primals, tangents):
    x, s = primals
    dx, ds = tangents
    f = fermi_bose(x, s)
    return f, -f * ((1.0 - s * f) * dx + f * ds)


@jax.custom_jvp
def scaled_fermi_bose(a, x, s):
    """f = a / (e^x + s): occupation with a folded-in scale factor.

    Same contract as fermi_bose, for call sites whose forward expression is
    ``a / (exp(x) + s)`` (the feqmod kernel's renormalized f_mod): the
    primal keeps that exact expression -- rewriting it as
    ``a * fermi_bose(x, s)`` turns one divide into reciprocal+multiply and
    measurably drifts the compiled forward -- while the custom derivative
    avoids AD's -a e^x/(e^x+s)^2 NaN (inf/inf) where e^x overflows:
    df/da = g, df/dx = -a g (1 - s g), df/ds = -a g^2 with g = 1/(e^x+s),
    all exact zeros there."""
    return a / (jnp.exp(x) + s)


@scaled_fermi_bose.defjvp
def _scaled_fermi_bose_jvp(primals, tangents):
    a, x, s = primals
    da, dx, ds = tangents
    ex = jnp.exp(x)
    g = 1.0 / (ex + s)          # the scale-free occupation, 0 at overflow
    return a / (ex + s), g * da - a * g * ((1.0 - s * g) * dx + g * ds)


def accum_dtype(dtype):
    """Accumulator dtype for the chunked cell reduction: at least f32.
    bf16 inputs keep the (C, R, S, M) elementwise block -- the bandwidth-
    bound cost -- in bf16, but accumulating dozens of chunk partials in an
    8-bit mantissa loses ~sqrt(n_chunks) * 2^-8 (measured 9% on dN/dy at
    72 chunks); promoting only the carry removes that for free.  f32/f64
    inputs are unchanged (bit-identical paths stay bit-identical)."""
    return jnp.promote_types(dtype, jnp.float32)


def carry_seed_zero(cols: dict):
    """Exact +0.0 scalar DERIVED FROM the surface data, for seeding scan
    carries: under shard_map a plain constant carry has the wrong
    varying-manual-axes type, so the seed must trace back to the sharded
    input.  nan_to_num first -- with a raw `0.0 * x[0]` one non-finite
    surface value (a corrupt corona row the validity mask would drop from
    every sum) turns the seed into NaN and poisons the whole accumulator."""
    return 0.0 * jnp.nan_to_num(cols["tau"].ravel()[0], nan=0.0,
                                posinf=0.0, neginf=0.0)


def required_fields(cfg) -> list:
    req = ["tau", "dat", "dax", "day", "dan", "ux", "uy", "un", "T"]
    if cfg.dimension == 3:
        req.append("eta")
    if cfg.include_shear_deltaf:
        req += ["pixx", "pixy", "pixn", "piyy", "piyn"]
    if cfg.include_bulk_deltaf:
        req += ["bulkPi"]
    if cfg.include_baryon:
        req += ["muB"]
        if cfg.include_baryondiff_deltaf:
            req += ["nB", "Vx", "Vy", "Vn"]
    if cfg.df_mode in (1, 2, 3, 4) and cfg.mode in (0, 1, 4, 5, 6, 7):
        req += ["E", "P"]
    return req


def surface_columns(surface: Surface, cfg) -> dict:
    """Extract the cell columns a VH kernel needs, zero-filling switched-off
    viscous blocks exactly like the reference's SoA unpack
    (emissionfunction.cpp:1420-1499 + kernel-side zero defaults)."""
    n = surface.n_cells
    z = jnp.zeros(n, dtype=surface.tau.dtype)
    get = lambda name: getattr(surface, name)
    cols = {k: get(k) for k in ("tau", "dat", "dax", "day", "dan",
                                "ux", "uy", "un", "T")}
    cols["eta"] = get("eta") if surface.eta is not None else z
    cols["E"] = get("E") if surface.E is not None else z
    cols["P"] = get("P") if surface.P is not None else z
    for name in ("pixx", "pixy", "pixn", "piyy", "piyn"):
        v = get(name)
        cols[name] = v if (cfg.include_shear_deltaf and v is not None) else z
    v = surface.bulkPi
    cols["bulkPi"] = v if (cfg.include_bulk_deltaf and v is not None) else z
    use_bdiff = cfg.include_baryon and cfg.include_baryondiff_deltaf
    cols["muB"] = surface.muB if (cfg.include_baryon and surface.muB is not None) else z
    for name in ("nB", "Vx", "Vy", "Vn"):
        v = get(name)
        cols[name] = v if (use_bdiff and v is not None) else z
    return cols


def prepare_cells(cols: dict, cfg, df_data: Optional[DeltafData]) -> dict:
    """Complete the hydro fields per cell (jit-friendly).

    Adds: ut, udsigma, valid mask (u.dsigma > 0, reference
    emissionfunction_smooth_kernels.cpp:137), the reconstructed pi^munu
    closure, V^tau, alphaB, nB/(E+P), and the delta-f coefficient bundle.
    """
    c = dict(cols)
    tau, ux, uy, un = c["tau"], c["ux"], c["uy"], c["un"]
    ut = lrf.u_tau(ux, uy, un, tau)
    c["ut"] = ut
    udsigma = ut * c["dat"] + ux * c["dax"] + uy * c["day"] + un * c["dan"]
    c["udsigma"] = udsigma
    c["valid"] = udsigma > 0.0

    pitt, pitx, pity, pitn, pinn = lrf.reconstruct_pimunu(
        c["pixx"], c["pixy"], c["pixn"], c["piyy"], c["piyn"], ut, ux, uy, un, tau)
    zero_shear = not cfg.include_shear_deltaf
    zl = jnp.zeros_like(tau)
    c["pitt"], c["pitx"], c["pity"], c["pitn"], c["pinn"] = (
        (zl, zl, zl, zl, zl) if zero_shear else (pitt, pitx, pity, pitn, pinn))

    use_bdiff = cfg.include_baryon and cfg.include_baryondiff_deltaf
    if use_bdiff:
        c["Vt"] = lrf.complete_Vmu(c["Vx"], c["Vy"], c["Vn"], ut, ux, uy, un, tau)
        denom = c["E"] + c["P"]
        c["baryon_enthalpy_ratio"] = c["nB"] / denom
        c["alphaB"] = c["muB"] / c["T"]
    else:
        c["Vt"] = zl
        c["baryon_enthalpy_ratio"] = zl
        c["alphaB"] = (c["muB"] / c["T"]) if cfg.include_baryon else zl

    if df_data is not None:
        bulkPi = c["bulkPi"]
        if cfg.df_mode == 4:
            # clamp bulkPi into the Jonah spline domain
            # (reference: emissionfunction_smooth_kernels.cpp:586-594)
            P = c["P"]
            bmax = df_data.bulkPi_over_Peq_max
            bulkPi = jnp.where(bulkPi < -P, -(1.0 - 1.0e-5) * P, bulkPi)
            bulkPi = jnp.where(bulkPi / P > bmax, P * (bmax - 1.0e-5), bulkPi)
            c["bulkPi"] = bulkPi
        c["df"] = evaluate_df_coefficients(
            df_data, cfg.df_mode, bool(cfg.include_baryon),
            c["T"], c["muB"], c["E"], c["P"], bulkPi)
    return c


# columns that must pad with a physical (non-zero) value so kernels stay
# finite on inert pad cells (they appear in denominators / sqrt arguments);
# everything else pads with 0, and dsigma = 0 makes a pad cell's
# contribution exactly zero via the u.dsigma > 0 validity mask.  Shared by
# pad_and_chunk, parallel.mesh._pad_inert, and batch.stack_surfaces.
PAD_ONE_COLUMNS = ("tau", "T", "E", "P", "Lambda", "aL")


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (1 for n <= 1)."""
    return 1 << max(0, (int(n) - 1).bit_length())


def chunk_element_budget() -> int:
    """Per-scan-step element budget for the (chunk x species x momentum)
    block.  On TPU, XLA fuses the block into the reduction so the budget can
    be large; the CPU backend materializes it, so cap tightly there."""
    return (1 << 24) if jax.default_backend() == "cpu" else (1 << 31)


def effective_chunk(requested: int, n_cells: int, per_cell_elems: int) -> int:
    """Bound the scan chunk so the (chunk x species x momentum) elementwise
    block stays within the per-step element budget.  All values are static
    at trace time (shapes + config), so this is free.

    NOTE: under vmap (batch.py) the real block is n_events x this budget;
    the batched entry points pre-divide cfg.cell_chunk by the event count
    (batch._batch_capped_cfg) because this function cannot see the mapped
    axis.
    """
    budget = chunk_element_budget()
    return max(1, min(requested, max(n_cells, 1),
                      max(1, budget // max(per_cell_elems, 1))))


def pad_and_chunk(cols: dict, chunk: int) -> tuple[dict, jnp.ndarray, int]:
    """Pad cell columns to a multiple of ``chunk`` and reshape to
    (n_chunks, chunk).  Returns (chunked columns, valid mask, n_chunks).

    Padding uses benign values (T = 1 to avoid division by zero) and is
    masked out of every reduction — the TPU analog of the reference's
    FO_chunk remainder handling (emissionfunction_smooth_kernels.cpp:102-105).
    """
    n = cols["tau"].shape[0]
    n_chunks = max(1, math.ceil(n / chunk))
    padded = n_chunks * chunk
    pad = padded - n

    mask = jnp.arange(padded) < n

    out = {}
    for k, v in cols.items():
        if pad:
            fill = 1.0 if k in PAD_ONE_COLUMNS else 0.0
            v = jnp.concatenate([v, jnp.full((pad,), fill, dtype=v.dtype)])
        out[k] = v.reshape(n_chunks, chunk)
    return out, mask.reshape(n_chunks, chunk), n_chunks
