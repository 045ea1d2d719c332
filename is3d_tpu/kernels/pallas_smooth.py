"""Pallas TPU kernel for the smooth Cooper-Frye spectra (df modes 1-2).

Hand-scheduled Mosaic kernel computing the same factored math as
kernels/smooth.py: grid (species_tiles, cell_blocks), a VMEM-resident
(Y, S_TILE, M) output tile accumulated across the sequential cell-block
axis, and per (rapidity-node, cell) the four-momentum contractions as
(S_TILE, M)-tile fmas against precomputed composites:

    p.dsigma   = mT A1(c,y) + W1(c,m)
    u.p        = mT B1(c,y) - W2(c,m)
    pi:pp      = mT^2 C1 + mT px C2 + mT py C3 + C4(c,m)
    V.p        = mT D1(c,y) - D2(c,m)

Measured HONESTLY on v5e (fresh inputs every repetition -- the serving
layer caches repeated identical dispatches, which can inflate naive
benchmarks ~30x): 39.5 Geval/s vs 60.9 Geval/s for the fused-XLA kernel.
The XLA path wins because it fuses the ~30-op elementwise chain into
single-pass register-resident loops, while this kernel's chain executes
as separate full-tile VMEM passes (VMEM-bandwidth bound).  The kernel is
therefore a VALIDATED EXPERIMENT, not the production path: it is OPT-IN
(IS3D_ENABLE_PALLAS=1), never selected by default, and should not be
retried as an optimization lead -- a roofline probe (throughput invariant
to integrand complexity, NOTES_ROUND1) shows the XLA kernel is already at
the speed of light for this transcendental-bound workload, and a
vreg-resident S_TILE=8 variant measured SLOWER (11.9 s vs 4.4 s,
per-tile overhead dominates).  It is kept as working evidence of the
hand-scheduling trade-off and as a Mosaic scheduling reference.  Numerics
match the XLA kernel to 1.3e-6 (f32) on real TPU and are pytest-checked
in interpret mode.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import CF_PREFACTOR
from ..config import Config
from .common import prepare_cells

S_TILE = 32
CELL_BLOCK = 16
LANE = 128

# per-cell scalar field order in the packed (C, NF) matrix
FIELDS = ("tau", "dat", "dax", "day", "dan", "ut", "ux", "uy", "un", "T",
          "alphaB", "pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
          "piyy", "piyn", "pinn", "Vt", "Vx", "Vy", "Vn", "benth",
          "bulkPi", "eta", "k_sc", "k_b0", "k_b1", "k_b2", "k_dv",
          "k_c3", "k_c4", "mask")
NF = len(FIELDS)
IDX = {n: i for i, n in enumerate(FIELDS)}


def _kernel(cfg_flags, cells_ref, mTf_ref, mT2_ref, mTpx_ref, mTpy_ref,
            pxf_ref, pyf_ref, m2_ref, sign_ref, bary_ref, yg_ref, yw_ref,
            out_ref):
    """cfg_flags = (df_mode, dimension, regulate, outflow, n_r) static."""
    df_mode, dimension, regulate, outflow, n_r = cfg_flags
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mTf = mTf_ref[:]
    mT2 = mT2_ref[:]
    mTpx = mTpx_ref[:]
    mTpy = mTpy_ref[:]
    pxf = pxf_ref[:]
    pyf = pyf_ref[:]
    m2 = m2_ref[:]
    sign = sign_ref[:]
    bary = bary_ref[:]

    for ir in range(n_r):                    # static unroll over rapidity
        yv = yg_ref[0, ir]
        yw = yw_ref[0, ir]

        def cbody(i, acc2):
            g = lambda n: cells_ref[i, IDX[n]]
            # 2+1D: rapidity node is an eta quadrature node (y = 0);
            # 3+1D: node is the output rapidity, eta from the cell
            delta = (0.0 - yv) if dimension == 2 else (yv - g("eta"))
            ep = jnp.exp(delta)
            em = 1.0 / ep
            ch = 0.5 * (ep + em)
            sh = 0.5 * (ep - em)
            t_sh = sh * g("tau")

            A1 = ch * g("dat") + sh * (g("dan") / g("tau"))
            B1 = ch * g("ut") - sh * (g("tau") * g("un"))
            C1 = (ch * ch * g("pitt") + t_sh * t_sh * g("pinn")
                  - 2.0 * ch * t_sh * g("pitn"))
            C2 = -2.0 * (ch * g("pitx") - t_sh * g("pixn"))
            C3 = -2.0 * (ch * g("pity") - t_sh * g("piyn"))
            D1 = ch * g("Vt") - t_sh * g("Vn")

            W1 = g("dax") * pxf + g("day") * pyf
            W2 = g("ux") * pxf + g("uy") * pyf
            C4 = (g("pixx") * pxf * pxf + g("piyy") * pyf * pyf
                  + 2.0 * g("pixy") * pxf * pyf)
            D2 = g("Vx") * pxf + g("Vy") * pyf

            pds = mTf * A1 + W1
            pdotu = mTf * B1 - W2
            pipp = mT2 * C1 + mTpx * C2 + mTpy * C3 + C4
            Vp = mTf * D1 - D2

            chem = bary * g("alphaB")
            feq = 1.0 / (jnp.exp(pdotu / g("T") - chem) + sign)
            feqbar = 1.0 - sign * feq

            if df_mode == 1:
                # 14-moment: k_sc = 0.5/(T^2(E+P)), k_b0 = c0-c2, k_b1 = c1,
                # k_b2 = 4c2-c0, k_c3 = c3, k_c4 = c4
                df = feqbar * (
                    g("k_sc") * pipp
                    + (g("k_b0") * m2 + (g("k_b1") * bary
                                         + g("k_b2") * pdotu) * pdotu)
                    * g("bulkPi")
                    + (g("k_c3") * bary + g("k_c4") * pdotu) * Vp)
            else:
                # Chapman-Enskog: k_sc = 0.5/(betapi T), k_b0 = F/(T^2 bb),
                # k_b1 = G/bb, k_b2 = 1/(3 T bb), k_dv = 1/betaV
                r = 1.0 / pdotu
                df = feqbar * (
                    g("k_sc") * pipp * r
                    + (g("k_b0") * pdotu + g("k_b1") * bary
                       + g("k_b2") * (pdotu - m2 * r)) * g("bulkPi")
                    + (g("benth") - bary * r) * Vp * g("k_dv"))
            if regulate:
                df = jnp.clip(df, -1.0, 1.0)
            f = feq * (1.0 + df)
            if outflow:
                contrib = jnp.where(pds > 0.0, pds * f, 0.0)
            else:
                contrib = pds * f
            return acc2 + contrib * g("mask")

        acc2 = jax.lax.fori_loop(0, CELL_BLOCK, cbody,
                                 jnp.zeros(mTf.shape, jnp.float32))
        if dimension == 2:
            out_ref[0, 0] = out_ref[0, 0] + yw * acc2
        else:
            out_ref[0, ir] = out_ref[0, ir] + acc2


def _round_up(x, m):
    return -(-x // m) * m


def pallas_available(cfg: Config, dtype) -> bool:
    """Opt-in: the fused-XLA kernel is currently faster (see module
    docstring); set IS3D_ENABLE_PALLAS=1 to use this kernel."""
    if os.environ.get("IS3D_DISABLE_PALLAS"):
        return False
    if cfg.df_mode not in (1, 2) or dtype != jnp.float32:
        return False
    if cfg.remat_scan:
        # remat_scan marks a differentiable / memory-bounded path
        # (diff.spectra_fn, batch.batched_spectra_fn force it on): this
        # kernel has no VJP rule and ignores the remat flag, so it must
        # never be env-selected there
        return False
    interpret = bool(int(os.environ.get("IS3D_PALLAS_INTERPRET", "0")))
    enabled = bool(int(os.environ.get("IS3D_ENABLE_PALLAS", "0")))
    if interpret:
        return True
    return enabled and jax.default_backend() == "tpu"


def smooth_spectra_pallas(cols: dict, species, grid, df_data, cfg: Config):
    """Drop-in replacement for _smooth_spectra_jit on TPU/f32."""
    interpret = bool(int(os.environ.get("IS3D_PALLAS_INTERPRET", "0")))
    return _pallas_spectra_jit(cols, species, grid, df_data, cfg, interpret)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def _pallas_spectra_jit(cols: dict, species, grid, df_data, cfg: Config,
                        interpret: bool):
    dtype = jnp.float32
    c = prepare_cells({k: v.astype(dtype) for k, v in cols.items()}, cfg,
                      df_data)
    df = c["df"]
    T = c["T"]
    zl = jnp.zeros_like(T)

    if cfg.df_mode == 1:
        k_sc = 0.5 / (T * T * (c["E"] + c["P"]))
        k_b0, k_b1, k_b2 = df.c0 - df.c2, df.c1, 4.0 * df.c2 - df.c0
        k_dv = zl
        k_c3, k_c4 = df.c3, df.c4
    else:
        k_sc = 0.5 / (df.betapi * T)
        k_b0 = df.F / (T * T * df.betabulk)
        k_b1 = df.G / df.betabulk
        k_b2 = 1.0 / (3.0 * T * df.betabulk)
        k_dv = 1.0 / df.betaV
        k_c3 = k_c4 = zl

    mask = c["valid"].astype(dtype)
    vals = dict(c)
    vals.update(k_sc=k_sc, k_b0=k_b0, k_b1=k_b1, k_b2=k_b2, k_dv=k_dv,
                k_c3=k_c3, k_c4=k_c4, mask=mask,
                benth=c["baryon_enthalpy_ratio"])
    C = T.shape[0]
    Cp = _round_up(max(C, 1), CELL_BLOCK)
    pad_c = Cp - C
    # pad rows are inert (mask = 0) but numerically safe: tau = T = ut = 1
    pad_vals = {"tau": 1.0, "T": 1.0, "ut": 1.0}
    columns = []
    for name in FIELDS:
        v = vals[name].astype(dtype)
        if name == "tau":
            v = jnp.where(v == 0, 1.0, v)    # pad-safe divisor
        columns.append(jnp.pad(v, (0, pad_c),
                               constant_values=pad_vals.get(name, 0.0)))
    cells = jnp.stack(columns, axis=1)       # (Cp, NF)

    # species/momentum constants, padded to tile multiples
    S = species.n_species
    P, F = grid.n_pT, grid.n_phi
    M = P * F
    Sp = _round_up(S, S_TILE)
    Mp = _round_up(M, LANE)

    mass = jnp.pad(species.mass.astype(dtype), (0, Sp - S))
    sign = jnp.pad(species.sign.astype(dtype), (0, Sp - S),
                   constant_values=1.0)
    bary = jnp.pad(species.baryon.astype(dtype), (0, Sp - S))

    pT = grid.pT.astype(dtype)
    phi = grid.phi.astype(dtype)
    px = jnp.pad((pT[:, None] * jnp.cos(phi)[None]).reshape(M), (0, Mp - M))
    py = jnp.pad((pT[:, None] * jnp.sin(phi)[None]).reshape(M), (0, Mp - M))
    mT = jnp.sqrt(mass[:, None] ** 2 + pT[None, :] ** 2)      # (Sp, P)
    mTf = jnp.pad(jnp.repeat(mT, F, axis=1), ((0, 0), (0, Mp - M)),
                  constant_values=1.0)

    if cfg.dimension == 2:
        yg = grid.eta.astype(dtype)
        yw = grid.eta_weight.astype(dtype)
        n_r = grid.n_eta
        n_y_out = 1
    else:
        yg = grid.y.astype(dtype)
        yw = jnp.ones_like(yg)
        n_r = grid.n_y
        n_y_out = n_r

    n_s = Sp // S_TILE
    n_cb = Cp // CELL_BLOCK
    cfg_flags = (cfg.df_mode, cfg.dimension, bool(cfg.regulate_deltaf),
                 bool(cfg.outflow), int(n_r))

    sm_spec = lambda: pl.BlockSpec((S_TILE, Mp), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    s1_spec = lambda: pl.BlockSpec((S_TILE, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    m1_spec = lambda: pl.BlockSpec((1, Mp), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, cfg_flags),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n_s, n_y_out, S_TILE, Mp),
                                       jnp.float32),
        grid=(n_s, n_cb),
        in_specs=[
            pl.BlockSpec((CELL_BLOCK, NF), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            sm_spec(), sm_spec(), sm_spec(), sm_spec(),
            m1_spec(), m1_spec(),
            s1_spec(), s1_spec(), s1_spec(),
            pl.BlockSpec((1, n_r), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_r), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_y_out, S_TILE, Mp),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(
        cells,
        mTf, mTf * mTf, mTf * px[None], mTf * py[None],
        px[None], py[None],
        (mass ** 2)[:, None], sign[:, None], bary[:, None],
        yg[None], yw[None],
    )
    # (n_s, Yout, S_TILE, Mp) -> (S, P, F, Yout)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(Sp, n_y_out, Mp)
    out = out[:S, :, :M].reshape(S, n_y_out, P, F)
    out = jnp.transpose(out, (0, 2, 3, 1))
    deg = species.degeneracy[:, None, None, None].astype(jnp.float32)
    return CF_PREFACTOR * deg * out
