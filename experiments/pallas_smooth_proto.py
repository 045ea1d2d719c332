"""Prototype: hand-written Pallas smooth-CF kernel vs the XLA version.

Computes the df-mode-2, 3+1D spectra block with the same factored math as
kernels/smooth.py, as a pallas_call with grid (s_tiles, cell_blocks) and a
VMEM-resident (Y, S_tile, M) accumulator tile.  Run on the real TPU:

    python experiments/pallas_smooth_proto.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sizes (bench config)
C = 32768
S = 320
P, F, Y = 32, 24, 21
M = P * F
S_TILE = int(__import__('os').environ.get('PROTO_S_TILE', 32))
CB = int(__import__('os').environ.get('PROTO_CB', 16))

# cell column order
FIELDS = ("tau", "dat", "dax", "day", "dan", "ut", "ux", "uy", "un", "T",
          "alphaB", "pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
          "piyy", "piyn", "pinn", "Vt", "Vx", "Vy", "Vn", "benth",
          "bulkPi", "eta", "sc", "b0", "b1", "b2", "ibV", "mask")
NF = len(FIELDS)
IDX = {n: i for i, n in enumerate(FIELDS)}


def kernel(cells_ref, mTf_ref, mT2_ref, mTpx_ref, mTpy_ref, pxf_ref, pyf_ref,
           m2_ref, sign_ref, bary_ref, ygrid_ref, out_ref):
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mTf = mTf_ref[:]          # (S_TILE, M)
    mT2 = mT2_ref[:]
    mTpx = mTpx_ref[:]
    mTpy = mTpy_ref[:]
    pxf = pxf_ref[:]          # (1, M)
    pyf = pyf_ref[:]
    m2 = m2_ref[:]            # (S_TILE, 1)
    sign = sign_ref[:]
    bary = bary_ref[:]

    for iy in range(Y):                     # static unroll over rapidity
        yv = ygrid_ref[0, iy]

        def cbody(i, acc2):
            g = lambda n: cells_ref[i, IDX[n]]
            ep = jnp.exp(yv - g("eta"))
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

            W1 = g("dax") * pxf + g("day") * pyf                # (1, M)
            W2 = g("ux") * pxf + g("uy") * pyf
            C4 = (g("pixx") * pxf * pxf + g("piyy") * pyf * pyf
                  + 2.0 * g("pixy") * pxf * pyf)
            D2 = g("Vx") * pxf + g("Vy") * pyf

            pds = mTf * A1 + W1                                  # (S_TILE, M)
            pdotu = mTf * B1 - W2
            pipp = mT2 * C1 + mTpx * C2 + mTpy * C3 + C4
            Vp = mTf * D1 - D2

            chem = bary * g("alphaB")                            # (S_TILE, 1)
            feq = 1.0 / (jnp.exp(pdotu / g("T") - chem) + sign)
            feqbar = 1.0 - sign * feq

            r = 1.0 / pdotu
            df = feqbar * (g("sc") * pipp * r
                           + (g("b0") * pdotu + g("b1") * bary
                              + g("b2") * (pdotu - m2 * r)) * g("bulkPi")
                           + (g("benth") - bary * r) * Vp * g("ibV"))
            df = jnp.clip(df, -1.0, 1.0)
            f = feq * (1.0 + df)
            contrib = jnp.where(pds > 0.0, pds * f, 0.0) * g("mask")
            return acc2 + contrib

        acc2 = jax.lax.fori_loop(0, CB, cbody,
                                 jnp.zeros((S_TILE, M), jnp.float32))
        out_ref[0, iy] = out_ref[0, iy] + acc2


@jax.jit
def pallas_spectra(cells, mTf, mT2, mTpx, mTpy, pxf, pyf, m2, sign, bary, yg):
    n_s = S // S_TILE
    n_cb = C // CB
    import os
    return pl.pallas_call(
        kernel,
        interpret=bool(int(os.environ.get("PALLAS_INTERPRET", "0"))),
        out_shape=jax.ShapeDtypeStruct((n_s, Y, S_TILE, M), jnp.float32),
        grid=(n_s, n_cb),
        in_specs=[
            pl.BlockSpec((CB, NF), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Y, S_TILE, M), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(cells, mTf, mT2, mTpx, mTpy, pxf, pyf, m2, sign, bary, yg)


def main():
    rng = np.random.default_rng(0)
    cells = np.zeros((C, NF), np.float32)
    cells[:, IDX["tau"]] = rng.uniform(1, 10, C)
    cells[:, IDX["dat"]] = rng.uniform(-0.1, 1, C)
    cells[:, IDX["dax"]] = rng.uniform(-0.5, 0.5, C)
    cells[:, IDX["day"]] = rng.uniform(-0.5, 0.5, C)
    cells[:, IDX["ux"]] = rng.uniform(-0.8, 0.8, C)
    cells[:, IDX["uy"]] = rng.uniform(-0.8, 0.8, C)
    cells[:, IDX["un"]] = rng.uniform(-0.05, 0.05, C)
    cells[:, IDX["ut"]] = np.sqrt(1 + cells[:, IDX["ux"]]**2
                                  + cells[:, IDX["uy"]]**2
                                  + (cells[:, IDX["tau"]] * cells[:, IDX["un"]])**2)
    cells[:, IDX["T"]] = rng.uniform(0.148, 0.162, C)
    cells[:, IDX["eta"]] = rng.uniform(-3, 3, C)
    for nm in ("pitt", "pitx", "pity", "pitn", "pixx", "pixy", "pixn",
               "piyy", "piyn", "pinn", "Vt", "Vx", "Vy", "Vn"):
        cells[:, IDX[nm]] = rng.normal(0, 0.003, C)
    cells[:, IDX["bulkPi"]] = rng.normal(0, 0.003, C)
    cells[:, IDX["sc"]] = rng.uniform(1, 2, C)
    cells[:, IDX["b0"]] = rng.uniform(0.1, 1, C)
    cells[:, IDX["b1"]] = rng.uniform(0.1, 1, C)
    cells[:, IDX["b2"]] = rng.uniform(0.1, 1, C)
    cells[:, IDX["ibV"]] = rng.uniform(1, 2, C)
    cells[:, IDX["mask"]] = 1.0

    mass = rng.uniform(0.14, 2.0, S).astype(np.float32)
    pT = np.linspace(0.1, 4.0, P).astype(np.float32)
    phi = np.linspace(0, 2 * np.pi, F, endpoint=False).astype(np.float32)
    px = (pT[:, None] * np.cos(phi)[None]).reshape(M)
    py = (pT[:, None] * np.sin(phi)[None]).reshape(M)
    mT = np.sqrt(mass[:, None] ** 2 + pT[None] ** 2)
    mTf = np.broadcast_to(mT[:, :, None], (S, P, F)).reshape(S, M)
    yg = np.linspace(-5, 5, Y).astype(np.float32)

    args = (
        jnp.asarray(cells),
        jnp.asarray(mTf), jnp.asarray(mTf * mTf),
        jnp.asarray(mTf * px[None]), jnp.asarray(mTf * py[None]),
        jnp.asarray(px[None]), jnp.asarray(py[None]),
        jnp.asarray((mass ** 2)[:, None]),
        jnp.asarray(np.where(rng.random(S) < 0.5, -1.0, 1.0)[:, None].astype(np.float32)),
        jnp.asarray(rng.integers(-1, 2, S)[:, None].astype(np.float32)),
        jnp.asarray(yg[None]),
    )

    out = pallas_spectra(*args)
    out.block_until_ready()
    import numpy as _np
    rng2 = _np.random.default_rng(9)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        # fresh random cells each rep: no layer can serve a cached result
        newc = np.asarray(args[0]).copy()
        newc[:, 0] = rng2.uniform(1, 10, newc.shape[0])
        args = (jnp.asarray(newc),) + args[1:]
        ti = time.perf_counter()
        out = pallas_spectra(*args)
        out.block_until_ready()
        print(f"  rep {i}: {(time.perf_counter()-ti)*1e3:.1f} ms checksum {float(out.sum()):.1f}", flush=True)
    dt = (time.perf_counter() - t0) / reps
    evals = C * S * M * Y
    print("checksum", float(out.sum()))
    print(f"pallas: {dt*1e3:.1f} ms, {evals/dt/1e9:.1f} Geval/s", flush=True)


if __name__ == "__main__" and "--verify" not in __import__("sys").argv:
    main()


def verify():
    """Small-size correctness check vs plain jnp."""
    global C
    import numpy as _np
    rng = np.random.default_rng(1)
    Cs = 32
    cells = np.zeros((Cs, NF), np.float32)
    cells[:, IDX["tau"]] = rng.uniform(1, 3, Cs)
    cells[:, IDX["dat"]] = rng.uniform(0.0, 1, Cs)
    cells[:, IDX["dax"]] = rng.uniform(-0.3, 0.3, Cs)
    cells[:, IDX["day"]] = rng.uniform(-0.3, 0.3, Cs)
    cells[:, IDX["ux"]] = rng.uniform(-0.6, 0.6, Cs)
    cells[:, IDX["uy"]] = rng.uniform(-0.6, 0.6, Cs)
    cells[:, IDX["un"]] = rng.uniform(-0.03, 0.03, Cs)
    cells[:, IDX["ut"]] = np.sqrt(1 + cells[:, IDX["ux"]]**2 + cells[:, IDX["uy"]]**2
                                  + (cells[:, IDX["tau"]]*cells[:, IDX["un"]])**2)
    cells[:, IDX["eta"]] = rng.uniform(-1, 1, Cs)
    for nm in ("pitt","pitx","pity","pitn","pixx","pixy","pixn","piyy","piyn","pinn",
               "Vt","Vx","Vy","Vn"):
        cells[:, IDX[nm]] = rng.normal(0, 0.002, Cs)
    cells[:, IDX["bulkPi"]] = rng.normal(0, 0.002, Cs)
    cells[:, IDX["sc"]] = rng.uniform(1, 2, Cs)
    cells[:, IDX["b0"]] = rng.uniform(0.1, 1, Cs)
    cells[:, IDX["b1"]] = rng.uniform(0.1, 1, Cs)
    cells[:, IDX["b2"]] = rng.uniform(0.1, 1, Cs)
    cells[:, IDX["ibV"]] = rng.uniform(1, 2, Cs)
    cells[:, IDX["mask"]] = 1.0
    cells[:, IDX["T"]] = 0.15
    mass = rng.uniform(0.14, 2.0, S).astype(np.float32)
    pT = np.linspace(0.1, 4.0, P).astype(np.float32)
    phi = np.linspace(0, 2*np.pi, F, endpoint=False).astype(np.float32)
    px = (pT[:, None] * np.cos(phi)[None]).reshape(M)
    py = (pT[:, None] * np.sin(phi)[None]).reshape(M)
    mT = np.sqrt(mass[:, None]**2 + pT[None]**2)
    mTf = np.broadcast_to(mT[:, :, None], (S, P, F)).reshape(S, M)
    yg = np.linspace(-5, 5, Y).astype(np.float32)
    sign = np.where(rng.random(S) < 0.5, -1.0, 1.0).astype(np.float32)
    bary = rng.integers(-1, 2, S).astype(np.float32)

    args = (jnp.asarray(cells), jnp.asarray(mTf), jnp.asarray(mTf*mTf),
            jnp.asarray(mTf*px[None]), jnp.asarray(mTf*py[None]),
            jnp.asarray(px[None]), jnp.asarray(py[None]),
            jnp.asarray((mass**2)[:, None]), jnp.asarray(sign[:, None]),
            jnp.asarray(bary[:, None]), jnp.asarray(yg[None]))

    # pallas with C temporarily = Cs
    
    globals()['C'] = Cs
    got = np.asarray(pallas_spectra(*args))          # (n_s, Y, S_TILE, M)
    got = got.reshape(S // S_TILE, Y, S_TILE, M)
    got = np.transpose(got, (1, 0, 2, 3)).reshape(Y, S, M)

    # reference in numpy f64
    want = np.zeros((Y, S, M))
    for ic in range(Cs):
        g = lambda n: float(cells[ic, IDX[n]])
        for iy, yv in enumerate(yg):
            ch = np.cosh(yv - g("eta")); sh = np.sinh(yv - g("eta"))
            t_sh = sh * g("tau")
            A1 = ch*g("dat") + sh*(g("dan")/g("tau"))
            B1 = ch*g("ut") - sh*(g("tau")*g("un"))
            C1 = ch*ch*g("pitt") + t_sh*t_sh*g("pinn") - 2*ch*t_sh*g("pitn")
            C2 = -2*(ch*g("pitx") - t_sh*g("pixn"))
            C3 = -2*(ch*g("pity") - t_sh*g("piyn"))
            D1 = ch*g("Vt") - t_sh*g("Vn")
            W1 = g("dax")*px + g("day")*py
            W2 = g("ux")*px + g("uy")*py
            C4 = g("pixx")*px*px + g("piyy")*py*py + 2*g("pixy")*px*py
            D2 = g("Vx")*px + g("Vy")*py
            pds = mTf*A1 + W1[None]
            pdotu = mTf*B1 - W2[None]
            pipp = mTf*mTf*C1 + mTf*px[None]*C2 + mTf*py[None]*C3 + C4[None]
            Vp = mTf*D1 - D2[None]
            chem = bary*g("alphaB")
            feq = 1/(np.exp(pdotu/g("T") - chem[:, None]) + sign[:, None])
            feqbar = 1 - sign[:, None]*feq
            r = 1/pdotu
            df = feqbar*(g("sc")*pipp*r + (g("b0")*pdotu + g("b1")*bary[:, None]
                 + g("b2")*(pdotu - (mass**2)[:, None]*r))*g("bulkPi")
                 + (g("benth") - bary[:, None]*r)*Vp*g("ibV"))
            df = np.clip(df, -1, 1)
            f = feq*(1+df)
            want[iy] += np.where(pds > 0, pds*f, 0)
    both = np.isfinite(got) & np.isfinite(want)
    print("finite frac got/want:", np.isfinite(got).mean(), np.isfinite(want).mean())
    err = np.max(np.abs(got[both] - want[both]) / (np.abs(want[both]) + 1e-3))
    print("verify max rel err (finite):", err)


if __name__ == "__main__" and "--verify" in __import__("sys").argv:
    verify()
