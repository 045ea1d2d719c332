"""Probe: which reduction structure of the (C, R, S, M) emission block is
fastest for the dN/dX kernel's per-cell dN/dy output?

The spectra kernel reduces over the MAJOR dims (C, R) keeping (S, M) minor
(accumulator stays tile-resident; 59 Geval/s).  dN/dX needs per-cell
outputs, i.e. a reduction over the minor lane dim M (plus R), which showed
41 Geval/s after the relayout.  This probe times a synthetic block with a
representative transcendental producer under several reduction shapes to
see how much of the gap is the lane-dim reduce vs. irreducible.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/probe_dndx_reduce.py

RESULT (one v5e chip, 2026-08-18): spectra-style (S, M) accumulation 66.0
Geval/s; every per-cell XLA variant -- einsum over m, wM folded into the
elementwise chain, per-consumer major-dim partials, explicit matvec --
lands at 49-50.4 Geval/s (within 3% of each other).

RESULT 2 (round 3, 2026-08-20, --pallas): the hand Pallas kernel
(make_pallas_percell: (C, S)/(S, R) accumulators VMEM-resident, lane
reduce as an MXU matvec fused into the producer pass) measures **65.5
Geval/s vs 51.5 einsum_m / 67.8 spectra** on the same synthetic producer
-- so the ~24% per-cell penalty is NOT structural to the hardware, it is
an XLA-lowering cost that Pallas avoids.  HOWEVER the synthetic producer
is ~5 ops + 1 exp; the REAL linear-df chain is ~30 ops, and the round-1
pallas_smooth experiment measured Pallas executing that chain at 39.5 vs
60.9 Geval/s (separate full-tile VMEM passes vs XLA's register-resident
fusion).  Combining the measured producer handicap (x0.65) with the
probe's reduction win bounds a full Pallas dN/dX kernel at ~42 Geval/s
-- below the production XLA kernel (45.7 df1 / 62.3 routed df3,
bench_dndx.py).  Question CLOSED: the reduction is not the bottleneck,
the producer chain is, and that verdict already exists in
kernels/pallas_smooth.py.  Re-open only if Mosaic gains elementwise-chain
fusion across ops.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

C, R, S, M = 176, 48, 320, 768
EV = C * R * S * M


def producer(a, b, w):
    # a: (C, R, 1, 1) cell-node composites, b: (1, 1, S, M) species-momentum
    # composites -- one exp + a few fmas per point, like the linear-df kernel
    x = a * b + 0.3 * a
    f = 1.0 / (jnp.exp(x) + 1.0)
    return f * (1.0 + 0.1 * x) * w


def v_spectra(a, b, w, wM, wR):
    """Baseline: spectra-style major-dim reduce -> (S, M)."""
    return jnp.sum(producer(a, b, w), axis=(0, 1))


def v_einsum_m(a, b, w, wM, wR):
    """Current dndx: einsum over the lane dim -> (C, R, S), then small."""
    t = jnp.einsum("crsm,m->crs", producer(a, b, w), wM)
    return jnp.einsum("crs,r->cs", t, wR), jnp.sum(t, axis=0).T


def v_mul_sum(a, b, w, wM, wR):
    """Fold wM into the elementwise chain, plain sum over the last axis."""
    q = producer(a, b, w) * wM[None, None, None, :]
    t = jnp.sum(q, axis=3)
    return jnp.einsum("crs,r->cs", t, wR), jnp.sum(t, axis=0).T


def v_two_major(a, b, w, wM, wR):
    """Reduce each consumer over its major dims first: (C,S,M) and (R,S,M)
    partials, then tiny lane reduces.  Producer has two reduce consumers."""
    q = producer(a, b, w)
    pc = jnp.einsum("crsm,r->csm", q, wR)
    dd = jnp.sum(q, axis=0)
    return jnp.einsum("csm,m->cs", pc, wM), jnp.einsum("rsm,m->sr", dd, wM)


def v_dot(a, b, w, wM, wR):
    """Explicit matvec on the flattened lane axis."""
    q = producer(a, b, w)
    t = jnp.matmul(q.reshape(C * R * S, M), wM).reshape(C, R, S)
    return jnp.einsum("crs,r->cs", t, wR), jnp.sum(t, axis=0).T


def make_args(seed):
    # fresh inputs per repetition: the serving layer caches identical
    # dispatches (NOTES_ROUND1 measurement gotcha)
    key = jax.random.PRNGKey(seed)
    ka, kb, kw = jax.random.split(key, 3)
    a = jax.random.normal(ka, (C, R, 1, 1), jnp.float32) * 0.1
    b = jax.random.normal(kb, (1, 1, S, M), jnp.float32) * 0.1 + 1.0
    w = jax.random.uniform(kw, (1, 1, S, M), jnp.float32)
    wM = jnp.linspace(0.5, 1.5, M)
    wR = jnp.linspace(0.5, 1.5, R)
    return a, b, w, wM, wR


def bench(fn, label):
    f = jax.jit(fn)
    jax.block_until_ready(f(*make_args(0)))
    dts, checks = [], []
    for i in range(5):
        args = make_args(100 + i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
        checks.append(float(np.sum(jax.tree.leaves(out)[0])))
    assert len(set(checks)) > 1
    rate = EV / np.median(dts) / 1e9
    print(f"{label:12s} {rate:6.1f} Geval/s  (median {np.median(dts)*1e3:.1f} ms)")


def main():
    for fn, label in [(v_spectra, "spectra"), (v_einsum_m, "einsum_m"),
                      (v_mul_sum, "mul_sum"), (v_two_major, "two_major"),
                      (v_dot, "dot")]:
        bench(fn, label)




def make_pallas_percell():
    """The VERDICT round-2 ask: one honest Pallas attempt at the per-cell
    reduction bound -- a kernel holding the per-cell (C, S) and eta-node
    (S, R) accumulators VMEM-resident while streaming (cell-block, node)
    tiles, with the lane-dim reduce done as an MXU matvec fused into the
    same VMEM pass as the producer."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CB = 8          # cells per program (sublane-aligned out1 block)

    def kern(wR_ref, a_ref, b_ref, w_ref, wM_ref, out1_ref, out2_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out1_ref[:] = jnp.zeros_like(out1_ref)

        @pl.when((i == 0) & (j == 0))
        def _():
            out2_ref[:] = jnp.zeros_like(out2_ref)

        wRj = wR_ref[j]

        def body(k, acc2):
            av = a_ref[i * CB + k, j]
            x = av * b_ref[:] + 0.3 * av
            f = 1.0 / (jnp.exp(x) + 1.0)
            q = f * (1.0 + 0.1 * x) * w_ref[:]
            tq = jnp.dot(q, wM_ref[:],
                         preferred_element_type=jnp.float32)   # (S, 1)
            # dynamic-index stores on sub-128 tiles are unsupported in
            # Mosaic; accumulate via a one-hot row select instead (the
            # (CB, S) tile op is negligible next to the (S, M) block)
            onek = (jax.lax.broadcasted_iota(jnp.int32, (CB, 1), 0)
                    == k).astype(jnp.float32)
            out1_ref[:] = out1_ref[:] + onek * (wRj * tq.reshape(1, S))
            return acc2 + tq

        acc2 = jax.lax.fori_loop(0, CB, body,
                                 jnp.zeros((S, 1), jnp.float32))
        onej = (jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                == j).astype(jnp.float32)
        out2_ref[:] = out2_ref[:] + acc2 * onej

    @jax.jit
    def run(a, b, w, wM, wR):
        return pl.pallas_call(
            kern,
            grid=(C // CB, R),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # wR (R,)
                pl.BlockSpec(memory_space=pltpu.SMEM),      # a (C, R)
                pl.BlockSpec((S, M), lambda i, j: (0, 0)),
                pl.BlockSpec((S, M), lambda i, j: (0, 0)),
                pl.BlockSpec((M, 1), lambda i, j: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((CB, S), lambda i, j: (i, 0)),
                pl.BlockSpec((S, R), lambda i, j: (0, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, S), jnp.float32),
                       jax.ShapeDtypeStruct((S, R), jnp.float32)],
        )(wR, a[:, :, 0, 0], b[0, 0], w[0, 0], wM[:, None])

    return run


def main_pallas():
    run = make_pallas_percell()
    # numerics vs the XLA einsum formulation
    args = make_args(0)
    got1, got2 = jax.block_until_ready(run(*args))
    ref1, ref2 = jax.jit(v_einsum_m)(*args)
    # the MXU matvec runs the lane reduce in bf16-decomposed passes
    # (~3e-4 relative vs the XLA einsum); fine for the perf question
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=5e-3)
    bench(lambda *a: run(*a), "pallas")
    bench(v_einsum_m, "einsum_m")
    bench(v_spectra, "spectra")


if __name__ == "__main__":
    import sys as _sys
    if "--pallas" in _sys.argv:
        main_pallas()
    else:
        main()
