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
Geval/s; every per-cell variant -- einsum over m, wM folded into the
elementwise chain, per-consumer major-dim partials, explicit matvec --
lands at 49-50.4 Geval/s (within 3% of each other).  The ~24% penalty is
intrinsic to producing per-cell outputs (the reduce must cross the lane
dim once per (c, r, s) element); the dN/dX kernel's current einsum
structure is at the structural optimum.  Do not re-chase.
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


if __name__ == "__main__":
    main()
