"""Cost of the differentiable decay cascade (resonance_feed_down_traced)
vs the production host-glued driver, plus the reverse-mode pass.

Medium subset of the urqmd list (every 8th species + the standard
identified particles, ~60 rows, multi-wave cascade) on synthetic thermal
spectra at the reference momentum-grid scale.  f32 on the accelerator,
f64 on CPU (same policy as production).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_diff_decays.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io import pdg
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels import decays as dk

REFERENCE = "/root/reference"


def main():
    table = pdg.read_resonances(f"{REFERENCE}/PDG", 1)
    mcids_all = np.asarray(table.mc_id)
    S_all = len(mcids_all)
    keep = sorted(set(range(0, S_all, 8))
                  | {int(np.nonzero(mcids_all == m)[0][0])
                     for m in (211, -211, 111, 321, -321, 2212, -2212,
                               113, 213, 223, 331, 3122)})
    mcids = mcids_all[keep]
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48)
    dtype = (jnp.float64 if jax.default_backend() == "cpu"
             else jnp.float32)

    mass = np.asarray(table.mass)[keep]
    MT = np.sqrt(np.asarray(grid.pT)[None, :, None, None] ** 2
                 + mass[:, None, None, None] ** 2)
    base = np.exp(-MT / 0.15) * (
        1 + 0.2 * np.cos(2 * np.asarray(grid.phi))[None, None, :, None])
    cfg = Config(dimension=2, lightest_particle=111)

    def rep_spectra(i):
        return (base * (1.0 + 0.01 * i)).astype(np.float64)

    # production driver
    dk.do_resonance_decays(rep_spectra(0), table, mcids, grid, cfg)
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = dk.do_resonance_decays(rep_spectra(1 + i), table, mcids,
                                     grid, cfg)
        dts.append(time.perf_counter() - t0)
    print(f"production cascade ({len(keep)} species): "
          f"{np.median(dts)*1e3:.0f} ms warm")

    # traced forward (jit the whole cascade)
    fwd = jax.jit(lambda sp: dk.resonance_feed_down_traced(
        sp, table, mcids, grid, cfg))
    sp0 = jnp.asarray(rep_spectra(0), dtype)
    ref = np.asarray(jax.block_until_ready(fwd(sp0)), np.float64)
    prod = dk.do_resonance_decays(np.asarray(sp0, np.float64), table,
                                  mcids, grid, cfg)
    scale = np.abs(prod).max()
    rel = np.abs(ref - prod) / np.maximum(np.abs(prod), 1e-12 * scale)
    print(f"traced-vs-production max rel ({dtype.__name__}): {rel.max():.2e}")
    dts = []
    for i in range(3):
        sp = jnp.asarray(rep_spectra(1 + i), dtype)
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(sp))
        dts.append(time.perf_counter() - t0)
    print(f"traced forward (jit): {np.median(dts)*1e3:.0f} ms warm")

    # reverse pass: grad of summed pion dN/dy wrt the input spectra.
    # The hat evaluators carry a custom_vjp that recomputes the
    # interpolation weights in the backward (round 4), so the hat path
    # no longer OOMs on (K, P, F, V, Z, grid) residuals.
    i_pi = int(np.nonzero(mcids == 211)[0][0])
    w = jnp.asarray(np.asarray(grid.pT_weight) * np.asarray(grid.pT), dtype)
    fw = jnp.asarray(np.asarray(grid.phi_weight), dtype)
    gfn = jax.jit(jax.grad(lambda sp: jnp.einsum(
        "pfy,p,f->", dk.resonance_feed_down_traced(
            sp, table, mcids, grid, cfg)[i_pi], w, fw)))
    jax.block_until_ready(gfn(sp0))
    dts = []
    for i in range(3):
        sp = jnp.asarray(rep_spectra(1 + i), dtype)
        t0 = time.perf_counter()
        jax.block_until_ready(gfn(sp))
        dts.append(time.perf_counter() - t0)
    print(f"traced value+grad (jit): {np.median(dts)*1e3:.0f} ms warm")


def _peak_mem_mb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return st.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        return None


def production_scale(use_hat=True, bucket=None):
    """The round-3 open limit: jax.grad of a decayed-spectra scalar on the
    FULL SMASH chosen list at the production 32x24x21 (3+1D) grid, one
    chip.  Round 4's custom_vjp on the hat evaluators removes the AD
    residuals that made this OOM (39 GB measured)."""
    from is3d_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()   # the one-time compile of the
    #                                         full-cascade grad is large
    from is3d_tpu.io.pdg import load_chosen_mcids, chosen_indices
    table = pdg.read_resonances(f"{REFERENCE}/PDG", 2)
    chosen = load_chosen_mcids(f"{REFERENCE}/PDG/chosen_particles.dat")
    idx = chosen_indices(table, chosen, skip_missing=True)
    mcids = np.asarray(table.mc_id)[idx]
    grid = native_momentum_grid(dimension=3, n_pT=32, n_phi=24, n_y=21)
    dtype = (jnp.float64 if jax.default_backend() == "cpu"
             else jnp.float32)
    cfg = Config(dimension=3, lightest_particle=111)

    mass = np.asarray(table.mass)[idx]
    MT = np.sqrt(np.asarray(grid.pT)[None, :, None, None] ** 2
                 + mass[:, None, None, None] ** 2)
    base = (np.exp(-MT / 0.15)
            * (1 + 0.2 * np.cos(2 * np.asarray(grid.phi))[None, None, :, None])
            * np.exp(-0.5 * (np.asarray(grid.y) / 2.5) ** 2)[None, None, None])

    i_pi = int(np.nonzero(mcids == 211)[0][0])
    w = jnp.asarray(np.asarray(grid.pT_weight) * np.asarray(grid.pT), dtype)
    fw = jnp.asarray(np.asarray(grid.phi_weight), dtype)

    gfn = jax.jit(jax.value_and_grad(lambda sp: jnp.einsum(
        "pfy,p,f->", dk.resonance_feed_down_traced(
            sp, table, mcids, grid, cfg, use_hat=use_hat,
            bucket=bucket)[i_pi], w, fw)))

    sp0 = jnp.asarray(base * 1.0, dtype)
    t0 = time.perf_counter()
    v, g = jax.block_until_ready(gfn(sp0))
    cold = time.perf_counter() - t0
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
    dts = []
    for i in range(3):
        sp = jnp.asarray(base * (1.0 + 0.01 * (1 + i)), dtype)
        t0 = time.perf_counter()
        v, g = jax.block_until_ready(gfn(sp))
        dts.append(time.perf_counter() - t0)
    peak = _peak_mem_mb()
    peak_s = f", peak device mem {peak:.0f} MB" if peak else ""
    print(f"PRODUCTION-scale value+grad (full SMASH chosen list, "
          f"{len(mcids)} species, 32x24x21 3+1D, use_hat={use_hat}, "
          f"bucket={bucket}): {np.median(dts):.2f} s warm "
          f"(cold {cold:.1f} s){peak_s}")


if __name__ == "__main__":
    import sys as _sys
    if "--production" in _sys.argv:
        production_scale(use_hat="--gather" not in _sys.argv,
                         bucket=(int(_sys.argv[_sys.argv.index("--bucket") + 1])
                                 if "--bucket" in _sys.argv else None))
    else:
        main()
