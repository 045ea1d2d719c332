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

    # reverse pass: grad of summed pion dN/dy wrt the input spectra
    i_pi = int(np.nonzero(mcids == 211)[0][0])
    w = jnp.asarray(np.asarray(grid.pT_weight) * np.asarray(grid.pT), dtype)
    fw = jnp.asarray(np.asarray(grid.phi_weight), dtype)
    # bucket=8: the reverse pass materializes per-bucket interpolation
    # weight residuals (tens of GB at the default 256-task bucket)
    # use_hat=False for the reverse pass: the hat path's AD residuals
    # include (K, P, F, V, Z, grid)-sized interpolation-weight tensors
    # (the forward fuses them away); the gather path's backward is
    # scatter-adds with no such residuals
    gfn = jax.jit(jax.grad(lambda sp: jnp.einsum(
        "pfy,p,f->", dk.resonance_feed_down_traced(
            sp, table, mcids, grid, cfg, bucket=8,
            use_hat=False)[i_pi], w, fw)))
    try:
        jax.block_until_ready(gfn(sp0))
        dts = []
        for i in range(3):
            sp = jnp.asarray(rep_spectra(1 + i), dtype)
            t0 = time.perf_counter()
            jax.block_until_ready(gfn(sp))
            dts.append(time.perf_counter() - t0)
        print(f"traced value+grad (jit): {np.median(dts)*1e3:.0f} ms warm")
    except Exception as e:  # record the production-scale reverse limit
        print("traced value+grad at PRODUCTION momentum-grid scale failed "
              f"on this chip: {type(e).__name__} (known limit, round 3: "
              "the hat path OOMs on AD residuals; the gather path compiles "
              "at bucket<=8 but hits a serving-stack device fault -- "
              "calibration-scale reverse passes are tested and green, "
              "tests/test_grad.py)")


if __name__ == "__main__":
    main()
