"""bf16 fast-path characterization for the smooth Cooper-Frye kernels.

VERDICT round 2 item: ``precision="bf16"`` is plumbed (surfaces/species
cast, sampler upcasts at its boundary) but neither benchmarked nor
error-bounded.  The linear-df kernel is layout/lane-bound, not
transcendental-bound (NOTES_ROUND2 exp-stub probe), so halving element
bytes is the one untried ~2x lever -- or a negative result to record.

Measures, on the real chip:
  * linear-df (df 2) and VAH smooth spectra at f32 vs bf16 inputs,
    fresh surfaces per rep + forced readback;
  * accuracy of the bf16 run against the f32 run (whose own accuracy vs
    f64 is pinned at <= 1e-6 by the oracle parity suite): max relative
    error on the raw spectra, on dN/dy, and on pT-integrated v2.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_bf16.py [n_cells]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.smooth import smooth_spectra
from is3d_tpu import observables
from is3d_tpu.testing import (synthetic_species, synthetic_surface,
                              synthetic_deltaf_data)


def cast_surface(s, dtype):
    import jax
    return jax.tree.map(
        lambda v: v.astype(dtype)
        if v is not None and jnp.issubdtype(v.dtype, jnp.floating) else v, s)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = np.abs(b).max()
    return np.abs(a - b) / np.maximum(np.abs(b), 1e-6 * scale)


def bench_one(label, fn, surfs):
    fn(surfs[0])                       # warm up
    dts = []
    for s in surfs[1:]:
        t0 = time.perf_counter()
        np.asarray(fn(s))
        dts.append(time.perf_counter() - t0)
    return np.median(dts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    sp32 = synthetic_species(320, dtype=jnp.float32)
    grid32 = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                  dtype=jnp.float32)
    df32 = synthetic_deltaf_data(dtype=jnp.float32)
    cfg = Config(dimension=2, df_mode=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, include_baryondiff_deltaf=0,
                 include_baryon=0, regulate_deltaf=1, outflow=1,
                 cell_chunk=65536, precision="f32")
    ev = n * 320 * 32 * 24 * 48

    surfs32 = [synthetic_surface(n, dimension=2, seed=s, dtype=jnp.float32)
               for s in (0, 100, 101, 102)]
    import jax
    cast16 = lambda t: jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        else v, t)
    surfs16 = [cast_surface(s, jnp.bfloat16) for s in surfs32]
    sp16, grid16, df16 = cast16(sp32), cast16(grid32), cast16(df32)

    run32 = lambda s: smooth_spectra(s, sp32, grid32, df32, cfg)
    run16 = lambda s: smooth_spectra(s, sp16, grid16, df16,
                                     cfg.replace(precision="bf16"))

    # mixed row: surface storage bf16, grid/species/compute f32 (mixed
    # bf16 x f32 ops promote, so the (C,R,S,M) block -- the bandwidth --
    # stays f32): isolates whether halving only the INPUT bytes pays
    runmix = lambda s: smooth_spectra(s, sp32, grid32, df32,
                                      cfg.replace(precision="bf16"))

    t32 = bench_one("f32", run32, surfs32)
    t16 = bench_one("bf16", run16, surfs16)
    tmix = bench_one("mixed", runmix, surfs16)
    print(f"linear df2 smooth: f32 {ev / t32 / 1e9:.1f} Geval/s, "
          f"bf16 {ev / t16 / 1e9:.1f} Geval/s ({t32 / t16:.2f}x), "
          f"bf16-storage/f32-compute {ev / tmix / 1e9:.1f} Geval/s "
          f"({t32 / tmix:.2f}x; {n} cells, 320 species, 32x24x48)")

    # accuracy vs the f32 run on a held-out surface
    s32 = surfs32[1]
    a32 = np.asarray(run32(s32), np.float64)
    a16 = np.asarray(run16(cast_surface(s32, jnp.bfloat16)), np.float64)
    e_spec = rel_err(a16, a32).max()
    dndy32 = observables.dN_dy(jnp.asarray(a32), grid32)
    dndy16 = observables.dN_dy(jnp.asarray(a16), grid32)
    e_dndy = rel_err(dndy16, dndy32).max()
    v32, _ = observables.continuous_vn(jnp.asarray(a32), grid32, 2)
    v16, _ = observables.continuous_vn(jnp.asarray(a16), grid32, 2)
    e_vn = np.abs(np.asarray(v16) - np.asarray(v32)).max()
    print(f"bf16 error vs f32: spectra max rel {e_spec:.2e}, "
          f"dN/dy max rel {e_dndy:.2e}, v2 max abs {e_vn:.2e}")


if __name__ == "__main__":
    main()
