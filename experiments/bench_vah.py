"""VAH smooth-spectra throughput (anisotropic-hydro kernel, 2+1D).

No reference numbers exist (the reference's VAH kernel is dead code);
measured here at production shapes on one v5e chip, f32:

* 99.6 Geval/s on the production case -- no real mode-2/3 file carries
  the residual-df coefficient columns c0..c4, so the vah_df_gate drops
  the shear+bulk chains from the compiled kernel (bit-identical; the
  pure-f_a block is cheaper than even the VH linear-df block),
* 48.2 Geval/s with per-cell c0..c4 present (full shear+bulk chains).

The lane-tiled (C, R, S, M) relayout of the spectra block bought +24%
over the naive (C, S, PT, PHI, R) layout (39 -> 49); a
transcendental-stub probe shows sqrt/exp/cosh/sinh are fully hidden in
both, so the kernel is layout/op-count-bound, not transcendental-bound.
Fresh surface per rep + forced readback (serving-layer countermeasures,
see NOTES_ROUND1.md).

Usage: PYTHONPATH=. python experiments/bench_vah.py [n_cells]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.surface import Surface
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.vah import smooth_spectra_vah
from is3d_tpu.testing import synthetic_species


def make_surf(n, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    z = np.zeros(n)
    cells = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n), eta=z,
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-.3, .3, n),
        day=rng.uniform(-.3, .3, n), dan=z,
        ux=rng.uniform(-.5, .5, n), uy=rng.uniform(-.5, .5, n),
        un=rng.uniform(-.03, .03, n),
        T=np.full(n, .155), E=np.full(n, .3), P=np.full(n, .05),
        pitt=rng.normal(0, .002, n), pitx=rng.normal(0, .002, n),
        pity=rng.normal(0, .002, n), pitn=rng.normal(0, .001, n),
        pixx=rng.normal(0, .002, n), pixy=rng.normal(0, .002, n),
        pixn=rng.normal(0, .001, n), piyy=rng.normal(0, .002, n),
        piyn=rng.normal(0, .001, n), pinn=rng.normal(0, .001, n),
        bulkPi=rng.normal(0, .002, n), Wx=rng.normal(0, .002, n),
        Wy=rng.normal(0, .002, n),
        Lambda=rng.uniform(.14, .17, n), aL=rng.uniform(.6, 1.4, n))
    return Surface(**{k: jnp.asarray(v, dtype) for k, v in cells.items()})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    sp = synthetic_species(320, dtype=jnp.float32)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=jnp.float32)
    cfg = Config(mode=2, dimension=2, include_shear_deltaf=1,
                 include_bulk_deltaf=1, regulate_deltaf=1, outflow=1,
                 cell_chunk=65536, precision="f32")
    ev = n * 320 * 32 * 24 * 48

    def run(label, mk, c):
        float(jnp.sum(smooth_spectra_vah(mk(n, 0), sp, grid, c)))
        dts, checks = [], []
        for i in range(3):
            s = mk(n, 100 + i)
            t0 = time.perf_counter()
            out = smooth_spectra_vah(s, sp, grid, c)
            checks.append(float(jnp.sum(out)))
            dts.append(time.perf_counter() - t0)
        assert len(set(checks)) == 3, "distinct inputs must give distinct sums"
        print(f"VAH 2+1D {label}: {ev / np.median(dts) / 1e9:.1f} Geval/s "
              f"({n} cells, 320 species, 32x24x48)")

    # production case: no c0..c4 columns exist in any real mode-2/3 file,
    # so the vah_df_gate drops the residual-df chains (bit-identical)
    run("production (df chains gated off)", make_surf, cfg)

    # capability case: per-cell residual-df coefficients present ->
    # full shear+bulk chains in the compiled kernel
    def mk_c(n_, seed):
        s = make_surf(n_, seed)
        rng = np.random.default_rng(seed + 7)
        cs = {nm: jnp.asarray(rng.normal(0, 0.1, n_), jnp.float32)
              for nm in ("c0", "c1", "c2", "c3", "c4")}
        return s.replace(**cs)
    run("with residual df (c0..c4)", mk_c, cfg)


if __name__ == "__main__":
    main()
