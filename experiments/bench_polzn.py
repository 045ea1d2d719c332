"""Spin-polarization kernel (mode 5) throughput.

Pins the thermal-vorticity polarization kernel's eval rate at production
shapes so layout work stays measurable (the lane-tiled (C, R, S, M)
relayout moved it 37 -> 42 Geval/s on one v5e chip).  Fresh surface per
rep + forced readback (serving-layer countermeasures, NOTES_ROUND1.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_polzn.py [n_cells]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.surface import Surface, ThermoAverages
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.polzn import spin_polarization
from is3d_tpu.testing import synthetic_species


def vorticity_surface(n, seed, dtype):
    rng = np.random.default_rng(seed)
    cells = dict(
        tau=rng.uniform(1, 5, n), x=rng.uniform(-3, 3, n),
        y=rng.uniform(-3, 3, n), eta=np.zeros(n),
        dat=rng.uniform(0.1, 1, n), dax=rng.uniform(-0.3, 0.3, n),
        day=rng.uniform(-0.3, 0.3, n), dan=np.zeros(n),
        ux=rng.uniform(-0.5, 0.5, n), uy=rng.uniform(-0.5, 0.5, n),
        un=rng.uniform(-0.02, 0.02, n),
        T=np.full(n, 0.155), E=np.full(n, 0.3), P=np.full(n, 0.05),
        wtx=rng.normal(0, 0.01, n), wty=rng.normal(0, 0.01, n),
        wtn=rng.normal(0, 0.01, n), wxy=rng.normal(0, 0.01, n),
        wxn=rng.normal(0, 0.01, n), wyn=rng.normal(0, 0.01, n),
    )
    return Surface(**{k: jnp.asarray(v, dtype=dtype) for k, v in cells.items()})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    dtype = jnp.float32
    sp = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype)
    plasma = ThermoAverages(0.155, 0.3, 0.05, 0.0, 0.0)
    cfg = Config(dimension=2, mode=5, operation=1, cell_chunk=65536,
                 precision="f32")
    out = spin_polarization(vorticity_surface(n, 0, dtype), sp, grid, cfg,
                            plasma)  # warmup/compile
    jax.block_until_ready(out)
    dts, checks = [], []
    for i in range(3):
        s = vorticity_surface(n, 100 + i, dtype)
        t0 = time.perf_counter()
        out = spin_polarization(s, sp, grid, cfg, plasma)
        checks.append(float(np.sum(np.asarray(out["Snorm"]))))
        dts.append(time.perf_counter() - t0)
    assert len(set(checks)) == 3, "distinct inputs must give distinct sums"
    ev = n * 320 * 32 * 24 * grid.n_eta
    print(f"polzn 2+1D: {ev / np.median(dts) / 1e9:.1f} Geval/s "
          f"({n} cells, 320 species, 32x24x{grid.n_eta})")


if __name__ == "__main__":
    main()
