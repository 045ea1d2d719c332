"""Sampler throughput benchmark: kept hadrons per second, end to end.

Measures `sample_particles` (device sampling + packed readback + host
event assembly) on a synthetic surface at full species-list scale.
Fresh sampler seed per repetition; the returned numpy events force the
device-to-host readback, so the serving layer cannot fake the timing
(see NOTES_ROUND1.md measurement gotchas).

Usage: python experiments/bench_sampler.py [n_cells] [nevents]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.surface import ThermoAverages
from is3d_tpu.kernels.sample import sample_particles
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    nevents = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    pack = sys.argv[3] if len(sys.argv) > 3 else "auto"
    dtype = jnp.float32
    cfg = Config(operation=2, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, precision="f32", sampler_pack=pack)
    print(f"sampler_pack={pack}")
    surface = synthetic_surface(n_cells, dimension=2, seed=1, dtype=dtype)
    species = synthetic_species(320, dtype=dtype)
    mcids = np.arange(1, 321, dtype=np.int32)
    df_data = synthetic_deltaf_data(dtype=dtype)
    plasma = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)

    def run(seed):
        return sample_particles(surface, species, mcids, None, df_data,
                                cfg, plasma, nevents=nevents, seed=seed)

    ev = run(1)                      # compile + warm up
    n_warm = sum(len(e["mcid"]) for e in ev)
    print(f"warmup: {len(ev)} events, {n_warm} hadrons")

    rates = []
    for rep in range(6):
        t0 = time.perf_counter()
        ev = run(100 + rep)
        dt = time.perf_counter() - t0
        n = sum(len(e["mcid"]) for e in ev)
        rates.append(n / dt / 1e3)
        print(f"rep {rep}: {n} hadrons in {dt:.3f} s -> "
              f"{rates[-1]:.1f} k hadrons/s")
    print(f"median: {np.median(rates):.1f} k hadrons/s")


if __name__ == "__main__":
    main()
