"""MC decay-cascade throughput benchmark: final hadrons per second.

Measures `kernels.mc_decays.decay_events` end to end (host partition +
device cascade + readback + per-event reassembly) on realistically-mixed
input: events produced by the production sampler on a synthetic surface
with the full urqmd particle list, so the stable/unstable split and the
species mix match a real operation=2 run.  The reference has no
counterpart to time (it hands sampled events to an external afterburner;
its own smooth decay routine is exit(-1)-disabled,
emissionfunction_resonance_decays.cpp:128-129).

Fresh decay seed per repetition; the returned numpy events force the
device-to-host readback, so the serving layer cannot fake the timing
(NOTES_ROUND1.md measurement gotchas).  Reports both input and
final-state hadrons/s -- the cascade grows the hadron count ~1.5x.

Usage: python experiments/bench_mc_decays.py [n_cells] [nevents] [hrg_eos]

hrg_eos 1 (default) benches the urqmd list; hrg_eos 2 benches the smash
list -- longer decay chains (5 cascade waves vs 4) and ~50% more species,
the heavier production configuration.
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.data import species_from_table
from is3d_tpu.io import deltaf as deltaf_io
from is3d_tpu.io import pdg as pdg_io
from is3d_tpu.io.surface import ThermoAverages
from is3d_tpu.kernels.mc_decays import decay_events
from is3d_tpu.kernels.sample import sample_particles
from is3d_tpu.testing import synthetic_surface

REFERENCE = "/root/reference"


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    nevents = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    hrg_eos = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    dtype = jnp.float32
    cfg = Config(operation=2, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, precision="f32", hrg_eos=hrg_eos,
                 do_resonance_decays=1)
    print(f"hrg_eos={hrg_eos} ({'urqmd' if hrg_eos == 1 else 'smash'} list)")
    avg = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)

    table = pdg_io.read_resonances(f"{REFERENCE}/PDG", cfg.hrg_eos)
    df_data = deltaf_io.build_deltaf_data(
        f"{REFERENCE}/deltaf_coefficients", cfg.hrg_eos,
        particle_table=table, T_avg=avg.temperature,
        include_jonah=True, dtype=dtype)
    deltaf_io.compute_particle_densities(table, cfg.df_mode, avg, df_data,
                                         include_baryon=False)
    species = species_from_table(table, dtype=dtype)
    surface = synthetic_surface(n_cells, dimension=2, seed=1, dtype=dtype)

    events = sample_particles(surface, species, table.mc_id, None, df_data,
                              cfg, avg, nevents=nevents, seed=7)
    n_in = sum(len(e["mcid"]) for e in events)
    print(f"input: {len(events)} events, {n_in} hadrons")

    out = decay_events(events, table, cfg, seed=1)   # compile + warm up
    n_fin = sum(len(e["mcid"]) for e in out)
    print(f"warmup: {n_fin} final-state hadrons ({n_fin / n_in:.2f}x)")

    rates = []
    for rep in range(6):
        t0 = time.perf_counter()
        out = decay_events(events, table, cfg, seed=100 + rep)
        dt = time.perf_counter() - t0
        n = sum(len(e["mcid"]) for e in out)
        rates.append(n / dt / 1e3)
        print(f"rep {rep}: {n_in} -> {n} hadrons in {dt:.3f} s -> "
              f"{n_in / dt / 1e3:.0f} k in/s, {rates[-1]:.0f} k final/s")
    print(f"median: {np.median(rates):.1f} k final-state hadrons/s")


if __name__ == "__main__":
    main()
