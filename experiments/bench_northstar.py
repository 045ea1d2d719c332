"""ONE-command composite north-star proof (round-5 VERDICT item 1).

The BASELINE.md north star is a single sentence: full SMASH-list smooth
spectra + resonance-decay feed-down on a realistic 1M-cell 3+1D surface
in < 30 s on TPU v5e-8.  Round 4 proved the pieces in separate harnesses
(bench_1m_e2e.py: spectra, no decays/writers; profile_decays.py: decays,
toy parents); this run is the composite: ONE invocation that does

    surface -> smooth spectra (444-species full SMASH chosen list)
            -> decay feed-down -> reference-format writers

on one chip, with wall time and peak HBM measured around the WHOLE
pipeline (cold and warm), mirroring the reference's one-binary flow
(RuniS3D.cpp:3-12 -> emissionfunction.cpp:1261-1781 -> writers).  The
v5e-8 projection divides only the chip-parallel spectra phase by 8 (the
cell axis shards; parallel/mesh.py) -- decays + writers are reported
as-is, undivided.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH \
           python experiments/bench_northstar.py [n_cells] [df_mode]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"


def peak_hbm_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return float("nan")


def pipeline(surface, species, mcids, grid, df_data, cfg, table, out_dir):
    """surface -> spectra -> feed-down -> writers, one call.

    Overlapped like api operation=1: the decay cascade is dispatched
    (async, device-resident) BEFORE the CPU-bound smooth writers run, so
    `wr_smooth` and the device feed-down proceed concurrently and
    `dec_wait` is only the residual wait after those writers finish."""
    from is3d_tpu.kernels.smooth import smooth_spectra
    from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod
    from is3d_tpu.kernels.decays import do_resonance_decays_async
    from is3d_tpu import writers
    kernel = smooth_spectra if cfg.df_mode in (1, 2) else smooth_spectra_feqmod
    t = {}
    t0 = time.perf_counter()
    spectra = np.asarray(kernel(surface, species, grid, df_data, cfg))
    t["spectra"] = time.perf_counter() - t0
    t1 = time.perf_counter()
    dec_future = do_resonance_decays_async(spectra, table,
                                           np.asarray(mcids), grid, cfg)
    t["dec_dispatch"] = time.perf_counter() - t1
    t2 = time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)
    writers.clean_results_dir(out_dir)
    writers.write_dN_pTdpTdphidy(spectra, grid, mcids, cfg.dimension,
                                 out_dir)
    writers.write_continuous_vn(spectra, grid, mcids, cfg.dimension,
                                out_dir)
    writers.write_dN_dy(spectra, grid, mcids, cfg.dimension, out_dir)
    writers.write_dN_dphidy(spectra, grid, mcids, cfg.dimension, out_dir)
    writers.write_dN_twopipTdpTdy(spectra, grid, mcids, cfg.dimension,
                                  out_dir)
    t["wr_smooth"] = time.perf_counter() - t2
    t3 = time.perf_counter()
    decayed = np.asarray(dec_future, dtype=np.float64)
    t["dec_wait"] = time.perf_counter() - t3
    t4 = time.perf_counter()
    writers.write_dN_pTdpTdphidy(decayed, grid, mcids, cfg.dimension,
                                 out_dir, suffix="_resonance_decays")
    writers.write_dN_dpTdphidy(decayed, grid, mcids, cfg.dimension,
                               out_dir, suffix="_resonance_decays")
    t["wr_decay"] = time.perf_counter() - t4
    t["total"] = time.perf_counter() - t0
    return spectra, decayed, t


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    df_mode = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from is3d_tpu.config import Config
    from is3d_tpu.data import species_from_table
    from is3d_tpu.io import pdg
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.testing import synthetic_surface, synthetic_deltaf_data
    from is3d_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    dtype = jnp.float32
    cfg = Config(operation=1, mode=1, dimension=3, df_mode=df_mode,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=512,
                 do_resonance_decays=1, precision="f32")

    # full SMASH chosen list from the real PDG table (444 species)
    table = pdg.read_resonances(f"{REFERENCE}/PDG", 2)
    chosen = pdg.load_chosen_mcids(f"{REFERENCE}/PDG/chosen_particles.dat")
    idx = pdg.chosen_indices(table, chosen, skip_missing=True)
    species = species_from_table(table, idx, dtype=dtype)
    mcids = np.asarray(table.mc_id)[idx]
    df_data = synthetic_deltaf_data(dtype=dtype)
    grid = native_momentum_grid(dimension=3, n_pT=32, n_phi=24, n_y=21,
                                dtype=dtype)
    S = species.n_species
    print(f"composite north-star: {n_cells} cells x {S} species "
          f"(full SMASH chosen list) x 32x24x21, df_mode={df_mode}")

    out_dir = "/tmp/northstar_results"
    surf = synthetic_surface(n_cells, dimension=3, seed=0, dtype=dtype)
    _, _, t_cold = pipeline(surf, species, mcids, grid, df_data, cfg,
                            table, out_dir)
    print("cold (incl. compiles): "
          + "  ".join(f"{k}={v:.1f}s" for k, v in t_cold.items())
          + f"  peak HBM {peak_hbm_gb():.2f} GB")

    # warm measured run: FRESH surface (serving-layer cache countermeasure),
    # same shapes -> no recompiles inside the timed window
    surf = synthetic_surface(n_cells, dimension=3, seed=7, dtype=dtype)
    spectra, decayed, t = pipeline(surf, species, mcids, grid, df_data,
                                   cfg, table, out_dir)
    ev = n_cells * S * 32 * 24 * 21
    n_files = len(os.listdir(out_dir))
    print("warm ONE-INVOCATION pipeline: "
          + "  ".join(f"{k}={v:.1f}s" for k, v in t.items()))
    print(f"  spectra rate {ev / t['spectra'] / 1e9:.1f} Geval/s; "
          f"{n_files} result files; peak HBM {peak_hbm_gb():.2f} GB; "
          f"checksums {np.sum(spectra):.4e} / {np.sum(decayed):.4e}")
    v5e8 = t["spectra"] / 8.0 + (t["total"] - t["spectra"])
    print(f"  v5e-8 projection (spectra/8 + overlapped decays+writers): "
          f"{v5e8:.1f} s  (north star: < 30 s)")


if __name__ == "__main__":
    main()
