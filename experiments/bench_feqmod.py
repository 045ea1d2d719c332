"""Modified-equilibrium (feqmod) spectra kernel throughput, df modes 3/4.

The feqmod SIMD kernel historically evaluated BOTH the modified-equilibrium
branch (momentum transform at the scaled rapidity) and the linearized
fallback per point, then masked per cell -- roughly twice the per-point work
of the linear-df kernel.  Since round 3 the production kernel routes per
CHUNK inside the compiled scan (kernels/feqmod.routed_switch): clean chunks
pay only the feqmod chain, all-breakdown chunks only the cheaper linearized
chain, and only genuinely mixed chunks pay both.  Rows measured here:

* routed / clean surface      -- production regime (REAL shipped coefficient
  tables, realistic viscous magnitudes: breakdown fraction 0)
* routed / breakdown-heavy    -- the physically interesting strong-bulk
  regime (bulkPi = -0.9 P trips the breakdown probe on every cell), which
  used to run the both-branch kernel at ~24-28 Geval/s
* both-branch everywhere      -- feqmod_partition=0, the unrouted kernel
  (the AD/vmap paths run this variant)

Uses the real deltaf coefficient tables from /root/reference when present
(the synthetic fake tables put betabulk ~ 2e-5, an unphysical regime);
falls back to synthetic otherwise.

Fresh surface per rep + forced readback (serving countermeasures,
NOTES_ROUND1.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bench_feqmod.py [n_cells]
"""
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid, laguerre_device
from is3d_tpu.kernels.feqmod import smooth_spectra_feqmod, _breakdown_probe_jit
from is3d_tpu.kernels.common import surface_columns
from is3d_tpu.testing import (synthetic_species, synthetic_surface,
                              synthetic_deltaf_data)

REFERENCE = "/root/reference"


def real_deltaf_data(dtype):
    from is3d_tpu.io import deltaf, pdg
    tbl = pdg.read_resonances(f"{REFERENCE}/PDG", 1)
    return deltaf.build_deltaf_data(f"{REFERENCE}/deltaf_coefficients",
                                    hrg_eos=1, particle_table=tbl,
                                    T_avg=0.155, dtype=dtype)


def strong_bulk(surface):
    """bulkPi = -0.9 P: trips the mode-3 breakdown probe (negative
    linearized pion density) and mode 4's detA guard on every cell."""
    return surface.replace(bulkPi=-0.9 * surface.P)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    dtype = jnp.float32
    sp = synthetic_species(320, dtype=dtype)
    grid = native_momentum_grid(dimension=2, n_pT=32, n_phi=24, n_eta=48,
                                dtype=dtype)
    have_real = os.path.isdir(REFERENCE)
    if have_real:
        df = real_deltaf_data(dtype)
    else:
        print("NOTE: reference tables unavailable, synthetic regime "
              "(unrealistically high breakdown fraction)")
        df = synthetic_deltaf_data(dtype=dtype)
    lag = laguerre_device()
    ev = n * 320 * 32 * 24 * grid.n_eta

    rows = [("routed, clean surface", 1, False),
            ("routed, breakdown-heavy surface", 1, True),
            ("both-branch everywhere", 0, False)]
    for df_mode in (3, 4):
        for label, partition, heavy in rows:
            if heavy and not have_real:
                continue
            cfg = Config(dimension=2, df_mode=df_mode, include_shear_deltaf=1,
                         include_bulk_deltaf=1, include_baryondiff_deltaf=0,
                         include_baryon=0, regulate_deltaf=1, outflow=1,
                         cell_chunk=65536, precision="f32",
                         feqmod_partition=partition,
                         feqmod_partition_min_cells=1)
            surfs = [synthetic_surface(n, dimension=2, seed=s, dtype=dtype)
                     for s in (0, 100, 101, 102)]
            if heavy:
                surfs = [strong_bulk(s) for s in surfs]
            fracs = [float(np.asarray(_breakdown_probe_jit(
                surface_columns(s, cfg), df, lag, cfg)[1]).mean())
                for s in surfs[1:]]
            smooth_spectra_feqmod(surfs[0], sp, grid, df, cfg)  # warmup
            dts, checks = [], []
            for s in surfs[1:]:
                t0 = time.perf_counter()
                out = np.asarray(smooth_spectra_feqmod(s, sp, grid, df, cfg))
                checks.append(float(out.sum()))
                dts.append(time.perf_counter() - t0)
            assert len(set(checks)) == 3, \
                "distinct inputs must give distinct sums"
            print(f"feqmod 2+1D df{df_mode} {label} "
                  f"(breakdown frac {max(fracs):.3f}): "
                  f"{ev / np.median(dts) / 1e9:.1f} Geval/s "
                  f"({n} cells, 320 species, 32x24x{grid.n_eta})")


if __name__ == "__main__":
    main()
