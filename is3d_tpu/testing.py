"""Synthetic fixtures: surfaces, species lists, and delta-f data built
entirely in memory.

Used by the benchmark harness, the compile-check entry points, and tests
that must not depend on the reference data files.  Magnitudes mimic a
realistic (2+1)D / (3+1)D freeze-out surface near T ~ 0.155 GeV
(cf. the toy fixture input/surface.dat of the reference).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .data import SpeciesArrays
from .io.surface import Surface
from .io.deltaf import DeltafData, compute_jonah_arrays
from .physics.splines import build_natural_cubic

# (mass GeV, sign, degeneracy, baryon) for pi+- pi0 K+- p pbar n Lambda rho Delta
_SPECIES_SEED = [
    (0.13957, -1.0, 1.0, 0.0), (0.13957, -1.0, 1.0, 0.0), (0.13498, -1.0, 1.0, 0.0),
    (0.49368, -1.0, 1.0, 0.0), (0.49368, -1.0, 1.0, 0.0),
    (0.93827, 1.0, 2.0, 1.0), (0.93827, 1.0, 2.0, -1.0),
    (0.93957, 1.0, 2.0, 1.0), (1.11568, 1.0, 2.0, 1.0),
    (0.77526, -1.0, 3.0, 0.0), (1.23200, 1.0, 4.0, 1.0),
]


def synthetic_species(n_species: int = 11, dtype=jnp.float64,
                      seed: int = 0) -> SpeciesArrays:
    """A plausible hadron list.  The first 11 entries are real hadrons; any
    further entries are resonance-like (mass grows, alternating statistics)."""
    rng = np.random.default_rng(seed)
    rows = list(_SPECIES_SEED)
    while len(rows) < n_species:
        i = len(rows)
        mass = 1.0 + 0.005 * i + 0.1 * rng.random()
        sign = -1.0 if i % 2 else 1.0
        deg = float(rng.integers(1, 6))
        baryon = float(rng.integers(-1, 2)) if sign > 0 else 0.0
        rows.append((mass, sign, deg, baryon))
    rows = rows[:n_species]
    cols = np.asarray(rows, dtype=np.float64)
    z = jnp.zeros(n_species, dtype=dtype)
    return SpeciesArrays(
        mass=jnp.asarray(cols[:, 0], dtype=dtype),
        sign=jnp.asarray(cols[:, 1], dtype=dtype),
        degeneracy=jnp.asarray(cols[:, 2], dtype=dtype),
        baryon=jnp.asarray(cols[:, 3], dtype=dtype),
        equilibrium_density=z, bulk_density=z, diff_density=z,
    )


def synthetic_surface_cells(n_cells: int, dimension: int = 2,
                            seed: int = 0) -> dict:
    """Random but physical freeze-out cells (numpy dict of columns)."""
    rng = np.random.default_rng(seed)
    n = n_cells
    cells = dict(
        tau=rng.uniform(1.0, 10.0, n),
        x=rng.uniform(-8, 8, n), y=rng.uniform(-8, 8, n),
        eta=(rng.uniform(-3, 3, n) if dimension == 3 else np.zeros(n)),
        dat=rng.uniform(-0.1, 1.0, n), dax=rng.uniform(-0.5, 0.5, n),
        day=rng.uniform(-0.5, 0.5, n),
        dan=(rng.uniform(-0.05, 0.05, n) if dimension == 3 else np.zeros(n)),
        ux=rng.uniform(-0.8, 0.8, n), uy=rng.uniform(-0.8, 0.8, n),
        un=rng.uniform(-0.05, 0.05, n),
        T=rng.uniform(0.148, 0.162, n),
        E=rng.uniform(0.25, 0.40, n), P=rng.uniform(0.04, 0.08, n),
        pixx=rng.normal(0, 0.004, n), pixy=rng.normal(0, 0.002, n),
        pixn=rng.normal(0, 0.001, n), piyy=rng.normal(0, 0.004, n),
        piyn=rng.normal(0, 0.001, n),
        bulkPi=rng.normal(0, 0.003, n),
        muB=np.zeros(n), nB=np.zeros(n),
        Vx=np.zeros(n), Vy=np.zeros(n), Vn=np.zeros(n),
    )
    return cells


def synthetic_surface(n_cells: int, dimension: int = 2, seed: int = 0,
                      dtype=jnp.float64) -> Surface:
    cells = synthetic_surface_cells(n_cells, dimension, seed)
    return Surface(**{k: jnp.asarray(v, dtype=dtype) for k, v in cells.items()})


def synthetic_deltaf_data(dtype=jnp.float64, T_avg: float = 0.155) -> DeltafData:
    """DeltafData with smooth, dimensionally sensible fake coefficient tables
    (same raw T-power scalings the real files use) plus real Jonah splines
    computed from the seed species list."""
    nT, nmuB = 101, 81
    T = np.linspace(0.07, 0.25, nT)
    muB = np.linspace(0.0, 0.8, nmuB)
    mu_fac = (1.0 + 0.1 * muB)[:, None]                       # (nmuB, 1)

    base = {
        "c0": 2.0 + T, "c1": 0.5 + 0.2 * T, "c2": 1.0 + 0.5 * T,
        "c3": 0.3 + 0.1 * T, "c4": 0.2 + 0.1 * T,
        "F": 0.05 + 0.3 * T, "G": 0.05 + 0.1 * T,
        "betabulk": 0.02 + 0.1 * T, "betaV": 0.4 + 0.2 * T,
        "betapi": 0.6 + 1.0 * T,
    }
    raw = {k: np.broadcast_to(v[None, :] * mu_fac, (nmuB, nT)).copy()
           for k, v in base.items()}

    splines = {name: build_natural_cubic(T, raw[name][0], dtype=dtype)
               for name in ("c0", "c2", "c3", "F", "betabulk", "betaV", "betapi")}

    seed_rows = np.asarray(_SPECIES_SEED, dtype=np.float64)
    x, lam2, z = compute_jonah_arrays(seed_rows[:, 0], seed_rows[:, 2],
                                      seed_rows[:, 1], T_avg)
    return DeltafData(
        T_grid=jnp.asarray(T, dtype=dtype),
        muB_grid=jnp.asarray(muB, dtype=dtype),
        tables={k: jnp.asarray(v, dtype=dtype) for k, v in raw.items()},
        splines=splines,
        lambda2_spline=build_natural_cubic(x, lam2, dtype=dtype),
        z_spline=build_natural_cubic(x, z, dtype=dtype),
        bulkPi_over_Peq_max=jnp.asarray(float(x.max()), dtype=dtype),
    )
