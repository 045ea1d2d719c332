"""Device-side species arrays."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SpeciesArrays:
    """Per-species kernel inputs, sliced from the host ParticleTable in
    chosen-particle order (reference: emissionfunction.cpp:1293-1307)."""

    mass: jnp.ndarray        # (S,) GeV
    sign: jnp.ndarray        # (S,) +1 fermion / -1 boson
    degeneracy: jnp.ndarray  # (S,)
    baryon: jnp.ndarray      # (S,)
    # densities at the surface-averaged state (sampler inputs; may be zeros)
    equilibrium_density: jnp.ndarray
    bulk_density: jnp.ndarray
    diff_density: jnp.ndarray

    @property
    def n_species(self):
        return self.mass.shape[0]


def species_from_table(table, indices=None, dtype=jnp.float64) -> SpeciesArrays:
    idx = np.arange(len(table)) if indices is None else np.asarray(indices)
    pick = lambda a: jnp.asarray(np.asarray(a, dtype=np.float64)[idx], dtype=dtype)
    zeros = np.zeros(len(table))
    eq = table.equilibrium_density if table.equilibrium_density is not None else zeros
    bk = table.bulk_density if table.bulk_density is not None else zeros
    df = table.diff_density if table.diff_density is not None else zeros
    return SpeciesArrays(
        mass=pick(table.mass), sign=pick(table.sign),
        degeneracy=pick(table.gspin), baryon=pick(table.baryon),
        equilibrium_density=pick(eq), bulk_density=pick(bk),
        diff_density=pick(df),
    )
