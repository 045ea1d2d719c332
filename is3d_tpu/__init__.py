"""is3d_tpu: TPU-native Cooper-Frye particlization framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the iS3D
reference (smooth spectra, spacetime distributions, Monte-Carlo hadron
sampling, resonance-decay feed-down, spin polarization), built for SPMD
execution over TPU device meshes.
"""

__version__ = "0.2.0"

from .config import Config, load_config  # noqa: F401
from .units import HBARC  # noqa: F401
from .api import IS3D, RunResult  # noqa: F401
