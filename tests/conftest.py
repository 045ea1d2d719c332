"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Must set the env vars before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is ignored when a TPU plugin autoloads, so
# force the platform through the config API (this reliably selects CPU).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data directory not available")
    return REFERENCE_DIR
