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

import gc  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def _evict_jax_caches_per_module():
    """Free compiled executables between test modules.

    A single-process full-suite run accumulates hundreds of jit
    specializations (8 virtual devices x x64); round 3's run segfaulted at
    ~82% inside an XLA CPU compile from that memory pressure while every
    file passed in isolation.  Dropping the C++-side executable caches and
    live-array references at module teardown keeps the resident set flat, so
    `pytest tests/` completes in ONE invocation (no per-file chunking
    folklore).  Costs only recompiles, and cross-module jit reuse is
    negligible by design (each file builds its own configs/shapes).
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data directory not available")
    return REFERENCE_DIR
