"""Pallas smooth kernel vs the XLA kernel (interpret mode on CPU)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from is3d_tpu.config import Config
from is3d_tpu.io.tables import native_momentum_grid
from is3d_tpu.kernels.smooth import _smooth_spectra_jit
from is3d_tpu.kernels.common import surface_columns
from is3d_tpu.kernels.pallas_smooth import (smooth_spectra_pallas,
                                            pallas_available)

from test_smooth import smash_table, df_data, pikp_species, random_cells, \
    to_surface  # noqa: F401


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("IS3D_PALLAS_INTERPRET", "1")


def _f32(tree):
    import jax
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype")
        and a.dtype == jnp.float64 else a, tree)


@pytest.mark.parametrize("df_mode,dimension", [(1, 2), (2, 2), (2, 3)])
def test_pallas_matches_xla(smash_table, df_data, df_mode, dimension):
    rng = np.random.default_rng(61)
    cells = random_cells(21, rng, dimension=dimension)   # not tile-aligned
    surf = to_surface(cells)
    sp = pikp_species(smash_table)                       # S=6, not % 32
    grid = native_momentum_grid(
        dimension=dimension, n_pT=5, n_phi=6,            # M=30, not % 128
        n_y=5, n_eta=8,
        eta_mT_rescale=False)   # the pallas experiment implements
    #                             fixed-node eta semantics
    cfg = Config(operation=1, mode=1, dimension=dimension, df_mode=df_mode,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, cell_chunk=8)

    cols = surface_columns(surf, cfg)
    sp32 = _f32(sp)
    grid32 = _f32(grid)
    df32 = _f32(df_data)
    cols32 = {k: v.astype(jnp.float32) for k, v in cols.items()}

    want = np.asarray(_smooth_spectra_jit(cols32, sp32, grid32, df32, cfg))
    got = np.asarray(smooth_spectra_pallas(cols32, sp32, grid32, df32, cfg))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_pallas_availability_gating(smash_table):
    cfg = Config(df_mode=2)
    assert pallas_available(cfg, jnp.float32)     # interpret forced on
    assert not pallas_available(cfg, jnp.float64)
    assert not pallas_available(cfg.replace(df_mode=3), jnp.float32)
    os.environ["IS3D_DISABLE_PALLAS"] = "1"
    try:
        assert not pallas_available(cfg, jnp.float32)
    finally:
        del os.environ["IS3D_DISABLE_PALLAS"]
    # opt-in on non-TPU backends without interpret: off
    os.environ.pop("IS3D_PALLAS_INTERPRET", None)
    assert not pallas_available(cfg, jnp.float32)
    os.environ["IS3D_PALLAS_INTERPRET"] = "1"
