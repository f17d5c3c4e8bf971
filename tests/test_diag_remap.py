"""Diagnostic vertical remap (MOM_diag_remap.F90 analog)."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.diag_remap import (DiagRemapCfg,
                                           build_z_thickness, remap_to_z)


def test_z_thickness_clips_at_bathy():
    cfg = DiagRemapCfg.uniform(4, 100.0)
    bathy = jnp.asarray([[100.0, 60.0, 10.0]])
    hz = np.asarray(build_z_thickness(cfg, bathy))
    np.testing.assert_allclose(hz[:, 0, 0], 25.0)
    np.testing.assert_allclose(hz[:, 0, 1], [25, 25, 10, 0])
    np.testing.assert_allclose(hz[:, 0, 2], [10, 0, 0, 0])


def test_remap_conserves_column_content():
    rng = np.random.default_rng(3)
    nk, nz = 5, 8
    depth = 200.0
    h = jnp.asarray(rng.uniform(10.0, 60.0, (nk, 1, 1)))
    h = h * depth / jnp.sum(h, 0)
    T = jnp.asarray(rng.standard_normal((nk, 1, 1)))
    cfg = DiagRemapCfg.uniform(nz, depth)
    hz = build_z_thickness(cfg, jnp.full((1, 1), depth))
    Tz = remap_to_z(T, h, hz, cfg)
    got = float(jnp.sum(hz * Tz))
    want = float(jnp.sum(h * T))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_below_bottom_masked():
    cfg = DiagRemapCfg.uniform(4, 100.0)
    bathy = jnp.full((1, 1), 50.0)
    hz = build_z_thickness(cfg, bathy)
    h = jnp.full((2, 1, 1), 25.0)
    T = jnp.asarray([[[1.0]], [[2.0]]])
    Tz = np.asarray(remap_to_z(T, h, hz, cfg))
    assert np.isfinite(Tz[:2, 0, 0]).all()
    assert np.isnan(Tz[2:, 0, 0]).all()
