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


def test_rho_space_diag_remap():
    """build_rho_thickness + remap onto target-density layers (the
    MOM_diag_remap rho diagnostic coordinate): a stably stratified
    column maps each density bin to its depth range, and the remapped
    temperature is monotone in rho."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.framework.diag_remap import build_rho_thickness
    from mom6_tpu.ale.remapping import RemapCfg, remap_column_means
    from mom6_tpu.eos import LinearEOS
    eos = LinearEOS(rho_t0_s0=1000.0)
    nk = 6
    h = jnp.full((nk, 2, 2), 500.0)
    T = jnp.broadcast_to(jnp.linspace(18.0, 2.0, nk).reshape(-1, 1, 1),
                         (nk, 2, 2))
    S = jnp.full((nk, 2, 2), 35.0)
    bathy = jnp.full((2, 2), 3000.0)
    # targets spanning the column's density range (1000-0.2T+28)
    rho_t = 1000.0 + 28.0 - 0.2 * np.array([18.0, 14.0, 10.0, 6.0,
                                            2.0])
    h_rho = build_rho_thickness(rho_t, h, bathy, T, S, eos)
    np.testing.assert_allclose(np.asarray(h_rho.sum(0)), 3000.0,
                               rtol=1e-12)
    assert np.all(np.asarray(h_rho) >= 0.0)
    T_rho = np.asarray(remap_column_means(h, T, h_rho + 1e-30,
                                          RemapCfg(scheme="PLM")))
    col = T_rho[:, 0, 0]
    assert np.all(np.diff(col) < 1e-9)        # colder in denser bins
