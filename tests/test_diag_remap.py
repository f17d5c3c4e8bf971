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


def test_reintegrate_conserves_column_totals():
    """Extensive fields re-binned to the output grid keep their exact
    column totals (vertically_reintegrate_diag_field)."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.diag_remap import reintegrate_to_z
    rng = np.random.default_rng(7)
    nk, n = 8, 5
    h = jnp.asarray(rng.uniform(5.0, 50.0, (nk, n)))
    f = jnp.asarray(rng.normal(size=(nk, n)))        # layer integrals
    # output grid spanning at least the column
    hz = jnp.asarray(np.full((12, n), 40.0))
    out = reintegrate_to_z(f, h, hz)
    np.testing.assert_allclose(np.asarray(out).sum(0),
                               np.asarray(f).sum(0), rtol=1e-12)
    # a finer output grid also conserves
    hz2 = jnp.asarray(np.full((40, n), 12.0))
    out2 = reintegrate_to_z(f, h, hz2)
    np.testing.assert_allclose(np.asarray(out2).sum(0),
                               np.asarray(f).sum(0), rtol=1e-12)


def test_interpolate_interface_field():
    """Interface diagnostics interpolate linearly in depth and mask
    below the bottom."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.diag_remap import interpolate_to_z
    nk, n = 5, 3
    h = jnp.asarray(np.full((nk, n), 20.0))          # depth 100
    z_if = np.arange(nk + 1) * 20.0
    fint = jnp.asarray(np.broadcast_to(
        (2.0 * z_if)[:, None], (nk + 1, n)).copy())  # f = 2 z
    out = interpolate_to_z(fint, h, [0.0, 10.0, 55.0, 100.0, 150.0])
    o = np.asarray(out)
    np.testing.assert_allclose(o[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(o[1], 20.0, rtol=1e-12)
    np.testing.assert_allclose(o[2], 110.0, rtol=1e-12)
    np.testing.assert_allclose(o[3], 200.0, rtol=1e-12)
    assert np.isnan(o[4]).all()


def test_diag_downsample_and_cell_measures(tmp_path):
    """Downsampled posting: intensive fields coarsen area-weighted,
    extensive fields coarsen by block sums; masked cells are excluded
    (downsample_diag_field / cell measures)."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.framework.diag import DiagMediator
    d = Domain(ni=8, nj=6, halo=2)
    area = np.ones((6, 8))
    area[:, 0] = 3.0                  # uneven cell measure
    mask = np.ones((6, 8))
    mask[0, :2] = 0.0                 # two land cells
    dm = DiagMediator(d, directory=str(tmp_path))
    fid_i = dm.register("ocean", "sst", area=jnp.asarray(area),
                        mask=jnp.asarray(mask), downsample=2)
    fid_e = dm.register("ocean", "flux", area=jnp.asarray(area),
                        mask=jnp.asarray(mask), downsample=2,
                        cell_method="sum")
    data = np.arange(48, dtype=float).reshape(6, 8)
    pad = np.pad(data, 2, mode="edge")
    dm.post(fid_i, jnp.asarray(pad))
    dm.post(fid_e, jnp.asarray(pad))
    sst = dm._snapshots["ocean.sst"][0]
    flux = dm._snapshots["ocean.flux"][0]
    assert sst.shape == (3, 4)
    # block (0,0): cells (0,0),(0,1) masked; mean over (1,0),(1,1)
    # with weights 3,1 -> (3*8 + 1*9)/4
    np.testing.assert_allclose(sst[0, 0], (3 * 8 + 9) / 4.0)
    # extensive: sum over unmasked cells of the block = 8 + 9
    np.testing.assert_allclose(flux[0, 0], 17.0)
    # area-weighted spatial mean uses measures and excludes land
    m = dm.area_mean(fid_i, jnp.asarray(pad))
    w = area * mask
    np.testing.assert_allclose(m, (data * w).sum() / w.sum())
