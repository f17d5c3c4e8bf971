"""Round-5 parity depth: bulk-mixed-layer energetics options
(BULK_RI_ML / TKE_DECAY / HMIX_MIN / ML_OMEGA_FRAC) and the
open-boundary viscous-stress options (OBC_FREESLIP_VORTICITY /
OBC_FREESLIP_STRAIN / OBC_ZERO_BIHARMONIC) + USE_LAND_MASK_FOR_HVISC.

Reference anchors: MOM_bulk_mixed_layer.F90:1530-1537 (TKE decay
scale), :1789 (bulk-Ri MKE release), :1783,1956 (HMIX_MIN);
MOM_open_boundary.F90:468-516 and MOM_hor_visc.F90:735,889
(OBC shear/biharmonic adjustments); MOM_hor_visc.F90:705
(USE_LAND_MASK_FOR_HVISC).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.param.vertical.bulk_mixed_layer import (
    BulkMixedLayerCfg, bulk_mixed_layer)
from mom6_tpu.param.lateral.hor_visc import (HorViscCfg,
                                             horizontal_viscosity)
from mom6_tpu.eos.linear import LinearEOS


def _column(nj=4, ni=4, nk=8):
    h = jnp.full((nk, nj, ni), 25.0)
    # stable stratification: T decreasing downward
    T = jnp.broadcast_to(
        (20.0 - 1.0 * jnp.arange(nk))[:, None, None], (nk, nj, ni))
    S = jnp.full((nk, nj, ni), 35.0)
    return h, T, S


def _eos():
    return LinearEOS(rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8)


def _ml_depth(cfg, ustar=0.02, absf=None, u=None, v=None, dt=3600.0):
    h, T, S = _column()
    bf = jnp.zeros(h.shape[1:])
    us = jnp.full(h.shape[1:], ustar)
    _, _, _, _, hml = bulk_mixed_layer(cfg, h, T, S, _eos(), us, bf,
                                       dt, u=u, v=v, absf=absf)
    return float(hml[1, 1])


def test_tke_decay_shoals_ml():
    base = BulkMixedLayerCfg(tke_decay=0.0, bulk_ri=0.0)
    absf = jnp.full((4, 4), 1.0e-4)
    d0 = _ml_depth(base, absf=absf)
    d1 = _ml_depth(dataclasses.replace(base, tke_decay=2.5), absf=absf)
    assert d1 < d0, (d0, d1)
    # no absf supplied -> decay inactive regardless of tke_decay
    d2 = _ml_depth(dataclasses.replace(base, tke_decay=2.5))
    assert d2 == pytest.approx(d0, rel=1e-12)


def test_omega_frac_strengthens_decay_at_low_f():
    # near the equator |f| ~ 0: omega_frac blends in the full 2*Omega,
    # shortening the decay scale and shoaling the ML
    absf = jnp.full((4, 4), 1.0e-6)
    base = BulkMixedLayerCfg(tke_decay=2.5, bulk_ri=0.0)
    d0 = _ml_depth(base, absf=absf)
    d1 = _ml_depth(dataclasses.replace(base, omega_frac=1.0),
                   absf=absf)
    assert d1 < d0, (d0, d1)


def test_hmix_min_floors_ml_depth():
    base = BulkMixedLayerCfg(bulk_ri=0.0)
    d0 = _ml_depth(base, ustar=0.0)
    assert d0 == pytest.approx(25.0)          # no TKE: seed layer only
    d1 = _ml_depth(dataclasses.replace(base, hmix_min=90.0), ustar=0.0)
    assert d1 == pytest.approx(90.0, rel=1e-6)


def test_bulk_ri_shear_deepens_ml():
    base = BulkMixedLayerCfg(bulk_ri=0.0)
    nk = 8
    # strong shear: ML moving, interior at rest
    u = jnp.zeros((nk, 4, 4)).at[0].set(0.8)
    v = jnp.zeros((nk, 4, 4))
    d0 = _ml_depth(base, u=u, v=v)
    d1 = _ml_depth(dataclasses.replace(base, bulk_ri=0.05), u=u, v=v)
    assert d1 > d0, (d0, d1)


def test_bml_conserves_heat_and_salt():
    cfg = BulkMixedLayerCfg(bulk_ri=0.05, tke_decay=2.5, hmix_min=40.0)
    h, T, S = _column()
    us = jnp.full(h.shape[1:], 0.02)
    bf = jnp.zeros(h.shape[1:])
    absf = jnp.full(h.shape[1:], 5e-5)
    nk = h.shape[0]
    u = jnp.zeros((nk, 4, 4)).at[0].set(0.3)
    hn, Tn, Sn, _, _ = bulk_mixed_layer(cfg, h, T, S, _eos(), us, bf,
                                        3600.0, u=u, v=jnp.zeros_like(u),
                                        absf=absf)
    np.testing.assert_allclose(np.sum(np.asarray(hn * Tn), axis=0),
                               np.sum(np.asarray(h * T), axis=0),
                               rtol=1e-10)
    np.testing.assert_allclose(np.sum(np.asarray(hn * Sn), axis=0),
                               np.sum(np.asarray(h * S), axis=0),
                               rtol=1e-10)
    np.testing.assert_allclose(np.sum(np.asarray(hn), axis=0),
                               np.sum(np.asarray(h), axis=0),
                               rtol=1e-12)


# ---------------------------------------------------------------------
# hor_visc OBC + land-mask options
# ---------------------------------------------------------------------

def _visc_setup(ni=16, nj=16, nk=2, land=False):
    dn = Domain(ni=ni, nj=nj, halo=4, reentrant_x=False,
                reentrant_y=False)
    if land:
        def depth_fn(x, y):
            d = jnp.full(x.shape, 1000.0)
            return d.at[..., : x.shape[-1] // 2].set(0.0)
    else:
        def depth_fn(x, y):
            return jnp.full(x.shape, 1000.0)
    g = cartesian_grid(dn, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       depth_fn=depth_fn, max_depth=1000.0)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((nk, dn.njh, dn.nih))) * 0.1
    v = jnp.asarray(rng.standard_normal((nk, dn.njh, dn.nih))) * 0.1
    h = jnp.full((nk, dn.njh, dn.nih), 500.0)
    u = u * g.mask2dCu
    v = v * g.mask2dCv
    return dn, g, u, v, h


def _fake_obc(dn, g, open_e=True):
    from mom6_tpu.obc.open_boundary import (OpenBoundaries,
                                            open_grid_masks)
    obc = OpenBoundaries(open_w=False, open_e=open_e, open_s=False,
                         open_n=False, halo=dn.halo, nil=dn.nil,
                         njl=dn.njl)
    return obc, open_grid_masks(g, obc)


def test_obc_freeslip_vorticity_changes_edge_only():
    dn, g, u, v, h = _visc_setup()
    cfg = HorViscCfg(laplacian=True, leith_kh=True,
                     leith_lap_const=1.0, dt=600.0)
    obc, g = _fake_obc(dn, g)
    r0 = horizontal_viscosity(g, u, v, h, cfg)
    r1 = horizontal_viscosity(
        g, u, v, h,
        dataclasses.replace(cfg, obc_freeslip_vorticity=True), obc=obc)
    d0 = np.asarray(r0.diffu)
    d1 = np.asarray(r1.diffu)
    H, ni = dn.halo, dn.nil
    # far interior unchanged
    np.testing.assert_allclose(d0[:, :, H:H + ni - 4],
                               d1[:, :, H:H + ni - 4], rtol=1e-12)
    # the Leith coefficient near the open edge sees the zeroed
    # vorticity component -> some change within the last columns
    assert not np.allclose(d0[:, H:H + dn.njl, H + ni - 3:H + ni],
                           d1[:, H:H + dn.njl, H + ni - 3:H + ni])


def test_obc_freeslip_strain_zeroes_edge_stress():
    dn, g, u, v, h = _visc_setup()
    cfg = HorViscCfg(laplacian=True, kh=100.0, dt=600.0)
    obc, g = _fake_obc(dn, g)
    r1 = horizontal_viscosity(
        g, u, v, h, dataclasses.replace(cfg, obc_zero_strain=True),
        obc=obc)
    r0 = horizontal_viscosity(g, u, v, h, cfg)
    d0 = np.asarray(r0.diffv)
    d1 = np.asarray(r1.diffv)
    assert not np.allclose(d0, d1)


def test_obc_zero_biharmonic_changes_boundary_band():
    dn, g, u, v, h = _visc_setup()
    cfg = HorViscCfg(biharmonic=True, ah=1.0e9, dt=600.0)
    obc, g = _fake_obc(dn, g)
    r0 = horizontal_viscosity(g, u, v, h, cfg, obc=obc)
    r1 = horizontal_viscosity(
        g, u, v, h, dataclasses.replace(cfg, obc_zero_biharmonic=True),
        obc=obc)
    d0 = np.asarray(r0.diffu)
    d1 = np.asarray(r1.diffu)
    H, ni = dn.halo, dn.nil
    np.testing.assert_allclose(d0[:, :, H:H + ni - 4],
                               d1[:, :, H:H + ni - 4], rtol=1e-12)
    assert not np.allclose(d0[:, H:H + dn.njl, H + ni - 3:H + ni],
                           d1[:, H:H + dn.njl, H + ni - 3:H + ni])


def test_land_mask_option_affects_coastal_stress_only():
    dn, g, u, v, h = _visc_setup(land=True)
    cfg = HorViscCfg(laplacian=True, kh=200.0, no_slip=True, dt=600.0)
    r_mask = horizontal_viscosity(g, u, v, h, cfg)
    r_raw = horizontal_viscosity(
        g, u, v, h, dataclasses.replace(cfg, use_land_mask=False))
    dm = np.asarray(r_mask.diffu)
    dr = np.asarray(r_raw.diffu)
    # difference confined to faces adjacent to the land column
    assert np.isfinite(dm).all() and np.isfinite(dr).all()
    coast = dn.halo + dn.nil // 2
    # stay clear of the solid east wall too: the land-mask option
    # also halves h_u at wall-adjacent faces there
    far = slice(coast + 3, dn.halo + dn.nil - 3)
    np.testing.assert_allclose(dm[:, :, far], dr[:, :, far], rtol=1e-12)


def test_noslip_wall_drag_active():
    """With NOSLIP and the (masked) coastal hq, the wall shear must
    exert stress on the first ocean face (was silently zero when h_u
    used the face-mask product)."""
    dn, g, u, v, h = _visc_setup(land=True)
    nk = u.shape[0]
    # uniform along-coast flow -> only wall shear contributes
    v_flow = jnp.full_like(v, 0.2) * g.mask2dCv
    u_zero = jnp.zeros_like(u)
    cfg = HorViscCfg(laplacian=True, kh=200.0, no_slip=True, dt=600.0)
    r = horizontal_viscosity(g, u_zero, v_flow, h, cfg)
    coast_col = dn.halo + dn.nil // 2      # first wet column
    dv = np.asarray(r.diffv)[:, dn.halo + 2:dn.halo + dn.njl - 2,
                             coast_col]
    assert np.abs(dv).max() > 0.0
