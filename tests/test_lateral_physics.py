import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.param.lateral.meke import MEKECfg, step_meke, meke_khth
from mom6_tpu.param.lateral.varmix import (VarMixCfg,
                                           calc_resolution_function)
from mom6_tpu.param.lateral.mixed_layer_restrat import (
    MLRestratCfg, mixed_layer_restrat)
from mom6_tpu.eos import LinearEOS


def setup(ni=16, nj=16, nk=4, f0=1e-4, dxkm=10.0):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=ni * dxkm, lenlat_km=nj * dxkm,
                       f0=f0, max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    return d, g, vg


def test_meke_source_damping_balance():
    d, g, vg = setup()
    cfg = MEKECfg()
    e = jnp.zeros_like(g.bathyT)
    src = jnp.full_like(e, 1e-4)     # [m3 s-3] column conversion
    for _ in range(200):
        e = step_meke(cfg, g, e, dt=3600.0, gm_work=src)
    ev = float(jnp.mean(d.interior(e)))
    assert ev > 0.0
    # equilibrium: gm*src/H ≈ cdrag*sqrt(2E)*E/H → finite E
    assert np.isfinite(ev) and ev < 10.0
    k = meke_khth(cfg, e)
    assert float(jnp.max(k)) > 0.0


def test_meke_decays_without_source():
    d, g, vg = setup()
    cfg = MEKECfg()
    e0 = jnp.full_like(g.bathyT, 0.01)
    e = e0
    for _ in range(50):
        e = step_meke(cfg, g, e, dt=3600.0)
    assert float(jnp.max(e)) < 0.01


def test_resolution_function_limits():
    """Coarse grid (dx >> Rd) → res_fn ≈ 1; fine grid → → 0."""
    d, g, vg = setup(dxkm=100.0)     # 100 km grid
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 250.0)))
    cfg = VarMixCfg()
    res = calc_resolution_function(cfg, g, vg, h)
    coarse = float(jnp.mean(d.interior(res.res_fn)))

    d2, g2, vg2 = setup(dxkm=1.0)    # 1 km grid
    h2 = d2.fill_halos(d2.pad(jnp.full((4, 16, 16), 250.0)))
    res2 = calc_resolution_function(cfg, g2, vg2, h2)
    fine = float(jnp.mean(d2.interior(res2.res_fn)))
    assert coarse > 0.8
    assert fine < 0.2
    assert np.all(np.asarray(res.res_fn) >= 0)
    assert np.all(np.asarray(res.res_fn) <= 1)


def test_resolution_function_equatorial_beta():
    """On an equatorial beta plane (f=0) the denominator is carried
    entirely by the beta term: Gill's definition (factor 2,
    MOM_lateral_mixing_coeffs.F90:1507) gives a SMALLER equatorial
    deformation radius, hence a LARGER res_fn, than Pedlosky's; both
    stay physical (strictly inside (0,1)) instead of collapsing to
    the f-floor."""
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=1600.0, lenlat_km=1600.0,
                       f0=0.0, beta=2.3e-11, max_depth=1000.0,
                       south_lat=-800.0)
    vg = VerticalGrid.uniform(nk=4, gint=0.01)
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 250.0)))
    res_gill = calc_resolution_function(
        VarMixCfg(gill_equatorial_ld=True), g, vg, h)
    res_ped = calc_resolution_function(
        VarMixCfg(gill_equatorial_ld=False), g, vg, h)
    rg = np.asarray(d.interior(res_gill.res_fn))
    rp = np.asarray(d.interior(res_ped.res_fn))
    assert np.all(rg > rp)          # beta term doubled → less resolved
    assert np.all((rg > 0.0) & (rg < 1.0))
    # the deformation-radius ratio shrinks by exactly sqrt(2) where f≈0
    j0 = rg.shape[0] // 2
    ratio = (np.asarray(d.interior(res_ped.rd_dx))[j0]
             / np.asarray(d.interior(res_gill.rd_dx))[j0])
    np.testing.assert_allclose(ratio, np.sqrt(2.0), rtol=2e-2)


def test_resolution_function_face_vs_interpolated():
    """On a uniform f-plane the directly-evaluated face Res_fn
    (INTERPOLATE_RES_FN=False, the reference default) agrees with the
    h-point average (=True) because every input is spatially uniform;
    both paths populate res_fn_u/res_fn_v."""
    d, g, vg = setup(dxkm=50.0, f0=8e-5)
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 250.0)))
    direct = calc_resolution_function(
        VarMixCfg(interpolate_res_fn=False), g, vg, h)
    interp = calc_resolution_function(
        VarMixCfg(interpolate_res_fn=True), g, vg, h)
    for a, b in ((direct.res_fn_u, interp.res_fn_u),
                 (direct.res_fn_v, interp.res_fn_v)):
        np.testing.assert_allclose(np.asarray(d.interior(a)),
                                   np.asarray(d.interior(b)),
                                   rtol=1e-6)
    # and the face values bracket the h-point field
    ru = float(jnp.mean(d.interior(direct.res_fn_u)))
    rh = float(jnp.mean(d.interior(direct.res_fn)))
    np.testing.assert_allclose(ru, rh, rtol=1e-3)


def test_varmix_ktop_excludes_shallow_interfaces():
    """VARMIX_KTOP > 2 removes the shallowest interfaces from the SN
    integral (calc_slope_functions loops K=nz..ktop), reducing the
    Eady rate when the near-surface slopes dominate."""
    from mom6_tpu.param.lateral.varmix import calc_eady_rate
    d, g, vg = setup(nk=6, dxkm=10.0)
    h = jnp.full((6, 16, 16), 200.0)
    # tilt the top interfaces only: slope lives at interfaces 0-1
    j = jnp.arange(16, dtype=jnp.float64).reshape(1, -1, 1)
    h = h.at[0].add(20.0 * j[0]).at[1].add(-20.0 * j[0])
    h = d.fill_halos(d.pad(h))
    sn_all = calc_eady_rate(VarMixCfg(varmix_ktop=2), g, vg, h)
    sn_cut = calc_eady_rate(VarMixCfg(varmix_ktop=4), g, vg, h)
    assert float(jnp.max(d.interior(sn_all))) > 0.0
    assert float(jnp.max(d.interior(sn_cut))) \
        < 0.7 * float(jnp.max(d.interior(sn_all)))


def test_ml_restrat_flattens_front_and_conserves():
    """A lateral buoyancy front within the mixed layer drives an
    overturning that conserves mass per column total."""
    d, g, vg = setup(nk=4)
    eos = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 50.0)))
    # temperature front in x
    x = np.arange(24)
    T_int = 10.0 + 2.0 * np.tanh((x[None, None, :] - 12) / 2.0) \
        * np.ones((4, 24, 24))
    T = d.fill_halos(jnp.asarray(T_int))
    S = jnp.full_like(T, 35.0)
    cfg = MLRestratCfg(hml_const=100.0)
    res = mixed_layer_restrat(cfg, g, vg, h, dt=3600.0, T=T, S=S,
                              eos=eos)
    a = d.interior(g.areaT)
    m0 = float(jnp.sum(d.interior(h) * a))
    m1 = float(jnp.sum(d.interior(res.h) * a))
    assert abs(m1 - m0) / m0 < 1e-12
    # transports exist and have zero column sums (overturning form)
    colsum = np.asarray(d.interior(jnp.sum(res.uhml, axis=0)))
    assert np.max(np.abs(colsum)) < 1e-6 * np.max(np.abs(
        np.asarray(res.uhml)))
    assert float(jnp.max(jnp.abs(res.uhml))) > 0.0


def test_meke_length_scales_and_structure():
    """MEKE_lengthScales_0d analog: inverse-sum blending, min-blend,
    and the bottom/barotropic structure factors behave per the
    reference's shapes."""
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.param.lateral.meke import (MEKECfg,
                                             meke_length_scales)
    d = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=80.0, f0=1e-4,
                       max_depth=4000.0)
    e = jnp.full((d.njh, d.nih), 0.01)
    depth = jnp.full((d.njh, d.nih), 4000.0)
    rd_dx = jnp.full((d.njh, d.nih), 0.5)
    sn = jnp.full((d.njh, d.nih), 1e-6)
    beta = jnp.full((d.njh, d.nih), 2e-11)
    # min blend picks the smallest enabled scale
    cfg = MEKECfg(a_deform=1.0, a_grid=1.0, use_min_lscale=True,
                  l_fixed=1e9)
    lmix, b2, t2 = meke_length_scales(cfg, g, e, depth, rd_dx, sn,
                                      beta)
    l_grid = float(jnp.sqrt(g.areaT)[6, 6])
    np.testing.assert_allclose(float(lmix[6, 6]), 0.5 * l_grid,
                               rtol=1e-12)     # deform = 0.5*grid
    assert 0.0 < float(b2[6, 6]) <= 1.01
    assert 0.0 < float(t2[6, 6]) <= 1.0
    # inverse-sum blend lies below the smallest component
    cfg2 = MEKECfg(a_deform=1.0, a_grid=1.0, use_min_lscale=False,
                   l_fixed=0.0)
    lmix2, _, _ = meke_length_scales(cfg2, g, e, depth, rd_dx, sn,
                                     beta)
    assert float(lmix2[6, 6]) < 0.5 * l_grid
    # deeper water -> weaker bottom coupling (smaller gamma_b)
    _, b2_deep, _ = meke_length_scales(
        cfg, g, e, 10.0 * depth, 10.0 * rd_dx, sn, beta)
    assert float(b2_deep[6, 6]) < float(b2[6, 6]) + 1e-12


def test_meke_geometric_khth_and_equilibrium():
    """MEKE_GEOMETRIC: KHTH = alpha E/(S N) and the equilibrium
    energy (alpha SN H / cdrag)^2."""
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.param.lateral.meke import (MEKECfg, meke_khth,
                                             meke_equilibrium)
    d = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=80.0, f0=1e-4,
                       max_depth=4000.0)
    cfg = MEKECfg(geometric=True, geometric_alpha=0.05)
    e = jnp.full((d.njh, d.nih), 0.02)
    sn = jnp.full((d.njh, d.nih), 2e-6)
    kh = meke_khth(cfg, e, sn=sn)
    np.testing.assert_allclose(float(kh[6, 6]), 0.05 * 0.02 / 2e-6,
                               rtol=1e-12)
    depth = jnp.full((d.njh, d.nih), 4000.0)
    e0 = meke_equilibrium(cfg, g, depth, sn)
    np.testing.assert_allclose(float(e0[6, 6]),
                               (0.05 * 2e-6 * 4000.0) ** 2 / 0.003 ** 2,
                               rtol=1e-12)


def test_visbeck_kh_from_eady_rate():
    """KHTH_SLOPE_CFF: the Visbeck diffusivity scales with the Eady
    rate from the actual stratification/slopes."""
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.param.lateral.varmix import (VarMixCfg,
                                               calc_eady_rate,
                                               visbeck_kh)
    from mom6_tpu.eos import LinearEOS
    d = Domain(ni=12, nj=12, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=120.0, lenlat_km=120.0, f0=1e-4,
                       max_depth=2000.0)
    vg = VerticalGrid.uniform(nk=4)
    nk = 4
    h = d.fill_halos(d.pad(jnp.full((nk, 12, 12), 500.0)))
    # a zonal temperature front -> sloped isopycnals -> SN > 0
    x = jnp.linspace(0.0, 4.0, 12)
    T = d.fill_halos(d.pad(
        (10.0 - 2.0 * jnp.arange(nk).reshape(-1, 1, 1))
        + x[None, None, :] * jnp.ones((nk, 12, 12))))
    S = d.fill_halos(d.pad(jnp.full((nk, 12, 12), 35.0)))
    # USE_STORED_SLOPES=True: Eady rate from EOS isoneutral slopes —
    # a T front with FLAT interfaces still yields SN > 0.  The
    # reference-default just-e branch sees only the (flat) interface
    # heights and gives 0 here.
    cfg = VarMixCfg(khth_slope_cff=0.1, use_stored_slopes=True)
    sn = calc_eady_rate(cfg, g, vg, h, T, S, LinearEOS())
    assert float(jnp.max(d.interior(sn))) > 0.0
    sn_just_e = calc_eady_rate(
        VarMixCfg(khth_slope_cff=0.1), g, vg, h, T, S, LinearEOS())
    assert float(jnp.max(d.interior(sn_just_e))) == 0.0
    kh = visbeck_kh(cfg, g, sn)
    assert float(jnp.max(d.interior(kh))) > 0.0
    # no front (uniform T) -> SN = 0 -> KH = 0
    T0 = d.fill_halos(d.pad(jnp.full((nk, 12, 12), 10.0)))
    sn0 = calc_eady_rate(cfg, g, vg, h, T0, S, LinearEOS())
    np.testing.assert_allclose(np.asarray(d.interior(sn0)), 0.0,
                               atol=1e-10)
