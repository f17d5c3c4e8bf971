import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.param.vertical.opacity import (OpacityCfg,
                                             sw_absorption_profile)
from mom6_tpu.tracer.bgc_interface import NPZDPackage
from mom6_tpu.tracer.registry import TracerRegistry


def col(a):
    return jnp.asarray(np.asarray(a, np.float64)).reshape(-1, 1, 1)


def test_sw_profile_conserves_and_decays():
    h = col([5.0] * 20)
    sw = jnp.full((1, 1), 200.0)
    heat, bottom = sw_absorption_profile(OpacityCfg(water_type="IB"),
                                         h, sw)
    hv = np.asarray(heat).ravel()
    assert hv[0] > hv[5] > hv[15] >= 0.0
    # total absorbed + leftover = input
    np.testing.assert_allclose(hv.sum() + float(bottom[0, 0]), 200.0,
                               rtol=1e-12)
    # turbid water (type III) absorbs shallower than clear (type I)
    h1, _ = sw_absorption_profile(OpacityCfg(water_type="I"), h, sw)
    h3, _ = sw_absorption_profile(OpacityCfg(water_type="III"), h, sw)
    assert float(h3[0, 0, 0]) > float(h1[0, 0, 0])
    # Manizza: more chlorophyll → shallower absorption
    hc1, _ = sw_absorption_profile(OpacityCfg(scheme="MANIZZA_05",
                                              chl=0.05), h, sw)
    hc2, _ = sw_absorption_profile(OpacityCfg(scheme="MANIZZA_05",
                                              chl=3.0), h, sw)
    assert float(hc2[0, 0, 0]) > float(hc1[0, 0, 0])


def test_npzd_package():
    reg = TracerRegistry()
    pkg = NPZDPackage()
    tr = pkg.register(reg, (6, 1, 1))
    assert set(tr) == {"no3", "phyto", "zoo", "det"}
    h = col([10.0] * 6)
    tot0 = sum(float(jnp.sum(v * h)) for v in tr.values())
    for _ in range(50):
        tr = pkg.column_physics(tr, h, None, None, dt=3600.0)
    tot1 = sum(float(jnp.sum(v * h)) for v in tr.values())
    # total N approximately conserved (clipping may leak a little)
    assert abs(tot1 - tot0) / tot0 < 0.05
    # phytoplankton grow near the surface
    p = np.asarray(tr["phyto"]).ravel()
    assert p[0] > p[-1]
    assert np.all(np.asarray(list(tr.values())) >= 0.0)


def test_morel_88_opacity_scheme():
    """OPACITY_SCHEME=MOREL_88: chlorophyll controls both the
    penetrating fraction and the extinction depth (Morel & Antoine
    1994 fits)."""
    import dataclasses as _dc
    from mom6_tpu.param.vertical.opacity import (OpacityCfg, _bands)
    lo = _bands(OpacityCfg(scheme="MOREL_88", chl=0.02))
    hi = _bands(OpacityCfg(scheme="MOREL_88", chl=10.0))
    # two bands summing to 1
    for bands in (lo, hi):
        assert abs(sum(f for f, _ in bands) - 1.0) < 1e-12
    # more chlorophyll -> shallower penetration of the deep band
    assert hi[1][1] < lo[1][1]
    # clear water lets a large fraction penetrate deeply
    assert lo[1][0] > 0.4
    assert lo[1][1] > 15.0


def test_exponential_pen_sw_scheme():
    """PEN_SW_SCALE/PEN_SW_FRAC single-band exponential
    (MOM_surface_forcing.F90 / SW_EXP_MODE): 42% of the shortwave
    decays over the e-folding depth, the rest is absorbed at the
    surface, and nothing is lost."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.param.vertical.opacity import (OpacityCfg,
                                                 sw_absorption_profile)
    cfg = OpacityCfg(scheme="EXPONENTIAL", pen_sw_scale=15.0,
                     pen_sw_frac=0.42)
    h = jnp.full((10, 2, 2), 10.0)
    sw = jnp.full((2, 2), 200.0)
    heating, bottom = sw_absorption_profile(cfg, h, sw)
    tot = np.asarray(heating.sum(0) + bottom)
    np.testing.assert_allclose(tot, 200.0, rtol=1e-6)
    # top layer: the 58% non-penetrating part plus the first
    # e-folding slice of the 42%
    expect_top = 200.0 * (0.58 + 0.42 * (1.0 - np.exp(-10.0 / 15.0)))
    np.testing.assert_allclose(np.asarray(heating[0]), expect_top,
                               rtol=1e-6)
    # penetration reaches the interior: layer 3 (30-40 m) sees heat
    assert float(heating[3].min()) > 0.1


def test_correct_absorption_depth_conserves_and_lifts_heat():
    """CORRECT_ABSORPTION_DEPTH (adjustAbsorptionProfile,
    MOM_opacity.F90:755): part of each layer's absorption heats the
    overlying water so the mean heating depth matches the exact
    exponential; total absorbed heat is unchanged and the heating
    centroid moves upward (the lumped per-layer profile places heat
    too deep on coarse grids)."""
    import jax.numpy as jnp
    import numpy as np
    h = jnp.full((6, 4, 4), 40.0)        # coarse 40 m layers
    sw = jnp.full((4, 4), 200.0)
    cfg0 = OpacityCfg(scheme="EXPONENTIAL", pen_sw_scale=15.0,
                      pen_sw_frac=1.0)
    cfg1 = OpacityCfg(scheme="EXPONENTIAL", pen_sw_scale=15.0,
                      pen_sw_frac=1.0, correct_absorption_depth=True)
    h0, b0 = sw_absorption_profile(cfg0, h, sw)
    h1, b1 = sw_absorption_profile(cfg1, h, sw)
    np.testing.assert_allclose(np.asarray(jnp.sum(h0, 0) + b0),
                               np.asarray(jnp.sum(h1, 0) + b1),
                               rtol=1e-12)
    zc = jnp.cumsum(h, 0) - 0.5 * h      # layer-center depths
    d0 = float(jnp.sum(zc * h0) / jnp.sum(h0))
    d1 = float(jnp.sum(zc * h1) / jnp.sum(h1))
    assert d1 < d0                        # heat moved upward
    # analytic pressure-weighted mean depth of I0*exp(-z/zp)/zp over
    # (0, inf) is zp = 15 m; the corrected centroid must land closer
    assert abs(d1 - 15.0) < abs(d0 - 15.0)


def test_depth_limit_fluxes_scales_shallow_columns():
    """DEPTH_LIMIT_FLUXES: surface heating is scaled away where the
    column is thinner than the limit (extractFluxes1d
    H_limit_fluxes)."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.param.vertical.diabatic_aux import \
        apply_boundary_fluxes
    from mom6_tpu.core.forcing import Fluxes
    h_deep = jnp.full((3, 4, 4), 50.0)
    h_thin = jnp.full((3, 4, 4), 0.02)   # 6 cm column
    T = jnp.full((3, 4, 4), 10.0)
    S = jnp.full((3, 4, 4), 35.0)
    fl = Fluxes(sw=jnp.full((4, 4), 500.0))
    kw = dict(dt=3600.0, rho0=1035.0, depth_limit_fluxes=1.0)
    b_deep = apply_boundary_fluxes(h_deep, T, S, fl, **kw)
    b_thin = apply_boundary_fluxes(h_thin, T, S, fl, **kw)
    dT_deep = float(jnp.max(b_deep.T - T))
    dT_thin = float(jnp.max(b_thin.T - T))
    assert dT_deep > 0.0 and dT_thin > 0.0
    # thin column: flux scaled by 0.06/1.0, so even though the layer
    # is 2500x thinner, its warming stays bounded near the deep case
    assert dT_thin < 200.0 * dT_deep
