"""ADAPTIVE vertical coordinate (coord_adapt.F90 re-design)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.ale.regridding import RegridCfg, build_grid
from mom6_tpu.eos import make_eos


def _cols(nj=8, ni=8, nk=6, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(np.full((nk, nj, ni), 50.0)
                    + 10.0 * rng.random((nk, nj, ni)))
    T = jnp.asarray(20.0 - 2.0 * np.arange(nk)).reshape(-1, 1, 1) \
        * jnp.ones((nk, nj, ni))
    S = jnp.full((nk, nj, ni), 35.0)
    return h, T, S


def test_adapt_preserves_totals_and_min_thickness():
    h, T, S = _cols()
    eos = make_eos("LINEAR")
    bathy = jnp.sum(h, axis=0)
    cfg = RegridCfg(mode="ADAPTIVE", min_thickness=0.5)
    h_new = build_grid(cfg, h, bathy, T, S, eos)
    np.testing.assert_allclose(np.asarray(jnp.sum(h_new, axis=0)),
                               np.asarray(jnp.sum(h, axis=0)),
                               rtol=1e-12)
    assert float(jnp.min(h_new)) >= 0.5 - 1e-9
    assert np.all(np.isfinite(np.asarray(h_new)))


def test_adapt_smooths_toward_uniform_spacing():
    """Horizontally uniform columns: no neutral-curvature forcing, so
    the grid diffusion relaxes irregular spacing toward smoothness."""
    nk, nj, ni = 6, 4, 4
    h0 = np.array([10.0, 120.0, 15.0, 110.0, 20.0, 100.0])
    h = jnp.asarray(np.tile(h0.reshape(-1, 1, 1), (1, nj, ni)))
    T = jnp.asarray(np.linspace(20, 4, nk).reshape(-1, 1, 1)
                    * np.ones((1, nj, ni)))
    S = jnp.full((nk, nj, ni), 35.0)
    eos = make_eos("LINEAR")
    # zoom/buoyancy off → uniform background diffusivity → pure
    # smoothing of the interface spacing
    cfg = RegridCfg(mode="ADAPTIVE", min_thickness=1e-3,
                    adapt_time_ratio=0.05, adapt_zoom_coeff=0.0,
                    adapt_buoy_coeff=0.0)
    h_new = np.asarray(build_grid(cfg, h, jnp.sum(h, axis=0), T, S,
                                  eos))[:, 2, 2]
    # roughness (std of layer thickness) decreases
    assert h_new.std() < h0.std()
    np.testing.assert_allclose(h_new.sum(), h0.sum(), rtol=1e-12)


def test_adapt_zoom_concentrates_near_surface():
    """With the zoom term on, near-surface layers end up thinner than
    the same column smoothed without zoom."""
    nk, nj, ni = 6, 4, 4
    h = jnp.full((nk, nj, ni), 100.0)
    T = jnp.asarray(np.linspace(20, 4, nk).reshape(-1, 1, 1)
                    * np.ones((1, nj, ni)))
    S = jnp.full((nk, nj, ni), 35.0)
    eos = make_eos("LINEAR")
    zoom = RegridCfg(mode="ADAPTIVE", adapt_time_ratio=0.2,
                     adapt_zoom_coeff=0.9, adapt_buoy_coeff=0.0,
                     adapt_zoom=100.0, min_thickness=1e-3)
    h_z = np.asarray(build_grid(zoom, h, jnp.sum(h, axis=0), T, S,
                                eos))[:, 2, 2]
    assert h_z[0] < 100.0          # surface layer tightened
    np.testing.assert_allclose(h_z.sum(), 600.0, rtol=1e-12)


def test_adapt_land_columns_untouched():
    h, T, S = _cols(seed=3)
    eos = make_eos("LINEAR")
    mask = jnp.ones(h.shape[1:]).at[2, 3].set(0.0)
    cfg = RegridCfg(mode="ADAPTIVE")
    h_new = build_grid(cfg, h, jnp.sum(h, axis=0), T, S, eos,
                       mask2dT=mask)
    np.testing.assert_array_equal(np.asarray(h_new)[:, 2, 3],
                                  np.asarray(h)[:, 2, 3])


def test_adapt_do_min_enforces_nominal_depths():
    h, T, S = _cols(seed=5)
    eos = make_eos("LINEAR")
    nk = h.shape[0]
    res = tuple(np.full(nk, float(jnp.max(jnp.sum(h, axis=0))) / nk))
    cfg = RegridCfg(mode="ADAPTIVE", resolution=res, adapt_do_min=True,
                    min_thickness=1e-3)
    h_new = build_grid(cfg, h, jnp.sum(h, axis=0), T, S, eos)
    z = np.concatenate([np.zeros((1,) + h.shape[1:]),
                        np.cumsum(np.asarray(h_new), axis=0)])
    htot = np.asarray(jnp.sum(h, axis=0))
    z_nom = np.cumsum(np.asarray(res).reshape(-1, 1, 1)
                      * (htot / htot.max())[None], axis=0)
    assert np.all(z[1:-1] >= z_nom[:-1] - 1e-6)


def test_adapt_in_model_steps():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    text = """
NIGLOBAL = 8
NJGLOBAL = 8
NK = 4
DT = 600.0
DT_THERM = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 80.0
LENLAT = 80.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 400.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 6.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = ADAPTIVE
ADAPT_TIME_RATIO = 0.05
"""
    m = build_model(ParamFile(text=text))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.h)))
    np.testing.assert_allclose(
        float(jnp.sum(m.domain.interior(s.h * m.grid.areaT))),
        float(jnp.sum(m.domain.interior(m.state.h * m.grid.areaT))),
        rtol=1e-11)


def test_regrid_time_filter():
    """REGRID_TIME_SCALE blends the target grid with the old one
    (filtered_grid_motion): with a long timescale the grid barely
    moves; with tau=0 the target is adopted exactly; the shallow/deep
    depths localize the filtering; column totals are preserved."""
    import dataclasses as _dc
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.ale.ale_main import ALECfg, _filter_grid_motion
    from mom6_tpu.ale.regridding import RegridCfg
    h_old = jnp.broadcast_to(
        jnp.array([50.0, 150.0, 300.0, 500.0]).reshape(-1, 1, 1),
        (4, 3, 3))
    h_new = jnp.full((4, 3, 3), 250.0)
    dt = 1800.0
    # long timescale below 100 m, none above
    cfg = ALECfg(regrid_time_scale=1.0e6,
                 filter_shallow_depth=100.0,
                 filter_deep_depth=400.0)
    h_f = _filter_grid_motion(cfg, h_old, h_new, dt)
    np.testing.assert_allclose(np.asarray(h_f.sum(0)), 1000.0,
                               rtol=1e-12)
    hv = np.asarray(h_f[:, 1, 1])
    # the surface interface region (z<100) adopts the target exactly:
    # interface 1 moves 50 -> 250... but its OLD depth (50) < 100, so
    # unfiltered: close to 250
    assert abs(hv[0] - 250.0) < 1.0
    # deep interfaces (old z >= 400) barely move:
    # old interface 3 at 500 -> target 750; w = dt/(tau+dt) ~ 1.8e-3
    z_f = np.concatenate([[0.0], np.cumsum(hv)])
    assert abs(z_f[3] - 500.0) < 1.0
    # tau -> 0 adopts the target
    cfg0 = ALECfg(regrid_time_scale=0.0)
    from mom6_tpu.ale.ale_main import ale_regrid_remap  # noqa: F401
    h_f0 = _filter_grid_motion(
        ALECfg(regrid_time_scale=1e-12, filter_shallow_depth=0.0,
               filter_deep_depth=0.0), h_old, h_new, dt)
    np.testing.assert_allclose(np.asarray(h_f0), np.asarray(h_new),
                               atol=1e-6)


def test_regrid_accelerate_init_converges_coordinate():
    """REGRID_ACCELERATE_INIT (MOM_state_initialization.F90:467 /
    ALE_regrid_accelerated, MOM_ALE.F90:609): with an initial state
    far from the RHO coordinate's equilibrium, the accelerated init
    lands the grid (near) the coordinate attractor — the first model
    regrid then barely moves the interfaces, while the
    non-accelerated init still has most of its adjustment ahead."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    from mom6_tpu.ale.regridding import build_grid

    base = """
NIGLOBAL = 8
NJGLOBAL = 8
NK = 8
DT = 600.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 80.0
LENLAT = 80.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
TS_CONFIG = linear
T_RANGE = 12.0
EQN_OF_STATE = LINEAR
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = RHO
WIND_CONFIG = zero
"""
    drift = {}
    for acc in (False, True):
        extra = ("REGRID_ACCELERATE_INIT = True\n"
                 "REGRID_ACCELERATE_ITERATIONS = 8\n") if acc else ""
        m = build_model(ParamFile(text=base + extra))
        h0 = m.state.h
        h1 = build_grid(m.ocean_cfg.ale.regrid, h0, m.grid.bathyT,
                        m.state.T, m.state.S, m.eos,
                        rlay=m.vgrid.Rlay, rho0=m.vgrid.Rho0,
                        g=m.vgrid.g_Earth, mask2dT=m.grid.mask2dT)
        z0 = jnp.cumsum(h0, axis=0)
        z1 = jnp.cumsum(h1, axis=0)
        drift[acc] = float(jnp.max(jnp.abs(
            m.domain.interior(z1 - z0))))
    assert drift[True] < 0.2 * drift[False], drift
