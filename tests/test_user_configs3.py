"""Third user-config batch: DOME2d / dumbbell / Neverworld /
baroclinic_zone / ISOMIP T-S / BFB / shelfwave / supercritical /
dyed_channel / user_change_diffusivity
(/root/reference/src/user/*.F90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 4
DT = 300.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 400.0
LENLAT = 400.0
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
"""


def _step(m, nsteps=2):
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(nsteps):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.h)))
    return s, tr


def test_dome2d_zstar_bay_water():
    """DOME2d in z*: salty cold water fills the western bay down to
    DOME2D_SHELF_DEPTH of the column (DOME2d_initialize_
    temperature_salinity, ZSTAR branch)."""
    m = build_model(ParamFile(text=BASE + """
TOPO_CONFIG = DOME2D
THICKNESS_CONFIG = DOME2D
TS_CONFIG = DOME2D
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = ZSTAR
ALE_COORDINATE_CONFIG = UNIFORM
T_REF = 10.0
INITIAL_SSS = 34.0
S_RANGE = 2.0
"""))
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    assert d[0, 0] == pytest.approx(200.0)       # bay shelf 0.2*H
    assert d[0, -1] == pytest.approx(1000.0)
    S = np.asarray(m.domain.interior(m.state.S[0]))
    T = np.asarray(m.domain.interior(m.state.T[0]))
    assert S[0, 0] == pytest.approx(37.0)        # S_REF + S_RANGE
    assert T[0, 0] == pytest.approx(1.0)         # DOME2D_T_BAY
    assert S[0, -1] < 34.5                       # ambient stratified
    _step(m)


def test_dumbbell_layer_and_forcing():
    """Dumbbell: split salinity, SLP seesaw p_surf, reservoir
    salinity restoring (dumbbell_surface_forcing.F90)."""
    m = build_model(ParamFile(text=BASE + """
TOPO_CONFIG = dumbbell
DUMBBELL_LEN = 400.0
THICKNESS_CONFIG = dumbbell
TS_CONFIG = dumbbell
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = SIGMA
ALE_COORDINATE_CONFIG = UNIFORM
WIND_CONFIG = dumbbell
BUOY_CONFIG = dumbbell
DUMBBELL_SLP_AMP = 10000.0
RESTOREBUOY = True
FLUXCONST = 0.5
INITIAL_SSS = 34.0
INITIAL_S_RANGE = 2.0
"""))
    S = np.asarray(m.domain.interior(m.state.S[0]))
    assert S[8, 1] == pytest.approx(33.0)        # west reservoir
    assert S[8, -2] == pytest.approx(35.0)       # east reservoir
    # SLP forcing: antisymmetric-in-time seesaw confined to reservoirs
    f = m.forces_fn(jnp.asarray(43200.0))
    p = np.asarray(m.domain.interior(f.p_surf))
    assert abs(p[8, 1]) > 0.0
    assert p[8, 8] == 0.0                        # strait unforced
    assert m.fluxes_fn is not None
    fl = m.fluxes_fn(m.state, jnp.asarray(0.0))
    assert fl.lprec is not None
    _step(m)


def test_neverworld_builds():
    """Neverworld topography + prescribed thickness profile."""
    m = build_model(ParamFile(text=BASE + """
TOPO_CONFIG = Neverworld
MINIMUM_DEPTH = 0.0
THICKNESS_CONFIG = Neverworld
INIT_THICKNESS_PROFILE = 100.0, 200.0, 300.0, 400.0
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
"""))
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    assert d.max() <= 1000.0 + 1e-9
    assert d.min() == 0.0                        # continental land
    h = np.asarray(m.domain.interior(m.state.h))
    # deep-ocean column follows the prescribed profile
    iy, ix = np.unravel_index(np.argmax(d), d.shape)
    assert h[0, iy, ix] == pytest.approx(100.0, rel=0.2)
    _step(m)


def test_baroclinic_zone_ts():
    m = build_model(ParamFile(text=BASE + """
TOPO_CONFIG = flat
THICKNESS_CONFIG = uniform
TS_CONFIG = baroclinic_zone
T_REF = 10.0
BCZIC%DTDZ = 0.01
BCZIC%DELTA_T = 2.0
BCZIC%L_ZONE = 100.0
REENTRANT_Y = True
"""))
    T = np.asarray(m.domain.interior(m.state.T))
    # front across x: east warmer than west by ~2*DELTA_T
    assert T[0, 8, -1] - T[0, 8, 0] == pytest.approx(4.0, abs=0.2)
    # stratified: deeper is colder (dT/dz > 0, z<0)
    assert T[-1, 8, 8] < T[0, 8, 8]
    _step(m)


def test_isomip_ts_profile():
    m = build_model(ParamFile(text=BASE + """
TOPO_CONFIG = flat
THICKNESS_CONFIG = uniform
TS_CONFIG = ISOMIP
ISOMIP_T_SUR = -1.9
ISOMIP_T_BOT = 1.0
ISOMIP_S_SUR = 33.8
ISOMIP_S_BOT = 34.55
EQN_OF_STATE = LINEAR
"""))
    T = np.asarray(m.domain.interior(m.state.T))
    S = np.asarray(m.domain.interior(m.state.S))
    # T(z) = T_sur + (T_sur - T_bot)/H · z at the first layer center
    # z = -125 m: -1.9 + (-0.0029)(-125) = -1.5375
    assert T[0, 8, 8] == pytest.approx(-1.5375, abs=1e-6)
    assert S[-1, 8, 8] > S[0, 8, 8]              # saltier at depth
    assert T[-1, 8, 8] > T[0, 8, 8]              # warmer at depth


def test_bfb_coord_forcing_sponge():
    """BFB: linear Rlay from the SST pair, restoring heat-flux ramp,
    south-only eta sponge (BFB_initialization.F90 /
    BFB_surface_forcing.F90)."""
    m = build_model(ParamFile(text="""
NIGLOBAL = 8
NJGLOBAL = 16
NK = 4
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
SOUTHLAT = 20.0
LENLAT = 40.0
WESTLON = 0.0
LENLON = 20.0
MAXIMUM_DEPTH = 2000.0
TOPO_CONFIG = flat
COORD_CONFIG = BFB
SST_S = 20.0
T_BOT = 5.0
THICKNESS_CONFIG = uniform
TS_CONFIG = uniform
T_REF = 10.0
WIND_CONFIG = zero
BUOY_CONFIG = BFB
RESTOREBUOY = True
FLUXCONST = 0.5
LFR_SLAT = 20.0
LFR_NLAT = 40.0
SST_N = 10.0
SPONGE = True
SPONGE_CONFIG = BFB
"""))
    rlay = np.asarray(m.vgrid.Rlay)
    assert rlay[0] == pytest.approx(1000.0 + 0.8 * 35.0 - 0.2 * 20.0)
    assert rlay[-1] == pytest.approx(1000.0 + 0.8 * 35.0 - 0.2 * 5.0)
    fl = m.fluxes_fn(m.state, jnp.asarray(0.0))
    q = np.asarray(m.domain.interior(fl.sensible))
    # T=10 everywhere: restoring heats in the south (target 20),
    # ~zero at the north edge (target → 10)
    assert q[0, 4] > 1.0
    assert abs(q[-1, 4]) < abs(q[0, 4]) * 0.1
    assert m.ocean_cfg.sponge_data is not None
    _step(m)


OBC_BASE = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 2
DT = 120.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 160.0
MAXIMUM_DEPTH = 100.0
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
"""


def test_shelfwave_obc():
    m = build_model(ParamFile(text=OBC_BASE + """
TOPO_CONFIG = shelfwave
MINIMUM_DEPTH = 10.0
SHELFWAVE_Y_LENGTH_SCALE = 50.0
REENTRANT_X = False
F_0 = 1.0e-4
THICKNESS_CONFIG = uniform
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=0,J=0:N,FLATHER"
OBC_USER_CONFIG = shelfwave
SHELFWAVE_AMPLITUDE = 0.1
"""))
    assert m.obc_update_fn is not None
    ob = m.obc_update_fn(m.obc, m.grid, m.state.h, jnp.asarray(0.0))
    u = np.asarray(ob.u_w)
    assert np.any(np.abs(u) > 1e-4)
    s, _ = _step(m, nsteps=3)
    assert np.abs(np.asarray(s.u)).max() > 1e-6


def test_supercritical_inflow():
    m = build_model(ParamFile(text=OBC_BASE + """
TOPO_CONFIG = flat
F_0 = 0.0
THICKNESS_CONFIG = uniform
OBC_NUMBER_OF_SEGMENTS = 2
OBC_SEGMENT_001 = "I=0,J=0:N,FLATHER"
OBC_SEGMENT_002 = "I=N,J=0:N,FLATHER"
OBC_USER_CONFIG = supercritical
SUPERCRITICAL_ZONAL_FLOW = 2.0
"""))
    ob = m.obc_update_fn(m.obc, m.grid, m.state.h, jnp.asarray(0.0))
    assert float(jnp.max(ob.u_w)) == pytest.approx(2.0)
    assert float(jnp.max(ob.u_e)) == pytest.approx(2.0)
    s, _ = _step(m, nsteps=4)
    u = np.asarray(m.domain.interior(s.u))
    assert u.max() > 0.05                        # inflow spinning up


def test_dyed_channel_tracers():
    """Two dyed segments: each segment's reservoir carries its own
    dye; the time-varying channel flow advects dye 1 inward."""
    m = build_model(ParamFile(text=OBC_BASE + """
TOPO_CONFIG = flat
F_0 = 0.0
THICKNESS_CONFIG = uniform
OBC_NUMBER_OF_SEGMENTS = 2
OBC_SEGMENT_001 = "I=0,J=0:N,FLATHER"
OBC_SEGMENT_002 = "I=N,J=0:N,FLATHER"
OBC_USER_CONFIG = dyed_channel
NUM_DYE_TRACERS = 2
CHANNEL_MEAN_FLOW = 1.0
CHANNEL_TIDAL_AMP = 0.5
CHANNEL_FLOW_FREQUENCY = 2.3148e-5
"""))
    assert m.tracers is not None and "dye_01" in m.tracers
    # segment 1 (west) sources dye_01=1, dye_02=0
    ext = {e: dict(kv) for e, kv in m.obc.tracer_ext}
    assert ext["W"]["dye_01"] == 1.0
    assert ext["W"]["dye_02"] == 0.0
    assert ext["E"]["dye_02"] == 1.0
    s, tr = _step(m, nsteps=6)
    d1 = np.asarray(m.domain.interior(tr["dye_01"]))
    assert d1.max() > 1e-6                       # dye entered
    assert np.all(np.isfinite(d1))


def test_user_change_diffusivity_window():
    from mom6_tpu.param.vertical.user_change_diff import (_val_weights,
                                                          UserKdCfg)
    r = (0.0, 1.0, 2.0, 3.0)
    assert float(_val_weights(jnp.asarray(-0.5), r)) == 0.0
    assert float(_val_weights(jnp.asarray(1.5), r)) == 1.0
    assert float(_val_weights(jnp.asarray(3.5), r)) == 0.0
    v = float(_val_weights(jnp.asarray(0.5), r))
    assert 0.0 < v < 1.0 and v == pytest.approx(0.5)
    with pytest.raises(ValueError):
        UserKdCfg(lat_range=(1.0, 0.0, 2.0, 3.0)).validate()


def test_user_change_diffusivity_in_model():
    """USER_CHANGE_DIFFUSIVITY adds KD in the configured latitude
    band: the low-latitude half mixes T faster."""
    cfg = """
NIGLOBAL = 4
NJGLOBAL = 8
NK = 10
DT = 600.0
DT_THERM = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
SOUTHLAT = 0.0
LENLAT = 40.0
WESTLON = 0.0
LENLON = 10.0
MAXIMUM_DEPTH = 500.0
TOPO_CONFIG = flat
THICKNESS_CONFIG = uniform
TS_CONFIG = linear
T_REF = 15.0
T_RANGE = 10.0
EQN_OF_STATE = LINEAR
KD = 0.0
"""
    extra = """
USER_CHANGE_DIFFUSIVITY = True
USER_KD_ADD = 1.0e-2
USER_KD_ADD_LAT_RANGE = 0.0, 1.0, 19.0, 20.0
USER_KD_ADD_RHO_RANGE = -1.0e9, -0.9e9, 0.9e9, 1.0e9
"""
    m0 = build_model(ParamFile(text=cfg))
    m1 = build_model(ParamFile(text=cfg + extra))
    s0, _ = _step(m0, nsteps=6)
    s1, _ = _step(m1, nsteps=6)
    T0 = np.asarray(m0.domain.interior(s0.T))
    T1 = np.asarray(m1.domain.interior(s1.T))
    # inside the band (south half) mixing reduced the vertical
    # contrast; outside it matches the control
    c0 = T0[0, 1, 2] - T0[-1, 1, 2]
    c1 = T1[0, 1, 2] - T1[-1, 1, 2]
    assert c1 < c0 - 1e-4
    np.testing.assert_allclose(T1[:, -1, 2], T0[:, -1, 2], atol=1e-12)
