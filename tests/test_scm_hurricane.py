"""SCM_CVMix_tests single-column configs and the idealized-hurricane
wind forcing (SCM_CVMix_tests.F90, Idealized_Hurricane.F90)."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model
from mom6_tpu.user.configs import scm_cvmix_ts
from mom6_tpu.drivers.surface_forcing import (HurricaneCfg,
                                              idealized_hurricane_fn,
                                              scm_buoyancy_fn)
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid


def test_scm_ts_profile():
    h = jnp.full((10, 1, 1), 10.0)     # 100 m column, 10 m layers
    T, S = scm_cvmix_ts(h, t_mld=25.0, s_mld=25.0, l2_temp=20.0,
                        l2_salt=35.0, dtdz=0.1, dsdz=-0.02,
                        min_temp=4.0)
    Tc = np.asarray(T[:, 0, 0])
    Sc = np.asarray(S[:, 0, 0])
    # uniform in the mixed layer (z_c = -5, -15 > -25 m)
    np.testing.assert_allclose(Tc[:2], 20.0)
    np.testing.assert_allclose(Sc[:2], 35.0)
    # stratified below: T decreases with depth (dT/dz > 0, z < 0)
    assert np.all(np.diff(Tc[2:]) < 0)
    assert np.all(np.diff(Sc[2:]) > 0)
    # exact value at the deepest center: zc=-95, dz = -70
    np.testing.assert_allclose(Tc[-1], 20.0 + 0.1 * (-95.0 + 25.0),
                               rtol=1e-12)


SCM_CFG = """
NIGLOBAL = 4
NJGLOBAL = 4
NK = 20
DT = 600.0
DT_THERM = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 4.0
LENLAT = 4.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 200.0
F_0 = 1.0e-4
REENTRANT_X = True
REENTRANT_Y = True
THICKNESS_CONFIG = uniform
TS_CONFIG = SCM_CVMix_tests
SCM_TEMP_MLD = 20.0
SCM_SALT_MLD = 20.0
SCM_L2_TEMP = 20.0
SCM_L2_SALT = 35.0
SCM_L2_DTDZ = 0.05
EQN_OF_STATE = LINEAR
WIND_CONFIG = SCM_CVMix_tests
SCM_TAU_X = 0.2
SCM_TAU_Y = 0.0
BUOY_CONFIG = SCM_CVMix_tests
SCM_USE_HEAT_FLUX = True
SCM_HEAT_FLUX = -2.0E-5
USE_KPP = True
BULKMIXEDLAYER = False
"""


def test_scm_column_runs_and_mixes():
    """Wind-driven SCM: KPP must deepen the mixed layer and surface
    cooling must lower SST."""
    m = build_model(ParamFile(text=SCM_CFG))
    assert m.forces.taux is not None
    assert float(jnp.max(m.forces.taux)) > 0.19
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    sst0 = float(s.T[0, 6, 6])
    for k in range(24):                 # 4 simulated hours
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.T)))
    sst1 = float(s.T[0, 6, 6])
    assert sst1 < sst0  # cooling + entrainment of colder water
    # below the initial 20 m MLD the deepening boundary layer must
    # have entrained mixed-layer warmth downward SOMEWHERE in the
    # upper thermocline (the round-4 implicit Hallberg entrainment
    # solve pushes the warming one layer deeper than the old explicit
    # scheme did, so pinning one specific layer is too brittle)
    # initial profile: T = 20 above z = -SCM_TEMP_MLD = -20 m,
    # then 20 + SCM_L2_DTDZ*(z + 20) below
    T_init = 20.0 + 0.05 * (np.array([-25.0, -35.0, -45.0, -55.0])
                            + 20.0)
    dT = np.array([float(s.T[k, 6, 6]) for k in (2, 3, 4, 5)]) - T_init
    assert dT.max() > 1e-3, dT


def test_scm_diurnal_sw_peaks_at_noon():
    d = Domain(ni=4, nj=4, halo=4)
    g = cartesian_grid(d, lenlon_km=4.0, lenlat_km=4.0, f0=1e-4,
                       max_depth=100.0)
    fn = scm_buoyancy_fn(g, max_sw=1.0e-4, rho_restore=1035.0,
                         cp=3991.87)
    noon = fn(None, jnp.asarray(0.5 * 86400.0))
    mid = fn(None, jnp.asarray(0.0))
    assert float(jnp.max(noon.sw)) > 400.0   # 1e-4*1035*3991 ≈ 413
    assert float(jnp.max(mid.sw)) == 0.0


def test_hurricane_wind_structure():
    """Holland-profile stress: calm eye, peak near the radius of
    maximum wind, zero beyond 15 rmw, cyclonic rotation (NH), and the
    storm center translates with time."""
    d = Domain(ni=64, nj=64, halo=4)
    # 640 km domain, grid coords in km; rmw = 40 km
    g = cartesian_grid(d, lenlon_km=640.0, lenlat_km=640.0, f0=5e-5,
                       max_depth=1000.0)
    cfg = HurricaneCfg(rad_max_wind=40.0e3, max_windspeed=50.0,
                       translation_spd=5.0, translation_dir=180.0,
                       x0=320.0e3, y0=320.0e3)
    fn = idealized_hurricane_fn(cfg, g)
    f0 = fn(jnp.zeros(()))
    tx = np.asarray(d.interior(f0.taux))
    ty = np.asarray(d.interior(f0.tauy))
    mag = np.hypot(tx, ty)
    assert np.all(np.isfinite(mag))
    assert mag.max() > 1.0          # hurricane-force stress [Pa]
    # the eye is much calmer than the eyewall
    iy = ix = 32
    assert mag[iy, ix] < 0.2 * mag.max()
    # corners are ~11 rmw away: only the small translation-speed
    # residual remains (U10 ramps to zero, U_TS stays — as in the
    # reference where dU = U_TS when U10 = 0)
    assert mag[0, 0] < 0.02
    # cyclonic (counterclockwise) in the northern hemisphere: east of
    # the center the wind (and stress) points mostly northward
    assert ty[32, 50] > 0.0
    assert ty[32, 12] < 0.0
    # translation: 12 h later at 5 m/s westward → center ~216 km west
    f1 = fn(jnp.asarray(12 * 3600.0))
    mag1 = np.hypot(np.asarray(d.interior(f1.taux)),
                    np.asarray(d.interior(f1.tauy)))
    c0 = np.unravel_index(np.argmax(mag), mag.shape)
    c1 = np.unravel_index(np.argmax(mag1), mag1.shape)
    assert c1[1] < c0[1] - 10       # moved west


def test_hurricane_from_config():
    m = build_model(ParamFile(text="""
NIGLOBAL = 32
NJGLOBAL = 32
NK = 3
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 640.0
LENLAT = 640.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 5.0e-5
REENTRANT_X = True
REENTRANT_Y = True
THICKNESS_CONFIG = uniform
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
WIND_CONFIG = ideal_hurr
IDL_HURR_X0 = 320000.0
IDL_HURR_Y0 = 320000.0
"""))
    assert m.forces_fn is not None
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    u = np.asarray(s.u)
    assert np.all(np.isfinite(u))
    assert np.max(np.abs(u)) > 1e-4   # the storm spun up a current
