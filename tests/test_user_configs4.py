"""basin_builder topography, RGC sponge, controlled forcing
(/root/reference/src/user/{basin_builder,RGC_initialization,
MOM_controlled_forcing}.F90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model


def test_basin_builder_primitives():
    from mom6_tpu.user.basin_builder import (_ns_coast, _ew_coast,
                                             _circ_conic_ridge,
                                             _scurve, _cstprof)
    # scurve: cubic 0→1 with zero end slopes
    assert _scurve(np.asarray(0.0), 0.0, 1.0) == 0.0
    assert _scurve(np.asarray(1.0), 0.0, 1.0) == 1.0
    assert _scurve(np.asarray(0.5), 0.0, 1.0) == pytest.approx(0.5)
    # coast profile: land at the coast line, full depth far away
    assert _cstprof(np.asarray(0.0), 0.0, 10.0, sh=0.1) == 0.0
    assert _cstprof(np.asarray(20.0), 0.0, 10.0, sh=0.1) \
        == pytest.approx(1.0)
    # NS coast blocks a meridional strip
    lon, lat = np.meshgrid(np.linspace(0, 20, 21),
                           np.linspace(0, 20, 21))
    d = _ns_coast(lon, lat, 10.0, 0.0, 20.0, 5.0, 0.1)
    assert d[10, 10] == 0.0                      # on the coast: land
    assert d[10, 0] == pytest.approx(1.0)        # far west: open
    # ring ridge rises from the abyssal plain
    r = _circ_conic_ridge(lon, lat, 10.0, 10.0, 5.0, 2.0, 0.5)
    assert r[10, 15] == pytest.approx(0.5)       # on the ring crest
    assert r[10, 10] == pytest.approx(1.0)       # ring center: deep


def test_basin_builder_from_config():
    m = build_model(ParamFile(text="""
NIGLOBAL = 20
NJGLOBAL = 20
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 200.0
LENLAT = 200.0
MAXIMUM_DEPTH = 1000.0
MINIMUM_DEPTH = 1.0
TOPO_CONFIG = basin_builder
BBUILDER_N = 2
BBUILDER_001_FUNC = NS_COAST
BBUILDER_001_PARS = 100.0, 0.0, 200.0, 40.0, 100.0
BBUILDER_002_FUNC = CIRC_SCURVE_RIDGE
BBUILDER_002_PARS = 50.0, 100.0, 30.0, 10.0, 500.0
THICKNESS_CONFIG = uniform
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
"""))
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    assert d.max() == pytest.approx(1000.0)
    # the NS coast produces land along lon=100 km (column 10)
    assert d[5, 10] == 0.0
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    s, a, tr = step(s, a, tr, n=0)
    assert np.all(np.isfinite(np.asarray(s.h)))


def test_rgc_sponge(tmp_path):
    """RGC: analytic eastern-strip damping, file T/S targets on their
    own thickness grid, u/v damped toward rest."""
    from mom6_tpu.framework.io import write_fields
    nk, nj, ni = 3, 8, 16
    T = np.full((nk, nj, ni), 12.0)
    S = np.full((nk, nj, ni), 34.0)
    h = np.full((nk, nj, ni), 500.0 / nk)
    write_fields(str(tmp_path / "rgc.nc"),
                 {"Temp": T, "Salt": S, "h": h})
    m = build_model(ParamFile(text=f"""
NIGLOBAL = 16
NJGLOBAL = 8
NK = 3
DT = 600.0
DT_THERM = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 80.0
MAXIMUM_DEPTH = 500.0
F_0 = 1.0e-4
TOPO_CONFIG = flat
THICKNESS_CONFIG = uniform
TS_CONFIG = uniform
T_REF = 10.0
EQN_OF_STATE = LINEAR
INPUTDIR = {tmp_path}
SPONGE = True
SPONGE_CONFIG = RGC
RGC_SPONGE_FILE = rgc.nc
RGC_TNUDG = 0.1
LENSPONGE = 40.0
SPONGE_UV = True
VELOCITY_CONFIG = uniform
INITIAL_U_CONST = 0.2
INITIAL_V_CONST = 0.0
"""))
    sd = m.ocean_cfg.sponge_data
    assert sd is not None and sd.get("uv")
    idamp = np.asarray(m.domain.interior(sd["idamp"]))
    assert idamp[:, :10].max() == 0.0            # no damping west
    assert idamp[:, -1].min() > 0.0              # full strip east
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(6):
        s, a, tr = step(s, a, tr, n=k)
    T1 = np.asarray(m.domain.interior(s.T[0]))
    u1 = np.asarray(m.domain.interior(s.u[0]))
    # sponge pulls T toward 12 in the east strip, leaves west alone
    assert T1[4, -1] > 10.5
    assert abs(T1[4, 2] - 10.0) < 0.2
    # velocities damped in the strip relative to the west
    assert abs(u1[4, -2]) < abs(u1[4, 2])


def test_controlled_forcing_controller():
    """Integral controller: persistent warm SST anomaly drives the
    corrective heat flux negative; smoothing conserves its area
    integral (apply_ctrl_forcing, MOM_controlled_forcing.F90:96)."""
    from mom6_tpu.drivers.controlled_forcing import (
        CtrlForcingCfg, apply_ctrl_forcing, init_ctrl_state)
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    d = Domain(ni=16, nj=16, halo=4)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       max_depth=1000.0)
    cfg = CtrlForcingCfg(heat_int_rate=1.0 / 86400.0,
                         prec_int_rate=1.0 / 86400.0,
                         smooth_len=20.0e3, lam_heat=25.0,
                         lam_prec=1.0e-4)
    ctrl = init_ctrl_state(g.mask2dT.shape)
    # warm blob anomaly in the center
    x = jnp.arange(g.mask2dT.shape[-1]) - g.mask2dT.shape[-1] / 2
    y = jnp.arange(g.mask2dT.shape[-2]) - g.mask2dT.shape[-2] / 2
    sst_anom = 2.0 * jnp.exp(-(x[None] ** 2 + y[:, None] ** 2) / 18.0)
    sss_anom = jnp.zeros_like(sst_anom)
    sss_mean = jnp.full_like(sst_anom, 35.0)
    for _ in range(10):
        ctrl, vh, vp = apply_ctrl_forcing(cfg, g, ctrl, sst_anom,
                                          sss_anom, sss_mean, 3600.0)
    vh_i = np.asarray(d.interior(vh))
    assert vh_i.min() < -1.0                     # cooling the blob
    assert abs(vh_i).max() == abs(vh_i[8, 8])    # centered response
    assert np.asarray(d.interior(vp)).max() == 0.0
    assert np.all(np.isfinite(vh_i))
