"""Time-dependent user OBC updates (MOM_boundary_update registry):
Kelvin wave and tidal-bay updaters refresh the OpenBoundaries pytree
inside the jitted step from the traced model time."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 16
NJGLOBAL = 12
NK = 2
DT = 300.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 100.0
F_0 = 1.0e-4
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=0,J=N:S,FLATHER"
"""


def test_kelvin_update_oscillates():
    m = build_model(ParamFile(text=BASE + """
OBC_USER_CONFIG = Kelvin
KELVIN_WAVE_SSH_AMP = 0.5
KELVIN_WAVE_PERIOD = 7200.0
"""))
    assert m.obc_update_fn is not None
    # direct probe: boundary SSH at t=0 is the full decaying profile,
    # at a quarter period it vanishes
    ob0 = m.obc_update_fn(m.obc, m.grid, m.state.h, jnp.asarray(0.0))
    obq = m.obc_update_fn(m.obc, m.grid, m.state.h,
                          jnp.asarray(1800.0))
    H = m.domain.halo
    ssh0 = np.asarray(ob0.ssh_w)[:, H]
    sshq = np.asarray(obq.ssh_w)[:, H]
    assert abs(ssh0[H]) > 0.4                 # coast amplitude ~amp
    assert abs(sshq[H]) < 1e-8                # cos(pi/2) = 0
    # offshore decay along the coast-normal coordinate
    assert abs(ssh0[H + 8]) < abs(ssh0[H + 1])
    # model integrates with the time-dependent boundary and the
    # interior responds
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(6):
        s, a, tr = step(s, a, tr, n=k)
    assert np.isfinite(float(jnp.sum(s.u)))
    assert float(jnp.max(jnp.abs(s.u))) > 1e-8


def test_tidal_bay_update_alternates_flow():
    m = build_model(ParamFile(text=BASE + """
OBC_USER_CONFIG = tidal_bay
TIDAL_BAY_FLOW = 1.0e5
TIDAL_BAY_PERIOD = 3600.0
"""))
    fn = m.obc_update_fn
    ob_q = fn(m.obc, m.grid, m.state.h, jnp.asarray(900.0))   # peak
    ob_3q = fn(m.obc, m.grid, m.state.h, jnp.asarray(2700.0))
    u_q = float(ob_q.u_w)
    u_3q = float(ob_3q.u_w)
    assert u_q < 0.0 and u_3q > 0.0           # reversing flow
    np.testing.assert_allclose(u_q, -u_3q, rtol=1e-9)
    # magnitude = flux / open area (12 rows x 10 km x 100 m)
    area = 12 * 10000.0 * 100.0
    np.testing.assert_allclose(abs(u_q), 1.0e5 / area, rtol=1e-6)


def test_unknown_user_config_raises():
    with pytest.raises(ValueError, match="OBC_USER_CONFIG"):
        build_model(ParamFile(text=BASE + "OBC_USER_CONFIG = warp\n"))
