"""Offline tracer mode through the solo driver.

The online run records its per-thermo-interval transports and
end-of-interval thicknesses (WRITE_OFFLINE_FIELDS →
off_sum.nc/off_snap.nc, the OFF_SUM/OFF_SNAP pair of
MOM_offline_main.F90:1369-1371); a second run with
OFFLINE_TRACER_MODE=True (MOM.F90:2267) re-advects the tracers from
those stored fields without the dynamics.  With identical transports
and the same advection core, the offline dye must match the online
dye to round-off, and total dye content is conserved exactly.
"""

import os

import numpy as np
import pytest

MOM_INPUT = """\
SPLIT = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
DT = 1200.0
DT_THERM = 2400.0
DAYMAX = 0.11111111111
ENERGYSAVEDAYS = 0.055555
NIGLOBAL = 10
NJGLOBAL = 10
NK = 3
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 100.0
LENLON = 100.0
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 300.0
F_0 = 1.0E-04
REENTRANT_X = True
THICKNESS_CONFIG = "uniform"
WIND_CONFIG = "gyres"
TAUX_MAGNITUDE = 0.2
USE_REGIONAL_DYES = True
"""


def _run(case, extra):
    from mom6_tpu.drivers.solo import main
    path = os.path.join(case, "MOM_input")
    with open(path, "w") as f:
        f.write(MOM_INPUT + extra)
    main([case, "--cpu"])


def test_offline_reproduces_online_dye(tmp_path):
    import jax.numpy as jnp
    from mom6_tpu.framework.restart import restore_restart
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    case = str(tmp_path / "case")
    os.makedirs(case)
    # 1) online run, recording the offline fields
    _run(case, "WRITE_OFFLINE_FIELDS = True\n")
    assert os.path.exists(os.path.join(case, "off_sum.nc"))
    assert os.path.exists(os.path.join(case, "off_snap.nc"))
    from mom6_tpu.framework.io import read_field
    nt = read_field(os.path.join(case, "off_sum.nc"), "uhtr").shape[0]
    assert nt == 4                       # 8 dyn steps / 2 per thermo

    # online final tracer state for comparison
    m = build_model(ParamFile(os.path.join(case, "MOM_input")))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(8):
        s, a, tr = step(s, a, tr, n=k)
    dye_online = np.asarray(m.domain.interior(tr["dye1"]))
    h_online = np.asarray(m.domain.interior(s.h))

    # 2) offline run from the recorded fields
    case2 = str(tmp_path / "case2")
    os.makedirs(case2)
    _run(case2, "OFFLINE_TRACER_MODE = True\n"
         f"OFFLINEDIR = {case}\n"
         "DT_OFFLINE = 2400.0\n")
    stats = open(os.path.join(case2, "ocean.stats")).read()
    assert "total[dye1]" in stats

    m2 = build_model(ParamFile(os.path.join(case2, "MOM_input")))
    trees, meta = restore_restart(
        os.path.join(case2, "RESTART", "MOM.res"),
        {"tracers": m2.tracers})
    dye_off_i = np.asarray(m2.domain.interior(
        trees["tracers"]["dye1"]))

    # same transports + same advection core: offline == online
    np.testing.assert_allclose(dye_off_i, dye_online, atol=1e-10)

    # conservation: total dye volume unchanged from the IC
    area = np.asarray(m2.domain.interior(m2.grid.areaT))
    m0 = build_model(ParamFile(os.path.join(case, "MOM_input")))
    dye0 = np.asarray(m0.domain.interior(m0.tracers["dye1"]))
    h0 = np.asarray(m0.domain.interior(m0.state.h))
    tot0 = float((dye0 * h0 * area).sum())
    tot1 = float((dye_off_i * h_online * area).sum())
    np.testing.assert_allclose(tot1, tot0, rtol=1e-9)
