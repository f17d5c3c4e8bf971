"""Tracer flow-control packages: boundary impulse, oil point source,
advection-test shapes, OCMIP2 CFCs, and the NPZD BGC package, all
selected from MOM_input and exercised through full model steps
(MOM_tracer_flow_control.F90 parity)."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 4
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 8.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
WIND_CONFIG = gyres
"""


def _run(text, n=3):
    m = build_model(ParamFile(text=BASE + text))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(n):
        s, a, tr = step(s, a, tr, n=k)
    return m, s, tr


def test_boundary_impulse_window():
    # window longer than the run: surface stays 1
    m, s, tr = _run("USE_BOUNDARY_IMPULSE_TRACER = True\n"
                    "IMPULSE_SOURCE_TIME = 1.0e6\n")
    d = m.domain
    bir = np.asarray(d.interior(tr["boundary_impulse"]))
    np.testing.assert_allclose(bir[0], 1.0, atol=1e-12)
    # window shorter than one step: source closes, surface mixes down
    m, s, tr = _run("USE_BOUNDARY_IMPULSE_TRACER = True\n"
                    "IMPULSE_SOURCE_TIME = 1.0\n", n=4)
    bir = np.asarray(m.domain.interior(tr["boundary_impulse"]))
    assert np.max(bir[0]) <= 1.0 + 1e-12
    assert np.max(bir[0]) < 1.0 - 1e-8 or np.max(bir[1:]) > 0.0


def test_oil_source_injects_exact_mass():
    rate = 2.5                      # kg/s
    m, s, tr = _run("USE_OIL_TRACER = True\n"
                    "OIL_SOURCE_LONGITUDE = 60.0\n"
                    "OIL_SOURCE_LATITUDE = 60.0\n"
                    "OIL_SOURCE_RATE = 2.5\n"
                    "OIL_SOURCE_LAYER = 1\n", n=4)
    d = m.domain
    area = d.interior(m.grid.areaT)
    mass = float(jnp.sum(d.interior(tr["oil1"] * s.h).sum(0) * area))
    expect = rate * 4 * m.dt
    assert abs(mass - expect) / expect < 1e-6
    # with decay the inventory is strictly smaller
    m2, s2, tr2 = _run("USE_OIL_TRACER = True\n"
                       "OIL_SOURCE_LONGITUDE = 60.0\n"
                       "OIL_SOURCE_LATITUDE = 60.0\n"
                       "OIL_SOURCE_RATE = 2.5\n"
                       "OIL_DECAY_DAYS = 0.01\n", n=4)
    d2 = m2.domain
    mass2 = float(jnp.sum(d2.interior(tr2["oil1"] * s2.h).sum(0)
                          * d2.interior(m2.grid.areaT)))
    assert mass2 < mass


def test_advection_test_shapes():
    m, s, tr = _run("USE_ADVECTION_TEST_TRACER = True\n"
                    "ADVECTION_TEST_X_ORIGIN = 60.0\n"
                    "ADVECTION_TEST_Y_ORIGIN = 60.0\n"
                    "ADVECTION_TEST_X_WIDTH = 30.0\n"
                    "ADVECTION_TEST_Y_WIDTH = 30.0\n", n=2)
    d = m.domain
    cyl = np.asarray(d.interior(tr["tr_cyl"]))
    bell = np.asarray(d.interior(tr["tr_bell"]))
    assert 0.0 < cyl.max() <= 1.0 + 1e-9
    assert 0.0 < bell.max() <= 1.0 + 1e-9
    assert bell.sum() < cyl.sum()          # bell is inscribed


def test_cfc_uptake_toward_saturation():
    m, s, tr = _run("USE_OCMIP2_CFC = True\n", n=4)
    d = m.domain
    for g in ("cfc11", "cfc12"):
        c = np.asarray(d.interior(tr[g]))
        assert c[0].max() > 0.0            # ocean took up CFC
        assert np.all(c >= -1e-18)
    # the uptake tends toward (does not overshoot) saturation
    from mom6_tpu.tracer.cfc import cfc_solubility
    T0 = np.asarray(d.interior(s.T[0]))
    csat = np.asarray(cfc_solubility("CFC11", jnp.asarray(T0),
                                     35.0 * jnp.ones_like(
                                         jnp.asarray(T0)))) \
        * 1e3 * 270.0e-12
    c11 = np.asarray(d.interior(tr["cfc11"][0]))
    assert np.all(c11 <= csat * (1.0 + 1e-6))


def test_npzd_runs_and_stays_positive():
    m, s, tr = _run("USE_NPZD = True\n", n=4)
    assert m.ocean_cfg.bgc is not None
    d = m.domain
    for nm in ("no3", "phyto", "zoo", "det"):
        f = np.asarray(d.interior(tr[nm]))
        assert np.all(f >= 0.0) and np.all(np.isfinite(f))
    # the ecosystem evolved away from its initial condition
    p = np.asarray(d.interior(tr["phyto"]))
    assert abs(p[0].max() - 0.1) > 1e-6


def test_tracer_z_init(tmp_path):
    """TRACER_Z_INIT_FILE overrides a registered tracer's IC from
    z-space climatology (MOM_tracer_Z_init.F90)."""
    from mom6_tpu.framework.io import write_fields
    nzf, nyf, nxf = 6, 8, 8
    lon = np.linspace(-30.0, 150.0, nxf)
    lat = np.linspace(-30.0, 150.0, nyf)
    depth = np.array([50.0, 150.0, 300.0, 500.0, 700.0, 900.0])
    # age increases linearly with depth, uniform horizontally
    age = np.broadcast_to((depth / 100.0)[:, None, None],
                          (nzf, nyf, nxf)).copy()
    path = tmp_path / "tr_z.nc"
    write_fields(str(path), {"age": age, "lon": lon, "lat": lat,
                             "depth": depth},
                 dims={"age": ("depth", "lat", "lon"),
                       "lon": ("lon",), "lat": ("lat",),
                       "depth": ("depth",)})
    m = build_model(ParamFile(text=BASE + (
        "USE_IDEAL_AGE_TRACER = True\n"
        f"INPUTDIR = {tmp_path}\n"
        "TRACER_Z_INIT_FILE = tr_z.nc\n")))
    d = m.domain
    a0 = np.asarray(d.interior(m.tracers["age"]))
    # increases with depth, spanning the file range
    col = a0[:, 4, 4]
    assert np.all(np.diff(col) > 0.0)
    assert col[0] > 0.0 and col[-1] <= 9.0 + 1e-9
