"""Time-varying file forcing and data_override.

Covers the FMS time_interp_external analog
(mom6_tpu/framework/interp_external.py), WIND_CONFIG/BUOY_CONFIG='file'
(MOM_surface_forcing.F90:677,860 re-designs), and the data_table
data_override path — all evaluated inside the jitted step with a
traced time scalar (no recompilation as time advances).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.framework.io import write_fields
from mom6_tpu.framework.interp_external import (ExternalField,
                                                load_external_field)
from mom6_tpu.model import build_model

NI, NJ = 12, 10

BASE = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 3
DT = 600.0
DT_FORCING = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 4.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
"""


def _write_wind(path, nt=3, ongrid=True):
    """C-grid (ongrid) or A-grid (own lon/lat) wind file; taux level k
    is the constant 0.1*k Pa."""
    t = np.arange(nt, dtype=np.float64)       # days
    if ongrid:
        tx = np.stack([np.full((NJ, NI), 0.1 * k) for k in range(nt)])
        ty = np.zeros((nt, NJ, NI))
        write_fields(path, {"time": t, "STRESS_X": tx, "STRESS_Y": ty},
                     dims={"time": ("time",),
                           "STRESS_X": ("time", "yh", "xh"),
                           "STRESS_Y": ("time", "yh", "xh")},
                     attrs={"time": {"units": "days since 0001-01-01"}})
    else:
        lon = np.linspace(-10.0, 10.0, 7)
        lat = np.linspace(-10.0, 10.0, 5)
        tx = np.stack([np.full((5, 7), 0.1 * k) for k in range(nt)])
        ty = np.zeros((nt, 5, 7))
        write_fields(path, {"time": t, "lon": lon, "lat": lat,
                            "STRESS_X": tx, "STRESS_Y": ty},
                     dims={"time": ("time",), "lon": ("lon",),
                           "lat": ("lat",),
                           "STRESS_X": ("time", "lat", "lon"),
                           "STRESS_Y": ("time", "lat", "lon")},
                     attrs={"time": {"units": "days since 0001-01-01"}})


def test_external_field_linear_interp(tmp_path):
    p = str(tmp_path / "wind.nc")
    _write_wind(p)
    ef = load_external_field(p, "STRESS_X")
    # halfway between level 0 (0.0) and level 1 (0.1)
    v = np.asarray(ef.at(jnp.asarray(43200.0)))
    assert np.allclose(v, 0.05)
    # clamped outside the axis
    assert np.allclose(np.asarray(ef.at(jnp.asarray(-1e6))), 0.0)
    assert np.allclose(np.asarray(ef.at(jnp.asarray(1e9))), 0.2)
    # interp works under jit with a traced scalar
    f = jax.jit(lambda t: ef.at(t))
    assert np.allclose(np.asarray(f(jnp.asarray(21600.0))), 0.025)


def test_external_field_periodic(tmp_path):
    p = str(tmp_path / "clim.nc")
    t = np.arange(4, dtype=np.float64)
    data = np.stack([np.full((NJ, NI), float(k)) for k in range(4)])
    write_fields(p, {"time": t, "q": data},
                 dims={"time": ("time",), "q": ("time", "yh", "xh")},
                 attrs={"time": {"units": "days since 0001-01-01",
                                 "modulo": 4.0}})
    ef = load_external_field(p, "q")
    assert ef.period == 4.0 * 86400.0
    # t = 3.5 days: halfway from level 3 back to level 0 (wrap)
    v = np.asarray(ef.at(jnp.asarray(3.5 * 86400.0)))
    assert np.allclose(v, 1.5)
    # one full period later: identical
    v2 = np.asarray(ef.at(jnp.asarray(7.5 * 86400.0)))
    assert np.allclose(v2, 1.5)


@pytest.mark.parametrize("ongrid", [True, False])
def test_wind_from_file_drives_model(tmp_path, ongrid):
    case = tmp_path
    _write_wind(str(case / "wind.nc"), ongrid=ongrid)
    (case / "MOM_input").write_text(
        BASE + "WIND_CONFIG = file\n"
        "WIND_FILE = wind.nc\n"
        f"INPUTDIR = {case}\n"
        + ("" if ongrid else "WIND_STAGGER = A\n"))
    m = build_model(ParamFile(str(case / "MOM_input")))
    assert m.forces_fn is not None
    # stress at day 1.5 is 0.15 Pa on wet u-faces
    fc = m.forces_fn(jnp.asarray(1.5 * 86400.0))
    tx = np.asarray(m.domain.interior(fc.taux * m.grid.mask2dCu))
    wet = np.asarray(m.domain.interior(m.grid.mask2dCu)) > 0
    assert np.allclose(tx[wet], 0.15, atol=1e-12)
    # and the model integrates: eastward wind accelerates u
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    assert float(jnp.max(s.u)) > 0.0
    assert np.isfinite(float(jnp.sum(s.h)))


def test_buoy_from_file(tmp_path):
    case = tmp_path
    t = np.arange(2, dtype=np.float64)
    sw = np.stack([np.full((NJ, NI), 100.0 * (k + 1)) for k in range(2)])
    write_fields(str(case / "sw.nc"), {"time": t, "SW": sw},
                 dims={"time": ("time",), "SW": ("time", "yh", "xh")},
                 attrs={"time": {"units": "days since 0001-01-01"}})
    (case / "MOM_input").write_text(
        BASE + "BUOY_CONFIG = file\n"
        "SHORTWAVE_FILE = sw.nc\n"
        "SHORTWAVE_VAR = SW\n"
        f"INPUTDIR = {case}\n")
    m = build_model(ParamFile(str(case / "MOM_input")))
    assert m.fluxes_fn is not None
    fl = m.fluxes_fn(m.state, jnp.asarray(0.5 * 86400.0))
    assert np.allclose(
        np.asarray(m.domain.interior(fl.sw))[
            np.asarray(m.domain.interior(m.grid.mask2dT)) > 0], 150.0)
    # heats the ocean through applyBoundaryFluxesInOut
    step = m.step_fn()
    T0 = float(jnp.sum(m.domain.interior(m.state.T * m.state.h)))
    s, a, tr = step(m.state, m.split_state, m.tracers, n=0)
    T1 = float(jnp.sum(m.domain.interior(s.T * s.h)))
    assert T1 > T0


def test_data_override_constant_and_file(tmp_path):
    case = tmp_path
    _write_wind(str(case / "wind.nc"))
    (case / "MOM_input").write_text(
        BASE + "BUOY_CONFIG = const_heat\n"
        "SENSIBLE_HEAT_FLUX = 10.0\n"
        f"INPUTDIR = {case}\n")
    (case / "data_table").write_text(
        '"OCN", "taux", "STRESS_X", "wind.nc", .true., 1.0\n'
        '"OCN", "sw",   "",         "",        .false., 50.0\n')
    m = build_model(ParamFile(str(case / "MOM_input")))
    assert m.data_override is not None
    assert set(m.data_override.fields) == {"taux", "sw"}
    # override applies inside the step: taux follows the file in time
    fc = m.data_override.mech(m.forces, jnp.asarray(86400.0), m.grid)
    tx = np.asarray(m.domain.interior(fc.taux))
    wet = np.asarray(m.domain.interior(m.grid.mask2dCu)) > 0
    assert np.allclose(tx[wet], 0.1)
    fl = m.data_override.fluxes(None, jnp.asarray(0.0), m.grid)
    assert np.allclose(np.asarray(m.domain.interior(fl.sw))[
        np.asarray(m.domain.interior(m.grid.mask2dT)) > 0], 50.0)
    # full step with both overrides active
    s, a, tr = m.step_fn()(m.state, m.split_state, m.tracers, n=0)
    assert np.isfinite(float(jnp.sum(s.h)))


def test_time_advance_does_not_recompile(tmp_path):
    case = tmp_path
    _write_wind(str(case / "wind.nc"))
    (case / "MOM_input").write_text(
        BASE + "WIND_CONFIG = file\nWIND_FILE = wind.nc\n"
        f"INPUTDIR = {case}\n")
    m = build_model(ParamFile(str(case / "MOM_input")))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    # steps 0 and 2 share the x_first=True compiled fn; a retrace on
    # time advance would show up as a second compile of that variant
    with jax.log_compiles(False):
        s, a, tr = step(s, a, tr, n=0)
        s, a, tr = step(s, a, tr, n=1)
        u2 = s.u
        s, a, tr = step(s, a, tr, n=2)
    assert np.isfinite(float(jnp.sum(s.u)))
