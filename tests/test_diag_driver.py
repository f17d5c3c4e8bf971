"""diag_table-driven diagnostics through the solo driver
(MOM_diag_mediator / MOM_diag_remap wiring, VERDICT round-1 item 8):
a case run emits time-averaged NetCDF diagnostics incl. z-remapped
fields, and DIAG_AS_CHKSUM produces the chksum_diag text oracle."""

import os

import numpy as np
import pytest

MOM_INPUT = """\
SPLIT = True
ENABLE_THERMODYNAMICS = True
DT = 1200.0
DT_THERM = 1200.0
DAYMAX = 0.027777777777
ENERGYSAVEDAYS = 0.013888888888
NIGLOBAL = 8
NJGLOBAL = 8
NK = 3
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 80.0
LENLON = 80.0
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 300.0
F_0 = 1.0E-04
THICKNESS_CONFIG = "uniform"
TS_CONFIG = "linear"
T_REF = 10.0
T_RANGE = 2.0
S_REF = 35.0
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = "Z*"
EQN_OF_STATE = "LINEAR"
WIND_CONFIG = "zero"
BUOY_CONFIG = "zero"
"""

DIAG_TABLE = """\
"diag driver test"
1 1 1 0 0 0
"prog", 1, "days", 1, "days", "time"
"ocean_model", "temp",   "temp",   "prog", "all", "mean"
"ocean_model", "SSH",    "SSH",    "prog", "all", "none"
"ocean_model", "temp_z", "temp_z", "prog", "all", "mean"
"ocean_model", "u_z",    "u_z",    "prog", "all", "mean"
"""


def _write_case(tmp_path, extra="", diag_table=DIAG_TABLE):
    case = tmp_path / "case"
    case.mkdir()
    (case / "MOM_input").write_text(MOM_INPUT + extra)
    if diag_table is not None:
        (case / "diag_table").write_text(diag_table)
    return str(case)


def _run(case):
    from mom6_tpu.drivers.solo import main
    main([case, "--cpu"])


def test_solo_driver_emits_diag_file(tmp_path):
    case = _write_case(tmp_path)
    _run(case)
    from scipy.io import netcdf_file
    with netcdf_file(os.path.join(case, "diags.nc"), "r") as nc:
        names = set(nc.variables)
        assert {"ocean_model_temp", "ocean_model_SSH",
                "ocean_model_temp_z", "ocean_model_u_z"} <= names
        t = np.array(nc.variables["ocean_model_temp"][:])
        tz = np.array(nc.variables["ocean_model_temp_z"][:])
        # time-averaged temperature stays near the linear IC profile
        assert t.shape == (1, 3, 8, 8)
        np.testing.assert_allclose(t[0].mean(axis=(1, 2)),
                                   [10.666667, 10.0, 9.333333],
                                   atol=1e-3)
        # flat bottom + Z* layers at rest: z-remap ≈ identity
        np.testing.assert_allclose(tz, t, atol=1e-2)
        # unrequested fields are absent (diag_table drives selection)
        assert "ocean_model_salt" not in names


def test_diag_as_chksum_writes_oracle(tmp_path):
    case = _write_case(
        tmp_path, extra='DIAG_AS_CHKSUM = True\n',
        diag_table='"chksum test"\n1 1 1 0 0 0\n')
    _run(case)
    path = os.path.join(case, "chksum_diag")
    assert os.path.exists(path)
    lines = open(path).read().strip().splitlines()
    # a bare diag_table in chksum mode checksums every registered
    # prognostic diagnostic at every stats interval
    assert any(ln.startswith("ocean_model.temp:") for ln in lines)
    assert any("bits=" in ln for ln in lines)
    assert len(lines) >= 8
