"""DEBUG checksum flood and PointAccel truncation dumps
(MOM debugging / MOM_PointAccel.F90 analogs in the solo driver)."""

import os

import numpy as np


def _case(tmp_path, extra):
    case = tmp_path / "case"
    case.mkdir()
    (case / "MOM_input").write_text("""
NIGLOBAL = 10
NJGLOBAL = 8
NK = 3
DT = 600.0
DAYMAX = 0.0208
ENERGYSAVEDAYS = 0.0104
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 100.0
LENLAT = 80.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 400.0
F_0 = 1.0e-4
REENTRANT_X = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
""" + extra)
    return str(case)


def test_debug_checksum_flood(tmp_path):
    from mom6_tpu.drivers.solo import main
    case = _case(tmp_path, "DEBUG = True\n")
    main([case, "--cpu"])
    text = open(os.path.join(case, "chksum_debug")).read()
    assert "= step 1" in text and "= step 3" in text
    assert "u" in text and "h" in text
    # every step block carries checksum hex + min/max stats
    assert text.count("= step") == 3


def test_point_accel_dump(tmp_path):
    from mom6_tpu.drivers.solo import main
    from mom6_tpu.diagnostics.point_accel import dump_worst_column
    # driver path: MAXVEL tiny so every step truncates
    case = _case(tmp_path, "U_TRUNC_FILE = U_velocity_truncations\n"
                 "MAXVEL = 1.0e-9\n")
    main([case, "--cpu"])
    path = os.path.join(case, "U_velocity_truncations")
    assert os.path.exists(path)
    text = open(path).read()
    assert "worst column" in text
    assert "u:" in text and "h:" in text
