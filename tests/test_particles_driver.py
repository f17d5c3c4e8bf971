"""Lagrangian particles wired through the solo driver
(MOM.F90:1357 USE_PARTICLES): a wind-driven case advects a seeded
particle grid and writes trajectories to particles.nc."""

import os

import numpy as np

MOM_INPUT = """\
SPLIT = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
DT = 1200.0
DAYMAX = 0.027777777777
ENERGYSAVEDAYS = 0.013888888888
NIGLOBAL = 12
NJGLOBAL = 12
NK = 2
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 120.0
LENLON = 120.0
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 400.0
F_0 = 1.0E-04
THICKNESS_CONFIG = "uniform"
REENTRANT_X = True
WIND_CONFIG = "gyres"
TAUX_MAGNITUDE = 0.2
USE_PARTICLES = True
PARTICLES_NX = 4
PARTICLES_NY = 4
"""


def test_particles_trajectories(tmp_path):
    case = tmp_path / "case"
    case.mkdir()
    (case / "MOM_input").write_text(MOM_INPUT)
    from mom6_tpu.drivers.solo import main
    main([str(case), "--cpu"])
    path = os.path.join(str(case), "particles.nc")
    assert os.path.exists(path)
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as nc:
        px = np.array(nc.variables["part_x"][:])
        py = np.array(nc.variables["part_y"][:])
    assert px.shape[1] == 16
    assert np.all(np.isfinite(px)) and np.all(np.isfinite(py))
    # the wind spun up a flow, so particles moved between records
    assert np.max(np.abs(px[-1] - px[0]) + np.abs(py[-1] - py[0])) > 1e-6
    # positions stay inside the (periodic-x, clamped-y) domain
    assert np.all((py >= 0.0) & (py <= 12.0))
