"""Solo-driver restart must carry the registered tracers.

The reference registers every tracer in the restart files
(register_tracer / MOM_restart); the solo driver here previously
saved only state+split, silently resetting ideal-age/dye/BGC fields
on restart.  A split run (N/2 steps, restart, N/2 steps) must end
bitwise identical to an uninterrupted N-step run — including the
tracers (test.restart of .testing/Makefile).
"""

import os

import numpy as np

from mom6_tpu.drivers import solo


CFG = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 4
DT = 1800.0
DT_THERM = 1800.0
DAYMAX = 0.125
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 600.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 6.0
EQN_OF_STATE = LINEAR
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
BUOY_CONFIG = zero
USE_IDEAL_AGE_TRACER = True
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
USE_KPP = True
KD = 1.0e-5
MIXEDLAYER_RESTRAT = True
ENERGYSAVEDAYS = 1.0
"""
# USE_KPP + MIXEDLAYER_RESTRAT make the cross-step MLD carry
# load-bearing: without carry_mld in the restart, the restarted leg's
# first MLE step would see mld=None and diverge from the
# uninterrupted run — the bitwise assertion below proves the carries
# restore


def _case(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    (d / "MOM_input").write_text(CFG)
    return str(d)


def _age(case):
    import glob
    import jax.numpy  # noqa: F401
    from mom6_tpu.framework.restart import restore_restart
    # read the tracers straight from the final restart file
    path = os.path.join(case, "RESTART", "MOM.res")
    import json
    manifest = json.load(open(path + ".json"))
    assert "tracers" in manifest["trees"], \
        "solo restart is missing the tracers tree"
    data = np.load(path + ".npz")
    keys = manifest["trees"]["tracers"]["keys"]
    return np.stack([np.asarray(data[k]) for k in keys])


def test_solo_restart_carries_tracers(tmp_path):
    full = _case(tmp_path, "full")
    solo.main([full, "--days", "0.125"])
    a_full = _age(full)
    assert np.abs(a_full).max() > 0.0        # age actually advanced

    part = _case(tmp_path, "part")
    solo.main([part, "--days", "0.0625"])
    a_mid = _age(part)
    # --days is the TOTAL run length; the restarted leg continues
    # from t=0.0625 to 0.125
    solo.main([part, "--days", "0.125",
               "--restart-from",
               os.path.join(part, "RESTART", "MOM.res")])
    a_part = _age(part)
    assert np.abs(a_part - a_mid).max() > 0.0   # second leg ran
    np.testing.assert_array_equal(a_part, a_full)
