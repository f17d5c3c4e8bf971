"""PHASED_JIT: the two-executable thermo step (dynamics, then
tracer+thermo/ALE) must reproduce the fused single-executable step —
it exists purely as an HBM-peak lever for production grid sizes."""

import numpy as np
import jax

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

CFG = """
NIGLOBAL = 24
NJGLOBAL = 24
NK = 3
DT = 600.0
DT_THERM = 1200.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 240.0
LENLAT = 240.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 8.0
EQN_OF_STATE = WRIGHT
BULKMIXEDLAYER = False
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
KD = 1.0e-5
USE_KPP = True
KHTH = 600.0
KHTR = 600.0
MIXEDLAYER_RESTRAT = True
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
BUOY_CONFIG = linear_restoring
RESTOREBUOY = True
FLUXCONST = 0.5
USE_IDEAL_AGE_TRACER = True
BIHARMONIC = True
SMAGORINSKY_AH = True
SMAG_BI_CONST = 0.06
"""


def _run(phased, nsteps=5):
    pf = ParamFile(text=CFG + f"PHASED_JIT = {phased}\n")
    m = build_model(pf)
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for n in range(nsteps):
        s, a, tr = step(s, a, tr, n=n)
    return m, s, tr, step


def test_phased_matches_fused():
    m0, s0, tr0, st0 = _run(False)
    m1, s1, tr1, st1 = _run(True)
    # not bitwise: XLA fuses differently across the executable
    # boundaries (FMA contraction), and KPP's sharp nonlinearities
    # amplify those ULPs over the 5 steps — 1e-9 is still ~1e6 x
    # tighter than any physical signal here
    for f in ("h", "u", "v", "T", "S"):
        a = np.asarray(m0.domain.interior(getattr(s0, f)))
        b = np.asarray(m1.domain.interior(getattr(s1, f)))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b / scale, a / scale, rtol=0,
                                   atol=1e-9, err_msg=f)
    a = np.asarray(m0.domain.interior(tr0["age"]))
    b = np.asarray(m1.domain.interior(tr1["age"]))
    np.testing.assert_allclose(b, a, atol=1e-9)
    assert st0.truncations() == st1.truncations()
    # the offline-forcing fields survive the phase split
    off0, off1 = st0.offline_fields(), st1.offline_fields()
    assert off0 is not None and off1 is not None
    for x, y in zip(off0, off1):
        np.testing.assert_allclose(np.asarray(m0.domain.interior(y)),
                                   np.asarray(m0.domain.interior(x)),
                                   atol=1e-10)
