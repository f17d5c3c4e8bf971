"""Kitchen-sink composition test: nearly every subsystem enabled in
one model, to catch cross-feature interaction bugs that per-feature
tests cannot.  Checks conservation and finiteness over several steps
with DT_THERM > DT."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

CONFIG = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 6
DT = 600.0
DT_THERM = 1200.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 320.0
LENLAT = 320.0
TOPO_CONFIG = bowl
MINIMUM_DEPTH = 200.0
MAXIMUM_DEPTH = 2000.0
F_0 = 8.0e-5
BETA = 1.0e-11
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 10.0
S_RANGE = 1.0
EQN_OF_STATE = WRIGHT
BULKMIXEDLAYER = False
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
BUOY_CONFIG = linear_restoring
RESTOREBUOY = True
FLUXCONST = 0.5
SST_NORTH = 18.0
SST_SOUTH = 6.0

USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
REMAPPING_SCHEME = PQM_IH6IH5
REGRID_TIME_SCALE = 7200.0
REGRID_FILTER_SHALLOW_DEPTH = 100.0
REGRID_FILTER_DEEP_DEPTH = 600.0

KD = 1.0e-5
USE_KPP = True
USE_JACKSON_PARAM = True
INT_TIDE_DISSIPATION = True
INT_TIDE_PROFILE = POLZIN_09
INTERNAL_TIDES = True
INTERNAL_TIDE_ANGLES = 8
INTERNAL_TIDE_MODES = 2
ENERGY_FRACTION_PER_MODE = 0.8, 0.2
INT_TIDE_FROUDE_DRAG = True
UTIDE = 0.05
GEOTHERMAL_FLUX = 0.05
PEN_SW_NBANDS = 2
FRAZIL = True

KHTH = 200.0
USE_MEKE = True
MEKE_GMCOEFF = 1.0
MEKE_KHTH_FAC = 0.5
MEKE_ALPHA_DEFORM = 1.0
MEKE_ALPHA_GRID = 1.0
MEKE_ADVECTION_FACTOR = 1.0
USE_VARIABLE_MIXING = True
RESOLN_SCALED_KHTH = True
RESOLN_SCALED_KH = True
KHTH_SLOPE_CFF = 0.02
MIXEDLAYER_RESTRAT = True
LAPLACIAN = True
KH = 100.0
SMAGORINSKY_KH = True
SMAG_LAP_CONST = 0.15
DYNAMIC_VISCOUS_ML = True

KHTR = 200.0
USE_HORIZONTAL_BOUNDARY_DIFFUSION = True
HBD_KHTR = 300.0
USE_IDEAL_AGE_TRACER = True
USE_REGIONAL_DYES = True
DYE_SOURCE_MAXLON = 160.0
USE_BOUNDARY_IMPULSE_TRACER = True
USE_OCMIP2_CFC = True
USE_NPZD = True

TIDES = True
TIDE_M2 = True
SAL_SCALAR_APPROX = True
DO_SPPT = True
SPPT_AMPLITUDE = 0.05
"""


def test_kitchen_sink_composition():
    m = build_model(ParamFile(text=CONFIG))
    cfg = m.ocean_cfg
    assert cfg.int_tides is not None and cfg.int_tides.n_mode == 2
    assert cfg.use_meke and cfg.use_varmix and cfg.use_mle
    assert cfg.use_hbd and cfg.resoln_scaled_kh
    d = m.domain
    area = d.interior(m.grid.areaT)
    mass0 = float(jnp.sum(d.interior(m.state.h).sum(0) * area))
    salt0 = float(jnp.sum(d.interior(m.state.S * m.state.h).sum(0)
                          * area))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(6):
        s, a, tr = step(s, a, tr, n=k)
    mass1 = float(jnp.sum(d.interior(s.h).sum(0) * area))
    salt1 = float(jnp.sum(d.interior(s.S * s.h).sum(0) * area))
    assert abs(mass1 - mass0) / mass0 < 1e-12
    assert abs(salt1 - salt0) / salt0 < 1e-10
    for f in (s.u, s.v, s.h, s.T, s.S, s.meke):
        assert np.all(np.isfinite(np.asarray(d.interior(f))))
    for name, f in tr.items():
        assert np.all(np.isfinite(np.asarray(d.interior(f)))), name
    # the dye stayed in [0, 1+eps] through every composed process
    dye = np.asarray(d.interior(tr["dye1"]))
    assert dye.min() > -1e-9 and dye.max() < 1.0 + 1e-6
