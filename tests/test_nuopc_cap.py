"""NUOPC/CMEPS-shaped cap (drivers/nuopc_cap.py): the
advertise/realize/advance/export lifecycle with the reference
mom_cap.F90 field dictionary."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.drivers.nuopc_cap import (MOM6Cap, IMPORT_FIELDS,
                                        EXPORT_FIELDS)

CONFIG = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 3
DT = 900.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 600.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 5.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
USE_KPP = True
"""


def test_cap_lifecycle():
    cap = MOM6Cap()
    adv = cap.advertise()
    assert "Foxx_taux" in adv["import"] and "So_t" in adv["export"]
    cap.realize(text=CONFIG)
    d = cap.model.domain
    shp = (d.njh, d.nih)
    cap.import_fields({
        "Foxx_taux": jnp.full(shp, 0.1) * cap.model.grid.mask2dCu,
        "Foxx_sen": jnp.full(shp, -50.0) * cap.model.grid.mask2dT,
        "Foxx_swnet_vdr": jnp.full(shp, 100.0) * cap.model.grid.mask2dT,
        "Foxx_swnet_vdf": jnp.full(shp, 50.0) * cap.model.grid.mask2dT,
    })
    cap.advance(1800.0)
    out = cap.export_fields()
    assert set(EXPORT_FIELDS) <= set(out)
    sst = np.asarray(d.interior(out["So_t"]))
    u = np.asarray(d.interior(out["So_u"]))
    assert np.all(np.isfinite(sst))
    assert np.max(np.abs(u)) > 0.0            # wind spun up a current
    # a second coupling interval with changed forcing
    cap.import_fields({"Foxx_taux": jnp.zeros(shp)})
    cap.advance(1800.0)
    out2 = cap.export_fields()
    assert not np.allclose(np.asarray(d.interior(out2["So_u"])), u)
    # slopes are finite and zero-mean over a periodic interior
    dhdx = np.asarray(d.interior(out2["So_dhdx"]))
    assert np.all(np.isfinite(dhdx))
