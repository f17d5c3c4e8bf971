"""Ice shelf ↔ ocean coupling and the shelf-only driver
(MOM_ice_shelf.F90 / ice_shelf_driver.F90 re-designs)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 16
NJGLOBAL = 10
NK = 3
DT = 600.0
DT_THERM = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 800.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_REF = 2.0
T_RANGE = 1.0
S_REF = 34.5
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
ICE_SHELF = True
ICE_PROFILE_CONFIG = channel
SHELF_MAX_THICKNESS = 400.0
SHELF_LENGTH_LON = 60.0
WIND_CONFIG = constant
TAUX_MAGNITUDE = 0.1
"""


def test_shelf_pressure_and_melt_coupling():
    m = build_model(ParamFile(text=BASE))
    assert m.ice_shelf is not None
    H = m.domain.halo
    hs = np.asarray(m.domain.interior(m.ice_shelf.h_shelf))
    assert hs[:, 0].max() > 350.0            # thick at the west wall
    assert np.all(hs[:, -1] == 0.0)          # open ocean to the east

    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    T0 = np.asarray(m.domain.interior(s.T[0]))
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.h)))
    T1 = np.asarray(m.domain.interior(s.T[0]))
    mask = hs > 1.0
    # basal melt cools the ocean under the shelf, open ocean far less
    dT_shelf = (T1 - T0)[mask].mean()
    dT_open = (T1 - T0)[~mask].mean()
    assert dT_shelf < dT_open - 1e-6
    # the free surface is depressed under the ice load
    eta = np.asarray(m.domain.interior(
        jnp.sum(s.h, axis=0))) - 800.0
    assert eta[mask].mean() < eta[~mask].mean()


def test_shelf_advection_conserves_volume():
    import jax
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.ice_shelf.shelf_main import (ShelfCfg, ShelfState,
                                               step_shelf,
                                               init_shelf_thickness)
    d = Domain(ni=16, nj=10, halo=4)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=100.0, f0=0.0,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 1000.0), max_depth=1000.0)
    cfg = ShelfCfg(dynamic=True)
    shelf = ShelfState(h_shelf=init_shelf_thickness(
        "channel", g, max_thick=300.0, lon_extent=80.0, halo=4))
    vol0 = float(jnp.sum(d.interior(shelf.h_shelf * g.areaT)))
    u = v = None
    for n in range(3):
        res = step_shelf(d, g, shelf, cfg, dt=43200.0, u0=u, v0=v)
        shelf, u, v = res.state, res.u, res.v
    # ice volume weights partial front cells by their area fraction
    # (shelf_advance_front partial cells carry h_ref over frac*A)
    vol1 = float(jnp.sum(d.interior(shelf.h_shelf * shelf.area_frac
                                    * g.areaT)))
    # closed walls, no melt: flux-form advection conserves ice volume
    np.testing.assert_allclose(vol1, vol0, rtol=1e-8)
    # the front spreads seaward under the driving stress
    assert float(jnp.max(jnp.abs(u))) > 0.0


def test_shelf_solo_driver(tmp_path):
    from mom6_tpu.drivers.shelf_solo import main
    case = tmp_path
    (case / "MOM_input").write_text("""
NIGLOBAL = 12
NJGLOBAL = 8
LENLON = 120.0
LENLAT = 80.0
DT_ICE_DYNAMICS = 43200.0
DAYMAX = 1.0
ICE_PROFILE_CONFIG = channel
SHELF_MAX_THICKNESS = 400.0
SHELF_LENGTH_LON = 60.0
""")
    main([str(case), "--cpu"])
    stats = open(case / "shelf.stats").read()
    assert "ice volume" in stats
    assert (case / "shelf_final.nc").exists()
    from mom6_tpu.framework.io import read_field
    th = read_field(str(case / "shelf_final.nc"), "thick")
    assert th.shape == (8, 12)
    assert np.all(np.isfinite(th))
