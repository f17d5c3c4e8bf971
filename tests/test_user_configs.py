import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model
from mom6_tpu.user.configs import (topo_seamount, topo_dome2d,
                                   topo_dumbbell)


BASE = '''
SPLIT = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
DT = 1800.0
NIGLOBAL = 16
NJGLOBAL = 16
NK = 2
GINT = 0.02
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 320.0
LENLON = 320.0
MAXIMUM_DEPTH = 1000.0
KV = 1.0E-04
WIND_CONFIG = "zero"
'''


def test_seamount_topography():
    pf = ParamFile(text=BASE + 'TOPO_CONFIG = "seamount"\n'
                   'THICKNESS_CONFIG = "uniform"\n')
    m = build_model(pf)
    pf.close(fatal_unused=False)
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    # shallower in the center, full depth at the edge
    assert d[8, 8] < 600.0
    assert d[0, 0] > 950.0


def test_dome2d_ramp():
    """Shallow bay in the west, ramp, deep basin in the east
    (DOME2d_initialize_topography)."""
    ctx = dict(max_depth=1000.0, min_depth=0.0, lenlon=100.0,
               lenlat=100.0, west=0.0, south=0.0)
    lon = np.linspace(0, 100, 101)[None, :] * np.ones((3, 101))
    lat = np.zeros_like(lon)
    dep = topo_dome2d(lon, lat, ctx)
    assert dep[0, 0] == pytest.approx(200.0)    # 0.2*H bay shelf
    assert dep[0, -1] == 1000.0                 # deep basin at east
    assert np.all(np.diff(dep[0]) >= -1e-9)     # monotone ramp
    # ramp midpoint: x=0.4 → 200 + 800*(0.4-0.1)/0.6 = 600
    assert dep[0, 40] == pytest.approx(600.0)


def test_dumbbell_strait():
    """Land blocks beside the strait, reservoirs open
    (dumbbell_initialize_topography with DUMBBELL_LEN = domain)."""
    ctx = dict(max_depth=1000.0, min_depth=0.0, lenlon=100.0,
               lenlat=100.0, west=0.0, south=0.0, dumbbell_len=100.0)
    lon, lat = np.meshgrid(np.linspace(0, 100, 21),
                           np.linspace(0, 100, 21))
    dep = topo_dumbbell(lon, lat, ctx)
    # center strait open; mid-x off-axis blocked; reservoirs open
    assert dep[10, 10] == 1000.0
    assert dep[0, 10] == 0.0
    assert dep[20, 10] == 0.0
    assert dep[10, 0] == 1000.0
    assert dep[0, 0] == 1000.0


def test_phillips_balanced_state():
    """The Phillips initialization must be near geostrophic balance:
    stepping it briefly changes u only slightly."""
    pf = ParamFile(text=BASE.replace('NK = 2', 'NK = 2')
                   + 'REENTRANT_X = True\nF_0 = 1.0E-04\n'
                   'TOPO_CONFIG = "flat"\n'
                   'THICKNESS_CONFIG = "phillips"\n'
                   'PHILLIPS_SLOPE = 4.0E-04\nPHILLIPS_AMP = 0.0\n')
    m = build_model(pf)
    pf.close(fatal_unused=False)
    st, sp, tr = m.state, m.split_state, m.tracers
    u0 = np.asarray(m.domain.interior(st.u))
    assert np.abs(u0[0]).max() > 0.01        # the jet exists
    step = m.step_fn()
    for n in range(4):
        st, sp, tr = step(st, sp, tr, n)
    u1 = np.asarray(m.domain.interior(st.u))
    drift = np.abs(u1 - u0).max() / np.abs(u0).max()
    assert drift < 0.3, f"jet unbalanced: drift {drift}"


def test_sloshing_oscillates():
    pf = ParamFile(text=BASE + 'TOPO_CONFIG = "flat"\n'
                   'THICKNESS_CONFIG = "sloshing"\nSLOSHING_AMP = 20.0\n')
    m = build_model(pf)
    pf.close(fatal_unused=False)
    h0 = np.asarray(m.domain.interior(m.state.h))
    # interface tilted: layer-1 thickness varies in x
    assert h0[0].max() - h0[0].min() > 10.0
    st, sp, tr = m.state, m.split_state, m.tracers
    step = m.step_fn()
    for n in range(6):
        st, sp, tr = step(st, sp, tr, n)
    h1 = np.asarray(m.domain.interior(st.h))
    assert np.isfinite(h1).all()
    # mass conserved
    assert abs(h1.sum() - h0.sum()) / h0.sum() < 1e-12


def test_mercator_grid_isotropic():
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import mercator_grid
    d = Domain(ni=16, nj=16, halo=4)
    g = mercator_grid(d, west_lon=0.0, lenlon=20.0, south_lat=10.0)
    dx = np.asarray(d.interior(g.dxT))
    dy = np.asarray(d.interior(g.dyT))
    # Mercator isotropy: dx ≈ dy everywhere
    np.testing.assert_allclose(dx, dy, rtol=0.02)
    # spacing shrinks poleward
    assert dx[-1, 0] < dx[0, 0]
    lat = np.asarray(d.interior(g.geoLatT))
    assert 9.0 < lat.min() < 12.0 and lat.max() > 20.0
