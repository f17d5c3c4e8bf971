"""GME backscatter (USE_GME, MOM_hor_visc.F90:1685): anti-viscous
stress at the barotropic strain returns energy to the resolved flow."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.param.lateral.hor_visc import (HorViscCfg,
                                             horizontal_viscosity)

NI, NJ, H = 16, 16, 4


def _setup(seed=0):
    d = Domain(ni=NI, nj=NJ, halo=H, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 2000.0), max_depth=2000.0)
    rng = np.random.default_rng(seed)
    shp = (3, d.njh, d.nih)
    u = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    v = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    h = jnp.full(shp, 2000.0 / 3)
    return d, g, u, v, h


def _work(d, g, u, v, h, res):
    """Domain-integrated u·F work [m5 s-3] (sign of the energy input)."""
    from mom6_tpu.parallel.stencil import ip1, jp1
    h_u = 0.5 * (h + ip1(h))
    h_v = 0.5 * (h + jp1(h))
    wu = jnp.sum(d.interior(u * res.diffu * h_u * g.areaCu))
    wv = jnp.sum(d.interior(v * res.diffv * h_v * g.areaCv))
    return float(wu + wv)


def test_gme_injects_energy():
    d, g, u, v, h = _setup()
    htot = jnp.sum(h, axis=0)
    u_bt = jnp.mean(u, axis=0)
    v_bt = jnp.mean(v, axis=0)
    base = HorViscCfg(laplacian=True, kh=10.0, dt=600.0)
    gme = HorViscCfg(laplacian=True, kh=10.0, dt=600.0, use_gme=True,
                     gme_kh=500.0, gme_h0=1000.0)
    r0 = horizontal_viscosity(g, u, v, h, base)
    r1 = horizontal_viscosity(g, u, v, h, gme, u_bt=u_bt, v_bt=v_bt,
                              htot=htot)
    w0 = _work(d, g, u, v, h, r0)
    w1 = _work(d, g, u, v, h, r1)
    assert w0 < 0.0                       # plain viscosity dissipates
    assert w1 > w0                        # GME returns energy
    assert np.all(np.isfinite(np.asarray(r1.diffu)))


def test_gme_limiter_caps_coefficient():
    d, g, u, v, h = _setup(seed=3)
    htot = jnp.sum(h, axis=0)
    u_bt = jnp.mean(u, axis=0)
    v_bt = jnp.mean(v, axis=0)
    big = HorViscCfg(laplacian=True, kh=0.0, dt=600.0, use_gme=True,
                     gme_kh=1e9, gme_limiter=100.0)
    small = HorViscCfg(laplacian=True, kh=0.0, dt=600.0, use_gme=True,
                       gme_kh=100.0, gme_limiter=1e7)
    r_big = horizontal_viscosity(g, u, v, h, big, u_bt=u_bt, v_bt=v_bt,
                                 htot=htot)
    r_small = horizontal_viscosity(g, u, v, h, small, u_bt=u_bt,
                                   v_bt=v_bt, htot=htot)
    # limiter at 100 == coefficient 100 (efficiency*depth factor = 1)
    np.testing.assert_allclose(np.asarray(r_big.diffu),
                               np.asarray(r_small.diffu), rtol=1e-12)


def test_gme_in_model():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    text = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 3
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
REENTRANT_X = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
LAPLACIAN = True
KH = 50.0
USE_GME = True
KHTH = 300.0
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
"""
    m = build_model(ParamFile(text=text))
    assert m.split_cfg.horvisc.use_gme
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.u)))
