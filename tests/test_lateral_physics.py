import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.param.lateral.meke import MEKECfg, step_meke, meke_khth
from mom6_tpu.param.lateral.varmix import (VarMixCfg,
                                           calc_resolution_function)
from mom6_tpu.param.lateral.mixed_layer_restrat import (
    MLRestratCfg, mixed_layer_restrat)
from mom6_tpu.eos import LinearEOS


def setup(ni=16, nj=16, nk=4, f0=1e-4, dxkm=10.0):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=ni * dxkm, lenlat_km=nj * dxkm,
                       f0=f0, max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    return d, g, vg


def test_meke_source_damping_balance():
    d, g, vg = setup()
    cfg = MEKECfg()
    e = jnp.zeros_like(g.bathyT)
    src = jnp.full_like(e, 1e-4)     # [m3 s-3] column conversion
    for _ in range(200):
        e = step_meke(cfg, g, e, dt=3600.0, gm_work=src)
    ev = float(jnp.mean(d.interior(e)))
    assert ev > 0.0
    # equilibrium: gm*src/H ≈ cdrag*sqrt(2E)*E/H → finite E
    assert np.isfinite(ev) and ev < 10.0
    k = meke_khth(cfg, e)
    assert float(jnp.max(k)) > 0.0


def test_meke_decays_without_source():
    d, g, vg = setup()
    cfg = MEKECfg()
    e0 = jnp.full_like(g.bathyT, 0.01)
    e = e0
    for _ in range(50):
        e = step_meke(cfg, g, e, dt=3600.0)
    assert float(jnp.max(e)) < 0.01


def test_resolution_function_limits():
    """Coarse grid (dx >> Rd) → res_fn ≈ 1; fine grid → → 0."""
    d, g, vg = setup(dxkm=100.0)     # 100 km grid
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 250.0)))
    cfg = VarMixCfg()
    res = calc_resolution_function(cfg, g, vg, h)
    coarse = float(jnp.mean(d.interior(res.res_fn)))

    d2, g2, vg2 = setup(dxkm=1.0)    # 1 km grid
    h2 = d2.fill_halos(d2.pad(jnp.full((4, 16, 16), 250.0)))
    res2 = calc_resolution_function(cfg, g2, vg2, h2)
    fine = float(jnp.mean(d2.interior(res2.res_fn)))
    assert coarse > 0.8
    assert fine < 0.2
    assert np.all(np.asarray(res.res_fn) >= 0)
    assert np.all(np.asarray(res.res_fn) <= 1)


def test_ml_restrat_flattens_front_and_conserves():
    """A lateral buoyancy front within the mixed layer drives an
    overturning that conserves mass per column total."""
    d, g, vg = setup(nk=4)
    eos = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 50.0)))
    # temperature front in x
    x = np.arange(24)
    T_int = 10.0 + 2.0 * np.tanh((x[None, None, :] - 12) / 2.0) \
        * np.ones((4, 24, 24))
    T = d.fill_halos(jnp.asarray(T_int))
    S = jnp.full_like(T, 35.0)
    cfg = MLRestratCfg(hml_const=100.0)
    res = mixed_layer_restrat(cfg, g, vg, h, dt=3600.0, T=T, S=S,
                              eos=eos)
    a = d.interior(g.areaT)
    m0 = float(jnp.sum(d.interior(h) * a))
    m1 = float(jnp.sum(d.interior(res.h) * a))
    assert abs(m1 - m0) / m0 < 1e-12
    # transports exist and have zero column sums (overturning form)
    colsum = np.asarray(d.interior(jnp.sum(res.uhml, axis=0)))
    assert np.max(np.abs(colsum)) < 1e-6 * np.max(np.abs(
        np.asarray(res.uhml)))
    assert float(jnp.max(jnp.abs(res.uhml))) > 0.0
