"""Stanley SGS-variance EOS correction and the Zanna-Bolton 2020
closure (MOM_stoch_eos.F90 / MOM_Zanna_Bolton.F90 re-designs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.stoch_eos import (calc_varT, density_second_dT2,
                                     stanley_density)
from mom6_tpu.eos import make_eos

NI, NJ, H = 16, 16, 4


def _grid(seed=0):
    d = Domain(ni=NI, nj=NJ, halo=H, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 1000.0), max_depth=1000.0)
    return d, g


def test_second_deriv_linear_eos_zero():
    eos = make_eos("LINEAR")
    T = jnp.asarray([[5.0, 10.0]])
    S = jnp.full_like(T, 35.0)
    p = jnp.zeros_like(T)
    np.testing.assert_allclose(
        np.asarray(density_second_dT2(eos, T, S, p)), 0.0, atol=1e-12)


def test_second_deriv_wright_matches_fd():
    eos = make_eos("WRIGHT")
    T = jnp.asarray([10.0])
    S = jnp.asarray([35.0])
    p = jnp.asarray([2.0e7])
    d2 = float(density_second_dT2(eos, T, S, p)[0])
    eps = 1e-3
    fd = (float(eos.density(T + eps, S, p)[0])
          - 2.0 * float(eos.density(T, S, p)[0])
          + float(eos.density(T - eps, S, p)[0])) / eps ** 2
    np.testing.assert_allclose(d2, fd, rtol=1e-4)
    # Wright EOS: the thermal expansion coefficient grows with T here,
    # so rho(T) is concave (d2rho/dT2 < 0)
    assert d2 < 0.0


def test_varT_zero_for_uniform_T_and_positive_for_gradient():
    d, g = _grid()
    shp = (2, d.njh, d.nih)
    h = jnp.full(shp, 100.0)
    T0 = jnp.full(shp, 10.0)
    assert float(jnp.max(jnp.abs(calc_varT(g, h, T0, 1.0)))) == 0.0
    Tg = d.fill_halos(T0 + 0.1 * jnp.arange(d.nih)[None, None, :])
    v = calc_varT(g, h, Tg, 1.0)
    sl = (0, slice(H + 1, H + NJ - 1), slice(H + 1, H + NI - 1))
    assert float(jnp.min(v[sl])) > 0.0
    # analytic value: (dx * dT/dx)^2 with dT/dx = 0.1/dx → 0.01
    np.testing.assert_allclose(np.asarray(v[sl]), 0.01, rtol=1e-10)


def test_stanley_density_shifts_rho():
    eos = make_eos("WRIGHT")
    T = jnp.asarray([10.0])
    S = jnp.asarray([35.0])
    p = jnp.asarray([1.0e7])
    r0 = float(eos.density(T, S, p)[0])
    r1 = float(stanley_density(eos, T, S, p, jnp.asarray([4.0]))[0])
    assert r1 < r0                       # concave rho(T) at 10 C
    np.testing.assert_allclose(
        r1 - r0,
        0.5 * 4.0 * float(density_second_dT2(eos, T, S, p)[0]),
        rtol=1e-12)


def test_stanley_pgf_in_model():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    base = """
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
MAXIMUM_DEPTH = 500.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 6.0
S_RANGE = 0.0
EQN_OF_STATE = WRIGHT
BULKMIXEDLAYER = False
"""
    m_on = build_model(ParamFile(text=base + "USE_STANLEY_PGF = True\n"
                                 "STANLEY_COEFF = 4.0\n"))
    assert m_on.split_cfg.pressure.stanley_coeff == 4.0
    # the Stanley PGF path compiles and steps (the linear IC has no
    # horizontal T gradient, so the correction starts at zero)
    s, a, tr = m_on.step_fn()(m_on.state, m_on.split_state,
                              m_on.tracers, 0)
    assert np.all(np.isfinite(np.asarray(s.u)))


def test_stanley_pgf_changes_force_with_T_gradient():
    import dataclasses as dc
    from mom6_tpu.core.pressure_force import (PressureForceCfg,
                                              pressure_force)
    from mom6_tpu.core.vertical_grid import VerticalGrid
    d, g = _grid()
    eos = make_eos("WRIGHT")
    vg = VerticalGrid.uniform(nk=3)
    shp = (3, d.njh, d.nih)
    h = jnp.full(shp, 200.0)
    # T varies horizontally (front) and with depth
    T = d.fill_halos(
        10.0 + 2.0 * jnp.sin(2 * jnp.pi * jnp.arange(d.nih) / d.nih
                             )[None, None, :]
        - 1.0 * jnp.arange(3)[:, None, None] * jnp.ones(shp))
    S = jnp.full(shp, 35.0)
    off = pressure_force(g, vg, h, T, S, eos,
                         cfg=PressureForceCfg(stanley_coeff=-1.0))
    on = pressure_force(g, vg, h, T, S, eos,
                        cfg=PressureForceCfg(stanley_coeff=40.0))
    dpf = np.abs(np.asarray(on.PFu - off.PFu))
    assert np.all(np.isfinite(dpf))
    assert dpf.max() > 1e-12 * np.abs(np.asarray(off.PFu)).max()


def test_zb2020_momentum_conserving_and_active():
    from mom6_tpu.param.lateral.zanna_bolton import (ZB2020Cfg,
                                                     zb2020_accel)
    d, g = _grid()
    rng = np.random.default_rng(3)
    shp = (2, d.njh, d.nih)
    u = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    v = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    h = jnp.full(shp, 100.0)
    r = zb2020_accel(g, u, v, h, ZB2020Cfg(amplitude=1.0))
    du = np.asarray(r.du)
    assert np.all(np.isfinite(du))
    sl = (slice(None), slice(H, H + NJ), slice(H, H + NI))
    assert np.max(np.abs(du[sl])) > 0.0
    # flux-form divergence over the doubly periodic domain: the
    # h-weighted area integral of the acceleration telescopes to zero
    h_u = 0.5 * (h + jnp.roll(h, -1, -1))
    mom_u = float(jnp.sum((r.du * h_u * g.areaCu)[sl]))
    scale = float(jnp.sum((jnp.abs(r.du) * h_u * g.areaCu)[sl]))
    assert abs(mom_u) < 1e-10 * scale


def test_zb2020_in_model():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    text = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 500.0
F_0 = 1.0e-4
REENTRANT_X = True
REENTRANT_Y = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
USE_ZB2020 = True
ZB_SCALING = 1.0
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
"""
    m = build_model(ParamFile(text=text))
    assert m.split_cfg.horvisc.use_zb2020
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.u)))
