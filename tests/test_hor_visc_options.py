"""Leith / velocity-scale / anisotropic horizontal viscosity options
(MOM_hor_visc.F90 coefficient matrix)."""

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
                       np.full_like(la, 1000.0), max_depth=1000.0)
    rng = np.random.default_rng(seed)
    shp = (2, d.njh, d.nih)
    u = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    v = d.fill_halos(jnp.asarray(0.3 * rng.standard_normal(shp)))
    h = d.fill_halos(jnp.asarray(50.0 + 10.0 * rng.random(shp)))
    return d, g, u, v, h


def _interior(d, f):
    return np.asarray(d.interior(f))


def test_max_semantics_large_background_wins():
    """With a huge background KH, adding a tiny Smagorinsky must not
    change the answer (coefficients combine by max, :1101)."""
    d, g, u, v, h = _setup()
    big = HorViscCfg(laplacian=True, kh=500.0, dt=600.0)
    mix = HorViscCfg(laplacian=True, kh=500.0, smag_lap_const=1e-6,
                     dt=600.0)
    r1 = horizontal_viscosity(g, u, v, h, big)
    r2 = horizontal_viscosity(g, u, v, h, mix)
    np.testing.assert_allclose(_interior(d, r2.diffu),
                               _interior(d, r1.diffu), rtol=1e-12)


def test_add_les_viscosity_differs():
    d, g, u, v, h = _setup()
    mx = HorViscCfg(laplacian=True, kh=50.0, smag_lap_const=0.2,
                    dt=600.0)
    ad = HorViscCfg(laplacian=True, kh=50.0, smag_lap_const=0.2,
                    add_les_viscosity=True, dt=600.0)
    r1 = horizontal_viscosity(g, u, v, h, mx)
    r2 = horizontal_viscosity(g, u, v, h, ad)
    d1, d2 = _interior(d, r1.diffu), _interior(d, r2.diffu)
    assert np.max(np.abs(d1 - d2)) > 1e-9 * np.max(np.abs(d1))


def test_kh_vel_scale_floor():
    """KH=0 with KH_VEL_SCALE equals a constant-KH run at vel*Δ on a
    uniform grid (:2516)."""
    d, g, u, v, h = _setup()
    delta = float(np.sqrt(
        2 * np.asarray(g.dxT)[H + 2, H + 2] ** 2
        * np.asarray(g.dyT)[H + 2, H + 2] ** 2
        / (np.asarray(g.dxT)[H + 2, H + 2] ** 2
           + np.asarray(g.dyT)[H + 2, H + 2] ** 2)))
    vs = HorViscCfg(laplacian=True, kh_vel_scale=0.01, dt=600.0)
    eq = HorViscCfg(laplacian=True, kh=0.01 * delta, dt=600.0)
    r1 = horizontal_viscosity(g, u, v, h, vs)
    r2 = horizontal_viscosity(g, u, v, h, eq)
    np.testing.assert_allclose(_interior(d, r1.diffu),
                               _interior(d, r2.diffu), rtol=1e-10)


def test_leith_kh_activates_on_vorticity():
    d, g, u, v, h = _setup(seed=4)
    off = HorViscCfg(laplacian=True, kh=0.0, dt=600.0)
    on = HorViscCfg(laplacian=True, kh=0.0, leith_kh=True,
                    leith_lap_const=1.0, dt=600.0)
    r0 = horizontal_viscosity(g, u, v, h, off)
    r1 = horizontal_viscosity(g, u, v, h, on)
    assert np.allclose(_interior(d, r0.diffu), 0.0)
    assert np.max(np.abs(_interior(d, r1.diffu))) > 0.0
    assert np.all(np.isfinite(np.asarray(r1.diffu)))


def test_modified_leith_adds_divergence_term():
    d, g, u, v, h = _setup(seed=6)
    leith = HorViscCfg(laplacian=True, leith_kh=True,
                       leith_lap_const=1.0, dt=600.0)
    mod = HorViscCfg(laplacian=True, leith_kh=True,
                     leith_lap_const=1.0, modified_leith=True, dt=600.0)
    r1 = horizontal_viscosity(g, u, v, h, leith)
    r2 = horizontal_viscosity(g, u, v, h, mod)
    d1, d2 = _interior(d, r1.diffu), _interior(d, r2.diffu)
    assert np.max(np.abs(d1 - d2)) > 1e-9 * np.max(np.abs(d1))


def test_leith_ah_biharmonic():
    d, g, u, v, h = _setup(seed=8)
    on = HorViscCfg(biharmonic=True, ah=0.0, leith_ah=True,
                    leith_bi_const=1.0, dt=600.0)
    r = horizontal_viscosity(g, u, v, h, on)
    assert np.max(np.abs(_interior(d, r.diffu))) > 0.0
    assert np.all(np.isfinite(np.asarray(r.diffv)))


def test_anisotropic_diagonal_direction():
    """n=(1,1)/sqrt(2): n1n2=1/2, n1^2-n2^2=0 — no cross-stress, and
    the added isotropic parts are 3/4 (h) and 1/4 (q) of KH_ANISO."""
    d, g, u, v, h = _setup(seed=10)
    iso = HorViscCfg(laplacian=True, kh=10.0, dt=600.0)
    ani = HorViscCfg(laplacian=True, kh=10.0, anisotropic=True,
                     kh_aniso=40.0, aniso_n=(1.0, 1.0), dt=600.0)
    r1 = horizontal_viscosity(g, u, v, h, iso)
    r2 = horizontal_viscosity(g, u, v, h, ani)
    d1, d2 = _interior(d, r1.diffu), _interior(d, r2.diffu)
    assert np.max(np.abs(d2 - d1)) > 1e-9 * np.max(np.abs(d1))
    assert np.all(np.isfinite(d2))


def test_aniso_grid_aligned_tension_only():
    """n=(1,0): the full KH_ANISO lands on the tension (h) component
    and none on the shear (q) component."""
    d, g, u, v, h = _setup(seed=12)
    base = HorViscCfg(laplacian=True, kh=10.0, dt=600.0)
    ani = HorViscCfg(laplacian=True, kh=10.0, anisotropic=True,
                     kh_aniso=25.0, aniso_n=(1.0, 0.0), dt=600.0)
    eq = HorViscCfg(laplacian=True, kh=10.0, dt=600.0)
    r_ani = horizontal_viscosity(g, u, v, h, ani)
    # reproduce by hand: an iso run whose str_xx used kh+25 but str_xy
    # used kh — build from two iso runs' linearity in Kh
    r_kh = horizontal_viscosity(g, u, v, h, base)
    r_kh35 = horizontal_viscosity(
        g, u, v, h, HorViscCfg(laplacian=True, kh=35.0, dt=600.0))
    # str_xx scales diffu's tension part; can't split exactly from
    # outputs, so check bounds: ani result lies between the two
    # isotropic runs in magnitude of the difference field
    da = _interior(d, r_ani.diffu)
    d0 = _interior(d, r_kh.diffu)
    d1 = _interior(d, r_kh35.diffu)
    assert np.max(np.abs(da - d0)) > 0.0
    assert np.max(np.abs(da - d0)) <= np.max(np.abs(d1 - d0)) + 1e-12


def test_resoln_scaled_kh():
    """RESOLN_SCALED_KH: the VarMix resolution function scales the
    Laplacian viscosity inside the dynamics (MOM_hor_visc.F90
    Kh *= Res_fn)."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    base = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 160.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
REENTRANT_X = True
ADIABATIC = True
WIND_CONFIG = gyres
LAPLACIAN = True
KH = 1.0e4
USE_VARIABLE_MIXING = True
"""
    runs = {}
    for tag, extra in (("off", ""), ("on", "RESOLN_SCALED_KH = True\n")):
        m = build_model(ParamFile(text=base + extra))
        step = m.step_fn()
        s, a, tr = m.state, m.split_state, m.tracers
        for k in range(4):
            s, a, tr = step(s, a, tr, n=k)
        runs[tag] = np.asarray(m.domain.interior(s.u))
        assert np.all(np.isfinite(runs[tag]))
    # scaling engaged: trajectories differ
    assert not np.array_equal(runs["on"], runs["off"])
