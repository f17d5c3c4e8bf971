"""Astronomical tides + SAL wired into the pressure force, and the
spherical-harmonic SAL operator (MOM_tidal_forcing.F90 /
MOM_self_attr_load.F90 / MOM_spherical_harmonics.F90 re-designs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.param.lateral.self_attr_load import (SALHarmonics,
                                                   love_scaling)


def test_love_scaling_values():
    lam = love_scaling(2, rho_w=1035.0, rho_e=5517.0)
    # degree 2: 3/5 · (ρw/ρe) · (1 + k2' − h2')
    expect2 = (3.0 / 5.0) * (1035.0 / 5517.0) \
        * (1.0 - 0.30516104 + 0.99079949)
    np.testing.assert_allclose(lam[2], expect2, rtol=1e-12)
    # all degrees ≥ 2 give small positive fractions (≈ 0.02–0.2)
    assert np.all(lam[2:] > 0.0)
    assert np.all(lam[2:] < 0.3)


def _global_grid(nj=48, ni=96):
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import spherical_grid
    d = Domain(ni=ni, nj=nj, halo=2, reentrant_x=True)
    g = spherical_grid(d, west_lon=0.0, lenlon=360.0, south_lat=-87.0,
                       lenlat=174.0,
                       depth_fn=lambda lo, la: np.full_like(la, 4000.0),
                       max_depth=4000.0)
    return d, g


def test_sal_harmonics_eigenfunction():
    """A pure Y_2m surface pattern maps onto Λ₂·itself (harmonics are
    eigenfunctions of the SAL operator)."""
    d, g = _global_grid()
    sal = SALHarmonics.build(g, nmax=4)
    lat = np.deg2rad(np.asarray(g.geoLatT))
    lon = np.deg2rad(np.asarray(g.geoLonT))
    # Y_22-like real pattern: cos²φ·cos(2λ)
    eta = jnp.asarray(np.cos(lat) ** 2 * np.cos(2.0 * lon))
    out = np.asarray(sal(eta))
    lam2 = love_scaling(4)[2]
    # compare where the basis is well resolved (away from the caps)
    m = (np.abs(np.asarray(g.geoLatT)) < 60.0) \
        & (np.abs(np.asarray(eta)) > 0.3)
    ratio = out[m] / np.asarray(eta)[m]
    np.testing.assert_allclose(ratio.mean(), lam2, rtol=0.05)
    assert ratio.std() < 0.05 * lam2 + 0.01


def test_sal_harmonics_is_jittable():
    import jax
    d, g = _global_grid(24, 48)
    sal = SALHarmonics.build(g, nmax=3)
    eta = jnp.ones_like(g.mask2dT)
    f = jax.jit(sal.__call__)
    out = f(eta)
    assert np.all(np.isfinite(np.asarray(out)))


BASE = """
NIGLOBAL = 24
NJGLOBAL = 16
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = spherical
WESTLON = 0.0
LENLON = 360.0
SOUTHLAT = -60.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 4000.0
REENTRANT_X = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
TIDES = True
TIDE_M2 = True
"""


@pytest.mark.parametrize("sal", ["scalar", "harmonics"])
def test_tides_drive_the_model(sal):
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    extra = "" if sal == "scalar" else \
        "SAL_HARMONICS = True\nSAL_HARMONICS_DEGREE = 4\n"
    m = build_model(ParamFile(text=BASE + extra))
    assert m.split_cfg.tides_fn is not None
    # the equilibrium potential moves in time
    eta0 = jnp.zeros_like(m.grid.mask2dT)
    e1 = m.split_cfg.tides_fn(eta0, jnp.asarray(0.0))
    e2 = m.split_cfg.tides_fn(eta0, jnp.asarray(11170.0))  # ~1/4 M2
    assert float(jnp.max(jnp.abs(e1 - e2))) > 0.05
    # and the (otherwise unforced) ocean responds to the potential
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert float(jnp.max(jnp.abs(s.u))) > 1e-7


def test_sal_feedback_differs_from_no_sal():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    m1 = build_model(ParamFile(text=BASE))
    m2 = build_model(ParamFile(
        text=BASE + "SAL_SCALAR_APPROX = False\n"))
    eta = 0.5 * jnp.ones_like(m1.grid.mask2dT)
    e_with = m1.split_cfg.tides_fn(eta, jnp.asarray(0.0))
    e_wo = m2.split_cfg.tides_fn(eta, jnp.asarray(0.0))
    np.testing.assert_allclose(
        np.asarray(e_with - e_wo)[4:-4, 4:-4], 0.094 * 0.5,
        rtol=1e-9)
