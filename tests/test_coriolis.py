"""Coriolis / momentum-advection scheme matrix.

Cross-scheme identities from MOM_CoriolisAdv.F90: with spatially
uniform PV every discretization (Sadourny energy/enstrophy, AH90,
AL81, blend) collapses to the same PV flux and the AL81 divergence
terms vanish; ARAKAWA_LAMB_BLEND with F_EFF_MAX <= 2 reduces exactly
to Sadourny energy (:548); BOUND_CORIOLIS clamps into the local
f_eff*v range (:734); ROBUST_ENSTRO stays finite over vanishing
layers (:687).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.coriolis_adv import CoriolisCfg, coriolis_adv

NI, NJ, H = 16, 16, 4


def _setup(seed=0, uniform_h=True):
    d = Domain(ni=NI, nj=NJ, halo=H, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 1000.0), max_depth=1000.0)
    rng = np.random.default_rng(seed)
    shp = (2, d.njh, d.nih)
    if uniform_h:
        h = jnp.full(shp, 50.0)
    else:
        h = jnp.asarray(50.0 + 20.0 * rng.random(shp))
    u = jnp.zeros(shp)
    v = jnp.zeros(shp)
    uh = jnp.asarray(rng.standard_normal(shp)) * 100.0
    vh = jnp.asarray(rng.standard_normal(shp)) * 100.0
    uh = d.fill_halos(uh)
    vh = d.fill_halos(vh)
    h = d.fill_halos(h)
    return d, g, u, v, h, uh, vh


SCHEMES = ["SADOURNY75_ENERGY", "SADOURNY75_ENSTRO", "ARAKAWA_HSU90",
           "ARAKAWA_LAMB81", "ARAKAWA_LAMB_BLEND"]


@pytest.mark.parametrize("scheme", SCHEMES)
def test_uniform_pv_collapse(scheme):
    """u=v=0, uniform h, uniform f → uniform q: every scheme gives the
    same PV flux (the weights all sum to q/4 per transport)."""
    d, g, u, v, h, uh, vh = _setup()
    ref = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="SADOURNY75_ENERGY"))
    got = coriolis_adv(g, u, v, h, uh, vh, CoriolisCfg(scheme=scheme))
    sl = (slice(None), slice(H + 1, H + NJ - 1), slice(H + 1, H + NI - 1))
    np.testing.assert_allclose(np.asarray(got.CAu[sl]),
                               np.asarray(ref.CAu[sl]), rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(got.CAv[sl]),
                               np.asarray(ref.CAv[sl]), rtol=1e-12,
                               atol=1e-14)


def test_blend_feffmax2_is_sadourny_energy():
    d, g, u, v, h, uh, vh = _setup(seed=3, uniform_h=False)
    rng = np.random.default_rng(7)
    u = d.fill_halos(jnp.asarray(
        0.1 * rng.standard_normal(h.shape)))
    v = d.fill_halos(jnp.asarray(
        0.1 * rng.standard_normal(h.shape)))
    ref = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="SADOURNY75_ENERGY"))
    got = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="ARAKAWA_LAMB_BLEND",
                                   blend_f_eff_max=2.0))
    sl = (slice(None), slice(H + 1, H + NJ - 1), slice(H + 1, H + NI - 1))
    np.testing.assert_allclose(np.asarray(got.CAu[sl]),
                               np.asarray(ref.CAu[sl]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.CAv[sl]),
                               np.asarray(ref.CAv[sl]), rtol=1e-12)


def test_al81_differs_with_nonuniform_q():
    d, g, u, v, h, uh, vh = _setup(seed=5, uniform_h=False)
    ref = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="SADOURNY75_ENERGY"))
    got = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="ARAKAWA_LAMB81"))
    ga, ra = np.asarray(got.CAu), np.asarray(ref.CAu)
    assert np.max(np.abs(ga - ra)) > 1e-6 * np.max(np.abs(ra))
    assert np.all(np.isfinite(ga))


def test_bound_coriolis_clamps():
    from mom6_tpu.parallel.stencil import ip1, jm1, im1, jp1
    d, g, u, v, h, uh, vh = _setup(seed=9, uniform_h=False)
    rng = np.random.default_rng(11)
    u = d.fill_halos(jnp.asarray(0.5 * rng.standard_normal(h.shape)))
    v = d.fill_halos(jnp.asarray(0.5 * rng.standard_normal(h.shape)))
    res = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="SADOURNY75_ENERGY",
                                   bound_coriolis=True))
    # reconstruct the clamp range: before the KE-gradient subtraction
    # the PV flux must lie inside the surrounding f_eff*v range
    f_eff = np.asarray(g.CoriolisBu + res.rel_vort)
    fe = jnp.asarray(f_eff)
    fv = jnp.stack([fe * ip1(v), fe * v,
                    jm1(fe) * ip1(jm1(v)), jm1(fe) * jm1(v)])
    lo = np.asarray(jnp.min(fv, 0))
    hi = np.asarray(jnp.max(fv, 0))
    # with zero transports CAu = -KEx alone; subtracting isolates the
    # (bounded) PV flux from the full result
    ke_only = np.asarray(
        coriolis_adv(g, u, v, h, uh * 0, vh * 0,
                     CoriolisCfg(scheme="SADOURNY75_ENERGY")).CAu)
    flux = np.asarray(res.CAu) - ke_only          # bounded PV flux
    sl = (slice(None), slice(H + 1, H + NJ - 1),
          slice(H + 1, H + NI - 1))
    wet = np.asarray(g.mask2dCu)[sl[1:]] > 0
    assert np.all(flux[sl][:, wet] <= hi[sl][:, wet] + 1e-12)
    assert np.all(flux[sl][:, wet] >= lo[sl][:, wet] - 1e-12)


@pytest.mark.parametrize("upwind", [False, True])
def test_robust_enstro_vanishing_layer(upwind):
    d, g, u, v, h, uh, vh = _setup(seed=13, uniform_h=False)
    # crush a band of layer thickness to (near) zero
    h = h.at[:, H + 4:H + 8, :].set(1e-14)
    h = d.fill_halos(h)
    res = coriolis_adv(g, u, v, h, uh, vh,
                       CoriolisCfg(scheme="ROBUST_ENSTRO",
                                   pv_adv_upwind=upwind))
    assert np.all(np.isfinite(np.asarray(res.CAu)))
    assert np.all(np.isfinite(np.asarray(res.CAv)))
    # and it is not identically zero
    assert float(jnp.max(jnp.abs(res.CAu))) > 0


def test_model_runs_with_al81():
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
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
REENTRANT_X = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
CORIOLIS_SCHEME = ARAKAWA_LAMB81
BOUND_CORIOLIS = True
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
"""
    m = build_model(ParamFile(text=text))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    assert np.isfinite(float(jnp.sum(s.u)))
    assert float(jnp.max(jnp.abs(s.u))) > 0
