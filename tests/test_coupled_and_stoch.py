import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.drivers.ocean_model import (IceOceanBoundary,
                                          ocean_model_init,
                                          update_ocean_model,
                                          extract_surface_state)
from mom6_tpu.param.stochastic.stochastics import (StochasticsCfg,
                                                   init_pattern,
                                                   step_pattern,
                                                   apply_sppt)
from mom6_tpu.diagnostics.derived import (relative_vorticity_z, speed,
                                          kinetic_energy,
                                          sea_surface_height)

CASE_TEXT = '''
SPLIT = True
ENABLE_THERMODYNAMICS = True
DT = 600.0
NIGLOBAL = 12
NJGLOBAL = 12
NK = 3
EQN_OF_STATE = "LINEAR"
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 120.0
LENLON = 120.0
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 600.0
KV = 1.0E-04
KD = 1.0E-05
THICKNESS_CONFIG = "uniform"
WIND_CONFIG = "zero"
T_REF = 10.0
'''


def test_coupled_lifecycle():
    """ocean_model_init → update_ocean_model with coupler fluxes →
    surface state export."""
    m = ocean_model_init(text=CASE_TEXT)
    st, sp, tr = m.state, m.split_state, m.tracers
    taux = 0.05 * m.grid.mask2dCu
    sw = 200.0 * m.grid.mask2dT
    iob = IceOceanBoundary(u_flux=taux, sw_flux=sw)
    st, sp, tr, sfc = update_ocean_model(m, iob, st, sp, tr,
                                         dt_coupling=1800.0)
    d = m.domain
    # SW heating must warm the SST
    sst = np.asarray(d.interior(sfc.sst))
    assert sst.min() > 10.0
    assert np.all(np.isfinite(np.asarray(sfc.sea_lev)))
    # wind must accelerate surface currents
    assert float(jnp.max(jnp.abs(d.interior(sfc.u)))) > 0.0


def test_surface_state_masks_land():
    m = ocean_model_init(text=CASE_TEXT.replace(
        'TOPO_CONFIG = "flat"', 'TOPO_CONFIG = "bowl"').replace(
        'MAXIMUM_DEPTH = 600.0',
        'MAXIMUM_DEPTH = 600.0\nMINIMUM_DEPTH = 50.0'))
    sfc = extract_surface_state(m, m.state)
    # halo land cells are masked to zero
    assert float(sfc.sst[0, 0]) == 0.0


def test_sppt_pattern_properties():
    d = Domain(ni=32, nj=32, halo=4, reentrant_x=True, reentrant_y=True)
    cfg = StochasticsCfg(do_sppt=True, decorr_steps=10)
    p0 = init_pattern(d, cfg, seed=3)
    assert p0.shape == (40, 40)
    p1 = step_pattern(d, cfg, p0, seed=3, step=0)
    # AR(1): consecutive patterns strongly correlated
    a, b = np.asarray(d.interior(p0)), np.asarray(d.interior(p1))
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.8
    # tendency perturbation is bounded and mean-preserving-ish
    t = jnp.ones((3, 40, 40))
    t2 = apply_sppt(cfg, t, p0)
    assert float(jnp.min(t2)) > 0.0
    assert abs(float(jnp.mean(t2)) - 1.0) < 0.2


def test_derived_diagnostics():
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0)
    rng = np.random.default_rng(0)
    u = d.fill_halos(d.pad(jnp.asarray(rng.standard_normal((2, 16, 16)))))
    v = d.fill_halos(d.pad(jnp.asarray(rng.standard_normal((2, 16, 16)))))
    h = d.pad(jnp.full((2, 16, 16), 100.0))
    rv = relative_vorticity_z(g, u, v)
    assert np.isfinite(np.asarray(d.interior(rv))).all()
    sp = speed(u, v)
    assert float(jnp.min(d.interior(sp))) >= 0.0
    ke = kinetic_energy(g, u, v)
    assert float(jnp.min(d.interior(ke))) >= 0.0
    ssh = sea_surface_height(g, h)
    np.testing.assert_allclose(np.asarray(d.interior(ssh)),
                               200.0 - 4000.0)


def test_skeb_increment_nondivergent_and_tapered():
    """SKEB (apply_skeb, MOM_stochastics.F90:265-390): the velocity
    increment is the curl of a streamfunction, so on a uniform grid
    its discrete divergence vanishes identically; the taper zeroes it
    near land; and it injects (not removes) kinetic energy where the
    flow is active."""
    from mom6_tpu.param.stochastic.stochastics import (
        StochasticsCfg, init_pattern, apply_skeb, skeb_taper)
    from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

    d = Domain(ni=32, nj=32, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=320.0, lenlat_km=320.0)
    cfg = StochasticsCfg(do_skeb=True, skeb_npass=3,
                         skeb_taper_width=3)
    rng = np.random.default_rng(5)
    u = d.fill_halos(d.pad(jnp.asarray(
        0.3 * rng.standard_normal((2, 32, 32)))))
    v = d.fill_halos(d.pad(jnp.asarray(
        0.3 * rng.standard_normal((2, 32, 32)))))
    wts = init_pattern(d, cfg, seed=7)
    u2, v2 = apply_skeb(d, g, cfg, u, v, wts, dt=600.0)
    du, dv = u2 - u, v2 - v
    assert float(jnp.max(jnp.abs(d.interior(du)))) > 0.0
    # non-divergent: du/dx + dv/dy = 0 discretely (uniform metrics)
    div = (du - im1(du)) + (dv - jm1(dv))
    scale = float(jnp.max(jnp.abs(d.interior(du)))) + 1e-30
    assert float(jnp.max(jnp.abs(d.interior(div)[..., 1:-1, 1:-1]))) \
        < 1e-10 * scale
    # taper: a wet cell adjacent to land gets ~zero increment
    t_cu, t_cv = skeb_taper(d, g, width=3)
    assert float(jnp.min(t_cu)) >= 0.0 and float(jnp.max(t_cu)) <= 1.0


def test_skeb_in_model_runs_and_carries_pattern():
    cfg_text = """
NIGLOBAL = 24
NJGLOBAL = 24
NK = 3
DT = 600.0
DT_THERM = 600.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 240.0
LENLAT = 240.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 8.0
EQN_OF_STATE = LINEAR
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
DO_SKEB = True
SKEB_AMPLITUDE = 0.5
"""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    m = build_model(ParamFile(text=cfg_text))
    assert m.ocean_cfg.sppt is not None and m.ocean_cfg.sppt.do_skeb
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for n in range(3):
        s, a, tr = step(s, a, tr, n=n)
    assert np.isfinite(np.asarray(m.domain.interior(s.u))).all()
    # the SKEB AR(1) pattern is carried across steps as a dict entry
    carry = step.carry()["sppt"]
    assert isinstance(carry, dict) and carry.get("skeb") is not None
