"""Hybgen unmixing (MOM_hybgen_unmix.F90 hybgen_column_unmix).

Column scenarios for the three cases plus exact conservation and a
full HYCOM1 model run with HYBGEN_UNMIX = True.
"""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.ale.hybgen_unmix import HybgenUnmixCfg, hybgen_unmix
from mom6_tpu.eos import LinearEOS
from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

EOS = LinearEOS(rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8)
CFG = HybgenUnmixCfg(hybiso=0.05, qhybrlx=1.0, fixlay=1,
                     ref_pressure=0.0)


def col(a):
    return jnp.asarray(np.asarray(a, dtype=np.float64)).reshape(-1, 1, 1)


def _totals(h, T, S, tr):
    return (float(jnp.sum(h)), float(jnp.sum(h * T)),
            float(jnp.sum(h * S)),
            float(jnp.sum(h * tr["dye"])))


def _rho(T, S=35.0):
    return 1000.0 - 0.2 * T + 0.8 * S


def test_noop_when_on_target():
    """A stably stratified column already at its targets is unchanged."""
    T = col([16.0, 12.0, 8.0, 4.0])
    S = col([35.0] * 4)
    h = col([100.0, 200.0, 300.0, 400.0])
    rlay = np.array([_rho(t) for t in (16.0, 12.0, 8.0, 4.0)])
    tr = {"dye": col([1.0, 2.0, 3.0, 4.0])}
    h2, T2, S2, tr2 = hybgen_unmix(h, T, S, tr, EOS, rlay, CFG)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h), atol=1e-12)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tr2["dye"]),
                               np.asarray(tr["dye"]), atol=1e-12)


def test_case_a_entrains_inverted_bottom():
    """Bottom layer lighter than the two above (and lighter than its
    target): fully entrained into the layer above with mass-weighted
    properties (the 'bug interaction' branch)."""
    # warm (light) water at depth: T = 20 at the bottom.  Layer 1 is
    # held off its target by > hybiso so the follow-on case-C split
    # (which the reference also applies after a full entrainment) does
    # not fire and the pure entrainment result can be asserted.
    T = col([16.0, 12.5, 8.0, 20.0])
    S = col([35.0] * 4)
    h = col([100.0, 200.0, 300.0, 100.0])
    rlay = np.array([_rho(t) for t in (16.0, 12.0, 8.0, 4.0)])
    tr = {"dye": col([0.0, 0.0, 0.0, 1.0])}
    t0 = _totals(h, T, S, tr)
    h2, T2, S2, tr2 = hybgen_unmix(h, T, S, tr, EOS, rlay, CFG)
    t1 = _totals(h2, T2, S2, tr2)
    np.testing.assert_allclose(t1, t0, rtol=1e-13)
    hv = np.asarray(h2).ravel()
    Tv = np.asarray(T2).ravel()
    assert hv[3] == 0.0
    np.testing.assert_allclose(hv[2], 400.0)
    # mass-weighted blend: (300*8 + 100*20)/400 = 11
    np.testing.assert_allclose(Tv[2], 11.0, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(tr2["dye"]).ravel()[2], 0.25,
                               rtol=1e-13)


def test_case_c_splits_toward_target():
    """Bottom layer denser than the one above but lighter than its
    target, layer above near-isopycnal: a sublayer detrains upward and
    the remaining layer density moves toward the target."""
    # targets 16/12/8/4 degC; bottom layer at 6 degC (too light),
    # layer above exactly on its 8 degC target
    T = col([16.0, 12.0, 8.0, 6.0])
    S = col([35.0] * 4)
    h = col([100.0, 200.0, 300.0, 400.0])
    rlay = np.array([_rho(t) for t in (16.0, 12.0, 8.0, 4.0)])
    tr = {"dye": col([0.0, 0.0, 0.0, 1.0])}
    t0 = _totals(h, T, S, tr)
    h2, T2, S2, tr2 = hybgen_unmix(h, T, S, tr, EOS, rlay, CFG)
    t1 = _totals(h2, T2, S2, tr2)
    np.testing.assert_allclose(t1, t0, rtol=1e-13)
    hv = np.asarray(h2).ravel()
    Tv = np.asarray(T2).ravel()
    rho_new = _rho(Tv[3])
    rho_old = _rho(6.0)
    assert hv[3] < 400.0          # lost mass upward
    assert hv[2] > 300.0
    assert rho_new > rho_old      # moved toward the denser target
    assert rho_new <= rlay[3] + 1e-10
    # the detrained water carries layer-3 dye into layer 2
    assert float(np.asarray(tr2["dye"]).ravel()[2]) > 0.0


def test_conservation_random_columns():
    rng = np.random.default_rng(5)
    nk, nj, ni = 6, 4, 4
    h = jnp.asarray(rng.uniform(10.0, 400.0, (nk, nj, ni)))
    T = jnp.asarray(rng.uniform(2.0, 18.0, (nk, nj, ni)))
    S = jnp.asarray(rng.uniform(33.0, 36.0, (nk, nj, ni)))
    tr = {"dye": jnp.asarray(rng.uniform(0.0, 1.0, (nk, nj, ni)))}
    rlay = np.array([_rho(t) for t in
                     np.linspace(16.0, 2.0, nk)])
    h2, T2, S2, tr2 = hybgen_unmix(h, T, S, tr, EOS, rlay, CFG)
    for a, b in ((h, h2), (h * T, h2 * T2), (h * S, h2 * S2),
                 (h * tr["dye"], h2 * tr2["dye"])):
        np.testing.assert_allclose(
            np.asarray(jnp.sum(b, axis=0)),
            np.asarray(jnp.sum(a, axis=0)), rtol=1e-12)
    assert np.all(np.asarray(h2) >= -1e-12)


BASE = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 6
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1200.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 10.0
S_RANGE = 1.0
EQN_OF_STATE = WRIGHT
COORD_CONFIG = linear
LIGHTEST_DENSITY = 1030.0
DENSITY_RANGE = 5.0
BULKMIXEDLAYER = False
WIND_CONFIG = gyres
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = HYCOM1
HYBGEN_UNMIX = True
"""


def test_hycom1_model_with_unmix_runs():
    m = build_model(ParamFile(text=BASE))
    assert m.ocean_cfg.ale.hybgen_unmix is not None
    d = m.domain
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    area = d.interior(m.grid.areaT)
    mass0 = float(jnp.sum(d.interior(s.h).sum(0) * area))
    salt0 = float(jnp.sum(d.interior(s.S * s.h).sum(0) * area))
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    mass1 = float(jnp.sum(d.interior(s.h).sum(0) * area))
    salt1 = float(jnp.sum(d.interior(s.S * s.h).sum(0) * area))
    assert abs(mass1 - mass0) / mass0 < 1e-13
    assert abs(salt1 - salt0) / salt0 < 1e-11
    assert np.all(np.isfinite(np.asarray(d.interior(s.u))))
