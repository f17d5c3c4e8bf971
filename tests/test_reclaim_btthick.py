"""RECLAIM_FRAZIL carry and BT_THICK_SCHEME face-thickness options.

Reference anchors: MOM_diabatic_aux.F90:59-80 (surface frazil
reclaim), :205 (tv%frazil accumulation); MOM_barotropic.F90:3495-3539
(btcalc hvel_scheme branches), :4520 (BT_THICK_SCHEME).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.param.vertical.diabatic_aux import (FrazilCfg,
                                                  make_frazil,
                                                  t_freeze)
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.barotropic import btcalc


def _col(nk=4, t0=-0.5):
    h = jnp.full((nk, 2, 2), 50.0)
    T = jnp.full((nk, 2, 2), 5.0).at[0].set(t0)
    S = jnp.full((nk, 2, 2), 35.0)
    return h, T, S


def test_frazil_accumulates_across_calls():
    cfg = FrazilCfg()
    h, T, S = _col(t0=-3.0)
    T1, f1 = make_frazil(cfg, h, T, S)
    assert float(f1[0, 0]) > 0.0
    # surface stays exactly at freezing after clamping
    tf0 = t_freeze(cfg, 35.0, cfg.rho0 * cfg.g * 25.0)
    np.testing.assert_allclose(np.asarray(T1[0]), tf0, rtol=1e-12)
    # second call with still-freezing water: deficit accumulates
    T2, f2 = make_frazil(cfg, h, T, S, frazil_prev=f1)
    np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(f1),
                               rtol=1e-12)


def test_frazil_reclaimed_by_warm_surface():
    cfg = FrazilCfg()
    h, T, S = _col(t0=-3.0)
    _, f1 = make_frazil(cfg, h, T, S)
    # now the surface is warm: pending frazil melts, cooling the
    # surface layer; no new frazil forms
    h2, T2, S2 = _col(t0=6.0)
    T3, f3 = make_frazil(cfg, h2, T2, S2, frazil_prev=f1)
    hc = cfg.rho0 * cfg.cp * 50.0
    warm_capacity = hc * (6.0 - float(
        t_freeze(cfg, 35.0, cfg.rho0 * cfg.g * 25.0)))
    if float(f1[0, 0]) < warm_capacity:
        np.testing.assert_allclose(np.asarray(f3), 0.0, atol=1e-6)
        # energy conservation: the melt cooled the surface layer
        np.testing.assert_allclose(
            hc * (6.0 - float(T3[0, 0, 0])), float(f1[0, 0]),
            rtol=1e-10)
    # RECLAIM_FRAZIL=False: the deficit just accumulates
    cfg_off = FrazilCfg(reclaim=False)
    T4, f4 = make_frazil(cfg_off, h2, T2, S2, frazil_prev=f1)
    np.testing.assert_allclose(np.asarray(f4), np.asarray(f1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(T4), np.asarray(T2),
                               rtol=1e-12)


# ---------------------------------------------------------------------

def _grid_step():
    dn = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)

    def depth_fn(x, y):
        d = jnp.full(x.shape, 1000.0)
        return d.at[..., : x.shape[-1] // 2].set(300.0)  # shelf west
    g = cartesian_grid(dn, lenlon_km=80.0, lenlat_km=80.0, f0=1e-4,
                       depth_fn=depth_fn, max_depth=1000.0)
    nk = 5
    # layers pile up against the shelf: uneven thicknesses
    h = jnp.full((nk, dn.njh, dn.nih), 200.0)
    h = h.at[3:, :, :dn.nih // 2].set(1.0)   # deep layers vanish on shelf
    h = h.at[0, :, :dn.nih // 2].set(150.0)
    return dn, g, h


@pytest.mark.parametrize("scheme", ["ARITHMETIC", "HARMONIC",
                                    "HYBRID", "FROM_BT_CONT"])
def test_btcalc_schemes_normalized(scheme):
    dn, g, h = _grid_step()
    fu, fv = btcalc(g, h, scheme=scheme)
    su = np.asarray(jnp.sum(fu, axis=0))[dn.halo:-dn.halo,
                                         dn.halo:-dn.halo]
    np.testing.assert_allclose(su, 1.0, rtol=1e-6)
    assert np.asarray(fu).min() >= 0.0


def test_btcalc_harmonic_suppresses_vanished_layers():
    dn, g, h = _grid_step()
    fa, _ = btcalc(g, h, scheme="ARITHMETIC")
    fh, _ = btcalc(g, h, scheme="HARMONIC")
    # at the shelf-edge face, layers that vanish on one side get far
    # less weight under the harmonic mean
    iq = dn.halo + dn.nil // 2 - 1
    j = dn.halo + 2
    assert float(fh[4, j, iq]) < 0.3 * float(fa[4, j, iq])


def test_hybrid_weights_between_arith_and_harm():
    """The HYBRID per-layer face thickness is a pointwise blend of
    the arithmetic and harmonic means (before normalization)."""
    from mom6_tpu.core.barotropic import _hvel_weights
    from mom6_tpu.parallel.stencil import ip1
    dn, g, h = _grid_step()
    wa = _hvel_weights(h, ip1(h), "ARITHMETIC", g.bathyT,
                       ip1(g.bathyT))
    wh = _hvel_weights(h, ip1(h), "HARMONIC", g.bathyT,
                       ip1(g.bathyT))
    wy = _hvel_weights(h, ip1(h), "HYBRID", g.bathyT, ip1(g.bathyT))
    lo = np.minimum(np.asarray(wa), np.asarray(wh))
    hi = np.maximum(np.asarray(wa), np.asarray(wh))
    inner = (slice(None), slice(dn.halo, -dn.halo),
             slice(dn.halo, -dn.halo))
    assert (np.asarray(wy)[inner] >= lo[inner] - 1e-9).all()
    assert (np.asarray(wy)[inner] <= hi[inner] + 1e-9).all()
    with pytest.raises(ValueError):
        btcalc(g, h, scheme="NONSense")


def test_frazil_restart_roundtrip(tmp_path):
    """FRAZIL runs carry tv%frazil in the prognostic State; the field
    must be allocated from step 0 so restart templates match the
    saved pytree structure (bitwise restart invariance)."""
    import jax.numpy as jnp
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    from mom6_tpu.framework.restart import (save_restart,
                                            restore_restart)
    CFG = """
NIGLOBAL = 8
NJGLOBAL = 8
NK = 4
DT = 600.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 80.0
LENLAT = 80.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 400.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 30.0
T_REF = -1.0
EQN_OF_STATE = LINEAR
WIND_CONFIG = zero
BUOY_CONFIG = zero
FRAZIL = True
"""
    m = build_model(ParamFile(text=CFG))
    assert m.state.frazil is not None       # allocated up front
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(2):
        s, a, tr = step(s, a, tr, n=k)
    assert s.frazil is not None
    p = str(tmp_path / "restart")
    save_restart(p, {"state": s, "split": a})
    m2 = build_model(ParamFile(text=CFG))
    trees, _ = restore_restart(p, {"state": m2.state,
                                   "split": m2.split_state})
    s2 = trees["state"]
    np.testing.assert_array_equal(np.asarray(s2.h), np.asarray(s.h))
    np.testing.assert_array_equal(np.asarray(s2.frazil),
                                  np.asarray(s.frazil))
