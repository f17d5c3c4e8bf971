"""PRANDTL_TURB Kv_shear diabatic->dynamics carry and KV_ML_INVZ2.

Reference anchors: MOM_set_viscosity.F90:2957 (PRANDTL_TURB),
MOM_kappa_shear.F90:330 (kv_io = kappa * Prandtl_turb),
MOM_vert_friction.F90:1892-1900 (Kv_tot += visc%Kv_shear) and
:1877-1888 (KV_ML_INVZ2 1/z^2 profile).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model


CFG = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 6
DT = 600.0
DT_THERM = 600.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 160.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 0.2
EQN_OF_STATE = LINEAR
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.3
BUOY_CONFIG = zero
KD = 1.0e-5
USE_JACKSON_PARAM = True
"""


def _run(extra, nstep=4):
    m = build_model(ParamFile(text=CFG + extra))
    # seed a sheared surface jet so the Jackson-Hallberg scheme has
    # shear to act on from the first diabatic call
    u0 = (m.state.u.at[0].add(0.4).at[1].add(0.2)) * m.grid.mask2dCu
    m.state = m.state.replace(u=u0)
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(nstep):
        s, a, tr = step(s, a, tr, n=k)
    return np.asarray(m.domain.interior(s.u))


def test_prandtl_turb_feeds_dynamics_viscosity():
    """With the Jackson-Hallberg shear scheme active, raising
    PRANDTL_TURB must change the velocity field through the carried
    Kv_shear in the dynamics' implicit vertical viscosity."""
    u1 = _run("PRANDTL_TURB = 1.0\n")
    u0 = _run("PRANDTL_TURB = 0.0\n")
    u8 = _run("PRANDTL_TURB = 8.0\n")
    assert np.isfinite(u1).all() and np.isfinite(u8).all()
    assert not np.allclose(u0, u8), "PRANDTL_TURB is inert"
    # more momentum mixing -> more vertically homogeneous u
    def vert_var(u):
        return float(np.mean(np.var(u, axis=0)))
    assert vert_var(u8) < vert_var(u0)


def test_kv_ml_invz2_damps_surface_jet():
    from mom6_tpu.core.vert_friction import (VertViscCfg,
                                             vertvisc_coef)
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    dn = Domain(ni=8, nj=8, halo=4, reentrant_x=True,
                reentrant_y=True)
    g = cartesian_grid(dn, lenlon_km=80.0, lenlat_km=80.0, f0=1e-4,
                       depth_fn=lambda x, y: jnp.full(x.shape, 500.0),
                       max_depth=500.0)
    nk = 10
    h = jnp.full((nk, dn.njh, dn.nih), 50.0)
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    c0 = vertvisc_coef(g, u, v, h, cfg=VertViscCfg(kv=1e-4))
    c1 = vertvisc_coef(g, u, v, h,
                       cfg=VertViscCfg(kv=1e-4, kv_ml_invz2=1e-2,
                                       hmix_fixed=100.0))
    a0 = np.asarray(c0.a_u)[:, 6, 6]
    a1 = np.asarray(c1.a_u)[:, 6, 6]
    # strong enhancement at the first interior interface, decaying
    # ~1/z^2 below
    assert a1[1] > 10.0 * a0[1], (a0[1], a1[1])
    assert a1[1] > a1[2] > a1[3]
    # deep interfaces nearly unchanged (z^2(1+0.09 z^6) grows fast)
    assert a1[-2] < 2.0 * a0[-2]


def test_kv_shear_restart_equivalence():
    """The carry must not leak across jit boundaries: two fresh models
    stepping identically produce identical u (determinism guard)."""
    ua = _run("PRANDTL_TURB = 2.0\n", nstep=3)
    ub = _run("PRANDTL_TURB = 2.0\n", nstep=3)
    np.testing.assert_array_equal(ua, ub)
