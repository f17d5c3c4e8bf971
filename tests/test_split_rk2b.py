"""Split RK2b — the restart-lean variant that prognoses the filtered
velocities (MOM_dynamics_split_RK2b.F90)."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.barotropic import BarotropicCfg
from mom6_tpu.core.dynamics_split_rk2 import (
    SplitCfg, init_split_state, step_dyn_split_rk2)
from mom6_tpu.core.dynamics_split_rk2b import (
    SplitBDynState, init_split_b_state, step_dyn_split_rk2b)
from mom6_tpu.core.vert_friction import VertViscCfg


def setup(ni=32, nj=32, nk=2, depth=1000.0, f0=0.0, lenkm=320.0,
          nstep=16):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=lenkm, lenlat_km=lenkm, f0=f0,
                       max_depth=depth)
    vg = VerticalGrid.uniform(nk=nk, gint=0.0098)
    cfg = SplitCfg(vertvisc=VertViscCfg(kv=1e-4, cdrag=0.0,
                                        bottomdraglaw=False),
                   barotropic=BarotropicCfg(nstep=nstep))
    return d, g, vg, cfg


def test_rk2b_lake_at_rest():
    d, g, vg, cfg = setup()
    h = d.fill_halos(d.pad(jnp.full((2, 32, 32), 500.0)))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    sp = init_split_b_state(d, g, vg, st)
    st2, sp2, _ = step_dyn_split_rk2b(d, g, vg, st, sp, MechForcing(),
                                      900.0, cfg)
    assert float(jnp.max(jnp.abs(d.interior(st2.u)))) < 1e-12
    assert float(jnp.max(jnp.abs(d.interior(st2.h) - 500.0))) < 1e-9


def test_rk2b_gravity_wave_stable_and_conservative():
    """Stable far past the gravity-wave CFL; mass exactly conserved."""
    d, g, vg, cfg = setup(ni=64, nj=8, lenkm=640.0, nstep=40)
    H0 = 1000.0
    L = 640.0e3
    k = 2 * np.pi / L
    x = (np.arange(72) - 4 + 0.5) * (L / 64)
    eta0 = 0.05 * np.sin(k * x)
    h_int = np.broadcast_to((H0 + eta0) / 2, (2, 16, 72)).copy()
    h = d.fill_halos(jnp.asarray(h_int))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    sp = init_split_b_state(d, g, vg, st)
    step = jax.jit(lambda s, a: step_dyn_split_rk2b(
        d, g, vg, s, a, MechForcing(), 900.0, cfg)[:2])
    for _ in range(20):
        st, sp = step(st, sp)
    h_out = np.asarray(d.interior(st.h))
    assert np.all(np.isfinite(h_out))
    assert np.max(np.abs(h_out.sum(0) - H0)) < 0.2
    mass0 = float(np.sum(h_int[:, 4:-4, 4:-4]))
    assert abs(float(h_out.sum()) - mass0) / mass0 < 1e-11


def test_rk2b_tracks_rk2():
    """On a smooth baroclinic-adjustment case the two split variants
    are different discretizations of the same equations — filtered
    velocities should agree closely over a few steps."""
    d, g, vg, cfg = setup(nk=2, f0=1e-4, nstep=24)
    rng = np.random.default_rng(7)
    x = (np.arange(40) - 4 + 0.5) / 32.0
    bump = 20.0 * np.exp(-((x[None, :] - 0.5) ** 2
                           + (x[:, None] - 0.5) ** 2) / 0.05)
    h_int = np.stack([500.0 + bump, 500.0 - bump])
    h = d.fill_halos(jnp.asarray(h_int))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    dt = 600.0
    # RK2 path (u is instantaneous; compare its filtered u_av)
    st_a = st
    sp_a = init_split_state(d, g, vg, st_a)
    # RK2b path (u IS the filtered velocity)
    st_b = st
    sp_b = init_split_b_state(d, g, vg, st_b)
    for _ in range(5):
        st_a, sp_a, _ = step_dyn_split_rk2(d, g, vg, st_a, sp_a,
                                           MechForcing(), dt, cfg)
        st_b, sp_b, _ = step_dyn_split_rk2b(d, g, vg, st_b, sp_b,
                                            MechForcing(), dt, cfg)
    ua = np.asarray(d.interior(sp_a.u_av))
    ub = np.asarray(d.interior(st_b.u))
    scale = max(np.abs(ua).max(), 1e-12)
    assert np.abs(ua - ub).max() / scale < 0.15
    ha = np.asarray(d.interior(st_a.h))
    hb = np.asarray(d.interior(st_b.h))
    assert np.abs(ha - hb).max() / 500.0 < 5e-3


def test_rk2b_model_from_config():
    """SPLIT_RK2B=True from MOM_input steps through the solo model."""
    from mom6_tpu.model import build_model
    from mom6_tpu.framework.config import ParamFile
    m = build_model(ParamFile(text="""
SPLIT = True
SPLIT_RK2B = True
NIGLOBAL = 16
NJGLOBAL = 16
NK = 2
GRID_CONFIG = "cartesian"
LENLON = 160.0
LENLAT = 160.0
AXIS_UNITS = "k"
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 1000.0
THICKNESS_CONFIG = "uniform"
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
REENTRANT_X = True
REENTRANT_Y = True
DT = 300.0
DAYMAX = 0.01
GINT = 0.0098
"""))
    assert isinstance(m.split_state, SplitBDynState)
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.h)))
    assert isinstance(a, SplitBDynState)
