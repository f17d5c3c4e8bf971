"""Non-Boussinesq (specific-volume) pressure force and model mode.

The semi-Boussinesq design carries h in meters-equivalent units with
mass = Rho0*h, so the non-Boussinesq switch is exercised through:

* the no-motion state: flat isopycnals + a fully compressible EOS must
  give exactly zero PFu/PFv (PressureForce_FV_nonBouss's reason for
  integrating geopotential up from the bottom);
* convergence to the Boussinesq form when density anomalies are small;
* pbce structure (Set_pbce_nonBouss);
* a full model run with BOUSSINESQ=False conserving mass to roundoff.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import (
    pressure_force, PressureForceCfg)
from mom6_tpu.eos import LinearEOS, WrightEOS
from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model


def setup(nk=4, boussinesq=False):
    d = Domain(ni=16, nj=12, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=1600.0, lenlat_km=1200.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01, boussinesq=boussinesq)
    return d, g, vg


def test_nonbouss_flat_state_zero_force_compressible():
    """Flat interfaces + vertically varying T/S + WRIGHT (compressible)
    EOS: the specific-volume form must produce no spurious motion."""
    d, g, vg = setup()
    h = d.fill_halos(d.pad(jnp.full((4, 12, 16), 1000.0)))
    T = d.fill_halos(d.pad(jnp.broadcast_to(
        jnp.array([15.0, 10.0, 5.0, 2.0]).reshape(-1, 1, 1),
        (4, 12, 16))))
    S = d.fill_halos(d.pad(jnp.full((4, 12, 16), 35.0)))
    for quad in (1, 5):
        res = pressure_force(g, vg, h, T, S, WrightEOS(),
                             cfg=PressureForceCfg(quad_points=quad))
        np.testing.assert_allclose(np.asarray(d.interior(res.PFu)), 0.0,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(d.interior(res.PFv)), 0.0,
                                   atol=1e-10)
        assert np.all(np.isfinite(np.asarray(d.interior(res.pbce))))


def _tilted_state(d, nk=4):
    key = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    tilt = 2.0 * np.cos(key)[None, None, :] + \
        1.5 * np.sin(np.linspace(0, 2 * np.pi, 12))[None, :, None]
    h = np.full((nk, 12, 16), 1000.0) + tilt
    # T horizontally uniform: horizontal in-situ density variations
    # would make the two modes' geometric states differ at
    # O(h*drho/rho0), swamping the convergence being tested
    T = np.broadcast_to(
        np.array([15.0, 10.0, 5.0, 2.0]).reshape(-1, 1, 1),
        (nk, 12, 16)).copy()
    S = np.full((nk, 12, 16), 35.0)
    pad = lambda a: d.fill_halos(d.pad(jnp.asarray(a)))
    return pad(h), pad(T), pad(S)


def test_nonbouss_matches_bouss_small_anomaly():
    """With an incompressible linear EOS and O(1e-3) relative density
    anomalies, the non-Boussinesq PGF must agree with the Boussinesq
    one to O(drho/rho0)."""
    d, g, _ = setup()
    vgb = VerticalGrid.uniform(nk=4, gint=0.01, boussinesq=True)
    vgn = VerticalGrid.uniform(nk=4, gint=0.01, boussinesq=False)
    h, T, S = _tilted_state(d)
    # center the mean in-situ density on RHO_0 so the modes converge:
    # rho = 1035 at (T=8, S=35); anomalies are ~1.3e-3 relative
    eos = LinearEOS(rho_t0_s0=1035.0 - 0.8 * 35.0 + 0.2 * 8.0)
    cfg = PressureForceCfg(quad_points=1)
    rb = pressure_force(g, vgb, h, T, S, eos, cfg=cfg)
    rn = pressure_force(g, vgn, h, T, S, eos, cfg=cfg)
    scale = float(jnp.max(jnp.abs(d.interior(rb.PFu)))) + 1e-30
    du = np.asarray(d.interior(rn.PFu - rb.PFu))
    dv = np.asarray(d.interior(rn.PFv - rb.PFv))
    assert np.max(np.abs(du)) / scale < 5e-3
    assert np.max(np.abs(dv)) / scale < 5e-3
    # pbce agrees to the same order (both ~ g at the surface)
    pb = np.asarray(d.interior(rb.pbce))
    pn = np.asarray(d.interior(rn.pbce))
    np.testing.assert_allclose(pn, pb, rtol=6e-3)
    # eta is the same mass-equivalent free surface in both modes
    np.testing.assert_allclose(np.asarray(d.interior(rn.eta_pf)),
                               np.asarray(d.interior(rb.eta_pf)),
                               atol=1e-9)


def test_nonbouss_layered_no_eos():
    """Layered (no-EOS) non-Boussinesq path: flat state is motionless
    and pbce decreases monotonically with depth for a stable
    stratification (alpha decreasing downward)."""
    d, g, vg = setup()
    h = d.fill_halos(d.pad(jnp.full((4, 12, 16), 1000.0)))
    res = pressure_force(g, vg, h)
    np.testing.assert_allclose(np.asarray(d.interior(res.PFu)), 0.0,
                               atol=1e-10)
    pbce = np.asarray(d.interior(res.pbce))
    assert np.all(pbce[:-1] >= pbce[1:] - 1e-12)
    assert np.all(pbce > 0.0)


BASE = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 4
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
TS_CONFIG = linear
T_RANGE = 8.0
S_RANGE = 0.0
EQN_OF_STATE = WRIGHT
BULKMIXEDLAYER = False
BOUSSINESQ = False
WIND_CONFIG = gyres
"""


def test_nonbouss_model_runs_and_conserves_mass():
    m = build_model(ParamFile(text=BASE))
    assert not m.vgrid.boussinesq
    d = m.domain
    area = d.interior(m.grid.areaT * m.grid.mask2dT)
    mass0 = float(jnp.sum(d.interior(m.state.h).sum(0) * area)
                  * m.vgrid.Rho0)
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    mass1 = float(jnp.sum(d.interior(s.h).sum(0) * area) * m.vgrid.Rho0)
    assert abs(mass1 - mass0) / mass0 < 1e-13
    assert np.all(np.isfinite(np.asarray(d.interior(s.u))))
    # the flow must actually have spun up (PGF+wind did something)
    assert float(jnp.max(jnp.abs(d.interior(s.u)))) > 0.0


def test_nonbouss_rejects_stanley():
    with pytest.raises(ValueError, match="STANLEY"):
        build_model(ParamFile(text=BASE + "USE_STANLEY_PGF = True\n"
                              "STANLEY_COEFF = 0.5\n"))
