import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.oda.ensemble import (EnsembleCfg, propagate_ensemble,
                                   ensemble_stats, enkf_analysis,
                                   IncrementalUpdate)
from mom6_tpu.tracer.particles import (init_particles, advect_particles)
from mom6_tpu.param.vertical.full_convection import (FullConvectionCfg,
                                                     full_convection)
from mom6_tpu.eos import LinearEOS

EOS = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)


def test_ensemble_propagate_and_stats():
    def step(x):
        return x * 0.5 + 1.0
    states = jnp.asarray([[0.0], [4.0], [8.0], [12.0]])
    out = propagate_ensemble(step, states, n_steps=1)
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               [1.0, 3.0, 5.0, 7.0])
    mean, spread = ensemble_stats(out)
    assert abs(float(mean[0]) - 4.0) < 1e-12
    assert float(spread[0]) > 0.0


def test_enkf_pulls_toward_observation():
    rng = np.random.default_rng(0)
    ne, n = 20, 16
    truth = np.linspace(0, 1, n)
    ens = jnp.asarray(truth[None] + 0.5 * rng.standard_normal((ne, n)))
    cfg = EnsembleCfg(ensemble_size=ne, obs_error=0.05)
    obs_idx = 5
    out = enkf_analysis(cfg, ens, obs_value=truth[obs_idx],
                        obs_index=obs_idx)
    err0 = abs(float(jnp.mean(ens[:, obs_idx])) - truth[obs_idx])
    err1 = abs(float(jnp.mean(out[:, obs_idx])) - truth[obs_idx])
    assert err1 < err0
    # spread at the observed point shrinks
    assert float(jnp.std(out[:, obs_idx])) < float(jnp.std(ens[:, obs_idx]))


def test_incremental_update():
    inc = IncrementalUpdate(increment={"T": jnp.full((2,), 4.0)},
                            n_steps=4)
    f = {"T": jnp.zeros(2), "S": jnp.ones(2)}
    for s in range(6):
        f = inc.apply(f, s)
    np.testing.assert_allclose(np.asarray(f["T"]), 4.0)   # full inc
    np.testing.assert_allclose(np.asarray(f["S"]), 1.0)   # untouched


def test_particles_uniform_flow():
    d = Domain(ni=32, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=320.0, lenlat_km=160.0)
    dx = float(g.dxT[5, 5])
    shape = (1, 24, 40)
    u = jnp.full(shape, 1.0)
    v = jnp.zeros(shape)
    p = init_particles([4.0, 10.5], [8.0, 3.25])
    dt = 0.5 * dx        # move half a cell per step
    for _ in range(8):
        p = advect_particles(d, g, p, u, v, dt)
    x = np.asarray(p.x)
    np.testing.assert_allclose(x, [4.0 + 4.0, 10.5 + 4.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.y), [8.0, 3.25], atol=1e-6)


def test_particles_wrap():
    d = Domain(ni=16, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=80.0)
    dx = float(g.dxT[5, 5])
    u = jnp.full((1, 16, 24), 1.0)
    v = jnp.zeros_like(u)
    p = init_particles([15.5], [4.0])
    p = advect_particles(d, g, p, u, v, dt=1.0 * dx)
    assert 0.0 <= float(p.x[0]) < 1.0      # wrapped around


def test_full_convection_stabilizes():
    col = lambda a: jnp.asarray(np.asarray(a, np.float64)).reshape(
        -1, 1, 1)
    h = col([20.0] * 6)
    # cold over warm → unstable
    T = col([2.0, 4.0, 6.0, 8.0, 10.0, 12.0])
    S = col([35.0] * 6)
    T2, S2 = full_convection(FullConvectionCfg(), T, S, h, EOS)
    # heat conserved
    assert abs(float(jnp.sum(T2 * h)) - float(jnp.sum(T * h))) < 1e-10
    # resulting column is stable (density nondecreasing downward)
    rho = np.asarray(EOS.density(T2, S2, jnp.zeros_like(T2))).ravel()
    assert np.all(np.diff(rho) >= -1e-4)   # residual instability tiny
    # fully unstable column homogenizes (pairwise diffusion converges
    # geometrically; 2·nk² sweeps leaves ~1e-4 residual)
    np.testing.assert_allclose(np.asarray(T2).ravel(), 7.0, atol=1e-3)


def test_oda_driver_twin_experiment():
    """The forecast-analysis loop (oda/driver.py, the MOM_oda_driver
    cycle analog): assimilating SST observations from a known truth
    pulls the ensemble-mean SST toward it and keeps spread bounded."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    from mom6_tpu.oda.ensemble import EnsembleCfg
    from mom6_tpu.oda.driver import run_oda_cycles
    text = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 3
DT = 900.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 600.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_REF = 10.0
T_RANGE = 4.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
ADIABATIC = True
"""
    m = build_model(ParamFile(text=text))
    d = m.domain
    jo, io = d.halo + 6, d.halo + 6
    truth = 12.0                       # "observed" steady SST
    cfgE = EnsembleCfg(ensemble_size=6, obs_error=0.05,
                       inflation=1.0)
    run = run_oda_cycles(m, cfgE, n_cycles=5, steps_per_cycle=2,
                         obs_values=[truth] * 5, obs_ji=(jo, io),
                         t_pert=1.0)
    # the ensemble mean marches toward the observation
    e0 = abs(run.sst_mean[0] - truth)
    e1 = abs(run.sst_mean[-1] - truth)
    assert e1 < 0.5 * e0 or e1 < 0.05
    assert all(np.isfinite(s) for s in run.sst_spread)
    # perturbed-obs EnKF equilibrates the spread near the obs error,
    # far below the initial 1-degree perturbation scale
    assert run.sst_spread[-1] < 0.2
