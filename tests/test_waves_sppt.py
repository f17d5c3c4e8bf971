"""Surface-wave (Langmuir) mixing enhancement and SPPT stochastic
physics perturbations wired through the model step."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 10
DT = 900.0
DT_THERM = 900.0
DAYMAX = 0.02
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 100.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 0.05
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
USE_KPP = True
WIND_CONFIG = constant
TAUX_MAGNITUDE = 0.2
BUOY_CONFIG = const_heat
SENSIBLE_HEAT_FLUX = -100.0
"""


def _run(extra, n=4):
    m = build_model(ParamFile(text=BASE + extra))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(n):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.T)))
    return m, s


def test_langmuir_enhancement_deepens_mixing():
    m0, s0 = _run("")
    m1, s1 = _run("USE_WAVES = True\n")
    assert m1.ocean_cfg.diabatic.use_waves
    # enhanced boundary-layer mixing under wind+cooling mixes the
    # linear T profile further: surface T drops more (entrainment of
    # colder water) or at minimum the states diverge
    dT = np.abs(np.asarray(s1.T) - np.asarray(s0.T))
    assert dT.max() > 1e-9


def test_langmuir_factor_properties():
    from mom6_tpu.param.waves.wave_interface import (
        langmuir_number, langmuir_enhancement)
    us = jnp.asarray([0.0, 0.05, 0.2])
    ustar = jnp.full_like(us, 0.01)
    la = langmuir_number(ustar, us)
    enh = np.asarray(langmuir_enhancement(la))
    assert enh[0] == pytest.approx(1.0, abs=1e-6)   # no waves
    assert enh[2] > enh[1] > 1.0                    # stronger waves →
    #                                                 more enhancement


def test_sppt_perturbs_and_is_reproducible():
    m0, s0 = _run("")
    m1, s1 = _run("DO_SPPT = True\nSPPT_AMPLITUDE = 0.8\n")
    m2, s2 = _run("DO_SPPT = True\nSPPT_AMPLITUDE = 0.8\n")
    m3, s3 = _run("DO_SPPT = True\nSPPT_AMPLITUDE = 0.8\n"
                  "SPPT_SEED = 777\n")
    # perturbed differs from deterministic
    assert np.abs(np.asarray(s1.T) - np.asarray(s0.T)).max() > 1e-10
    # same seed → bitwise reproducible
    np.testing.assert_array_equal(np.asarray(s1.T), np.asarray(s2.T))
    # different seed → different trajectory
    assert np.abs(np.asarray(s3.T) - np.asarray(s1.T)).max() > 1e-12


def test_sppt_factor_bounded_and_zero_mean_tendency_scaling():
    """The SPPT multiplier stays within 1 ± a·clip, and a zero
    tendency stays exactly zero (multiplicative perturbation)."""
    from mom6_tpu.param.stochastic.stochastics import (
        StochasticsCfg, init_pattern, apply_sppt)
    from mom6_tpu.parallel.domain import Domain
    cfg = StochasticsCfg(do_sppt=True, sppt_amplitude=0.8)
    d = Domain(ni=16, nj=16, halo=2, reentrant_x=True,
               reentrant_y=True)
    pat = init_pattern(d, cfg, 3)
    tend = jnp.ones((3, d.njh, d.nih))
    out = np.asarray(apply_sppt(cfg, tend, pat))
    assert out.max() <= 1.0 + 0.8 * cfg.clip + 1e-12
    assert out.min() >= 1.0 - 0.8 * cfg.clip - 1e-12
    np.testing.assert_array_equal(
        np.asarray(apply_sppt(cfg, jnp.zeros_like(tend), pat)), 0.0)


def test_stoch_eos_perturbs_pgf():
    """STOCH_EOS: exp(a*pattern) multiplies the Stanley variance in
    the pressure force (MOM_stoch_eos.F90:254)."""
    extra = ("USE_STANLEY_PGF = True\nSTANLEY_COEFF = 10.0\n"
             "STOCH_EOS = True\nSTANLEY_A = 2.0\n")
    m1, s1 = _run(extra, n=2)                     # wiring smoke
    assert m1.ocean_cfg.stoch_eos
    assert m1.split_cfg.stoch_eos_a == 2.0

    # direct check with a real horizontal T gradient and a pattern
    import dataclasses as dc
    from mom6_tpu.core.pressure_force import (PressureForceCfg,
                                              pressure_force)
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.eos import make_eos
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 1000.0), max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=3)
    eos = make_eos("WRIGHT")
    h = jnp.full((3, d.njh, d.nih), 300.0)
    T = d.fill_halos(
        10.0 + 2.0 * jnp.sin(2 * jnp.pi * jnp.arange(d.nih)
                             / d.nih)[None, None, :]
        * jnp.ones((3, d.njh, d.nih)))
    S = jnp.full((3, d.njh, d.nih), 35.0)
    cfgp = PressureForceCfg(stanley_coeff=40.0)
    base = pressure_force(g, vg, h, T, S, eos, cfg=cfgp)
    pat = jnp.ones_like(h[0]) * 0.5
    pert = pressure_force(g, vg, h, T, S, eos, cfg=cfgp,
                          varT_mult=jnp.exp(2.0 * pat))
    dpf = np.abs(np.asarray(pert.PFu - base.PFu)).max()
    assert dpf > 1e-12 * np.abs(np.asarray(base.PFu)).max()
