"""Internal tide energy propagation (MOM_internal_tides.F90
re-design): angular refraction, group-velocity advection, drag
losses, and the coupling into the tidal-mixing dissipation map."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.param.lateral.internal_tides import (
    InternalTidesCfg, step_internal_tides, init_en, f2_at_h)

NI, NJ, H = 20, 16, 4


def _setup(f0=5e-5, beta=0.0):
    d = Domain(ni=NI, nj=NJ, halo=H, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=2000.0, lenlat_km=1600.0, f0=f0,
                       beta=beta, depth_fn=lambda lo, la:
                       np.full_like(la, 4000.0), max_depth=4000.0)
    return d, g


def test_energy_input_and_conservation_without_losses():
    """Source only, no drags: total energy grows by exactly
    (1-q)·∫TKE dA dt and advection conserves it."""
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=12, apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.full((d.njh, d.nih), 2e-3)
    tke = jnp.full((d.njh, d.nih), 1e-3)       # W m-2
    dt = 3600.0
    area = np.asarray(d.interior(g.areaT))
    tot0 = 0.0
    for n in range(3):
        r = step_internal_tides(cfg, d, g, En, cn, dt, tke, nb, htot)
        En = r.En
    tot = float((np.asarray(d.interior(r.tot_En)) * area).sum())
    expect = 3 * dt * (1.0 - cfg.q_itides) * 1e-3 * area.sum()
    np.testing.assert_allclose(tot, expect, rtol=1e-9)
    assert np.all(np.asarray(En) >= 0.0)


def test_propagation_moves_energy_outward():
    """A point source radiates: energy appears away from the source
    after propagation at cg ≈ cn·sqrt(1-f²/ω²)."""
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=16, apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    jc, ic = H + NJ // 2, H + NI // 2
    En = En.at[:, :, :, jc, ic].set(1.0e3 / cfg.n_angle)
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.zeros((d.njh, d.nih))
    dt = 20000.0                                # cg·dt ≈ 40 km < dx
    r = step_internal_tides(cfg, d, g, En, cn, dt,
                            jnp.zeros_like(htot), nb, htot)
    E2 = np.asarray(r.tot_En)
    # neighbors on all four sides received energy
    assert E2[jc, ic + 1] > 0 and E2[jc, ic - 1] > 0
    assert E2[jc + 1, ic] > 0 and E2[jc - 1, ic] > 0
    # and the total is conserved (periodic, lossless)
    area = np.asarray(g.areaT)
    tot0 = 1.0e3 * area[jc, ic]
    tot1 = float((np.asarray(d.interior(r.tot_En))
                  * np.asarray(d.interior(g.areaT))).sum())
    np.testing.assert_allclose(tot1, tot0, rtol=1e-9)


def test_sub_inertial_band_gets_no_input():
    """Where ω² < f², tidal energy cannot propagate and no input is
    deposited (the reference's f2 gate)."""
    d, g = _setup(f0=2e-4)                      # f > M2 frequency
    cfg = InternalTidesCfg(n_angle=8, apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    r = step_internal_tides(cfg, d, g, En,
                            jnp.full((d.njh, d.nih), 2.0), 3600.0,
                            jnp.full((d.njh, d.nih), 1e-3),
                            jnp.zeros((d.njh, d.nih)),
                            jnp.full((d.njh, d.nih), 4000.0))
    assert float(jnp.max(r.tot_En)) == 0.0


def test_drags_remove_energy_and_report_losses():
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=8, apply_bottom_drag=True,
                           apply_wave_drag=True)
    En = init_en(cfg, (d.njh, d.nih)) + 100.0   # J m-2 everywhere
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.full((d.njh, d.nih), 2e-3)
    r = step_internal_tides(cfg, d, g, En, cn, 3600.0,
                            jnp.zeros_like(htot), nb, htot,
                            u_bt2=0.01 ** 2)
    assert float(jnp.max(r.tot_En)) < 800.0    # decayed from 800
    assert float(jnp.max(r.itidal_loss)) > 0.0
    assert float(jnp.max(r.quad_loss)) > 0.0


def test_refraction_on_beta_plane_shifts_angles():
    """With beta, refraction redistributes energy among wedges."""
    d, g = _setup(f0=5e-5, beta=2e-11)
    cfg = InternalTidesCfg(n_angle=12, apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    En = En.at[:, :, 3].set(100.0)             # all energy in wedge 3
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    r = step_internal_tides(cfg, d, g, En, cn, 43200.0,
                            jnp.zeros_like(htot),
                            jnp.zeros((d.njh, d.nih)), htot)
    spread = np.asarray(jnp.sum(jnp.abs(r.En), axis=(0, 1, 3, 4)))
    assert (spread > 1e-6).sum() > 1           # leaked to neighbors


def test_internal_tides_in_model():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    text = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 4
DT = 1800.0
DT_THERM = 1800.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 1200.0
LENLAT = 1000.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 4000.0
F_0 = 5.0e-5
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 10.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
INTERNAL_TIDES = True
INTERNAL_TIDE_ANGLES = 8
UTIDE = 0.05
INT_TIDE_DISSIPATION = True
KD = 1.0e-5
"""
    m = build_model(ParamFile(text=text))
    assert m.ocean_cfg.int_tides is not None
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(3):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.T)))
    assert np.isfinite(float(jnp.sum(s.h)))


def test_reflection_conserves_and_reverses():
    """A full-reflectance meridional wall turns eastward wedges into
    westward ones without losing energy (reflect :1130)."""
    from mom6_tpu.param.lateral.internal_tides import reflect
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=8, apply_bottom_drag=False,
                           apply_wave_drag=False)
    na = cfg.n_angle
    En1 = jnp.zeros((na, d.njh, d.nih))
    jc, ic = H + NJ // 2, H + NI - 1
    En1 = En1.at[0, jc, ic].set(50.0)     # wedge 0: due east
    refl_angle = jnp.full((d.njh, d.nih), jnp.nan)
    # wall along the meridian with ocean to the west: the directed
    # tangent convention puts the wall angle at -pi/2 (3pi/2)
    refl_angle = refl_angle.at[:, ic].set(-np.pi / 2.0)
    pref = jnp.ones((d.njh, d.nih))
    out = reflect(cfg, En1, refl_angle, pref)
    before = float(jnp.sum(En1))
    after = float(jnp.sum(out))
    np.testing.assert_allclose(after, before, rtol=1e-12)
    # due-east (wedge 0) reflects to due-west (wedge na/2)
    assert float(out[0, jc, ic]) == 0.0
    np.testing.assert_allclose(float(out[na // 2, jc, ic]), 50.0)
    # partial reflectance splits the energy
    out2 = reflect(cfg, En1, refl_angle, 0.25 * pref)
    np.testing.assert_allclose(float(out2[0, jc, ic]), 37.5)
    np.testing.assert_allclose(float(out2[na // 2, jc, ic]), 12.5)
    # a ridge cell also reflects rays from the OTHER side
    En_w = jnp.zeros((na, d.njh, d.nih))
    En_w = En_w.at[na // 2, jc, ic].set(30.0)  # due west
    out3 = reflect(cfg, En_w, refl_angle, pref,
                   refl_dbl=jnp.ones((d.njh, d.nih), bool))
    np.testing.assert_allclose(float(out3[0, jc, ic]), 30.0)
    out4 = reflect(cfg, En_w, refl_angle, pref)   # one-sided wall
    np.testing.assert_allclose(float(out4[na // 2, jc, ic]), 30.0)


def test_higher_modes_propagate_slower():
    """Mode-2 energy advects at half the mode-1 group speed and the
    input partition follows ENERGY_FRACTION_PER_MODE."""
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=8, n_mode=2,
                           mode_fraction=(0.75, 0.25),
                           apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    assert En.shape[:2] == (1, 2)
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.zeros((d.njh, d.nih))
    tke = jnp.full((d.njh, d.nih), 1e-3)
    dt = 3600.0
    r = step_internal_tides(cfg, d, g, En, cn, dt, tke, nb, htot)
    tot_m = [float(np.asarray(d.interior(r.En[0, m])).sum())
             for m in range(2)]
    np.testing.assert_allclose(tot_m[0] / (tot_m[0] + tot_m[1]), 0.75,
                               rtol=1e-6)
    # point release: mode 1 spreads further than mode 2
    En = init_en(cfg, (d.njh, d.nih))
    jc, ic = H + NJ // 2, H + NI // 2
    En = En.at[:, :, :, jc, ic].set(100.0)
    r = step_internal_tides(cfg, d, g, En, cn, 30000.0,
                            jnp.zeros_like(htot), nb, htot)
    E1 = np.asarray(r.En[0, 0]).sum(axis=0)
    E2 = np.asarray(r.En[0, 1]).sum(axis=0)
    # the faster mode moved more energy off the source cell
    assert E1[jc, ic] < E2[jc, ic]
    assert E1[jc, ic + 1] > E2[jc, ic + 1]


def test_modal_wave_speeds_analytic():
    """wave_speeds (shifted inverse iteration on the interface
    eigenproblem, MOM_wave_speed.F90) reproduces the exact two-layer
    speed and the uniform-N discrete eigenvalues."""
    import math
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.diagnostics.wave_speed import wave_speeds
    from mom6_tpu.eos import LinearEOS
    eos = LinearEOS()
    rho0, g = 1035.0, 9.8
    # two-layer exact
    vg2 = VerticalGrid.uniform(nk=2)
    h2 = jnp.stack([jnp.full((2, 2), 1000.0), jnp.full((2, 2), 3000.0)])
    T2 = jnp.stack([jnp.full((2, 2), 12.0), jnp.full((2, 2), 4.0)])
    S2 = jnp.full((2, 2, 2), 35.0)
    c2 = float(np.asarray(wave_speeds(vg2, h2, T2, S2, eos))[0, 0, 0])
    gp = (g / rho0) * 0.2 * 8.0
    np.testing.assert_allclose(c2, math.sqrt(gp * 1000 * 3000 / 4000),
                               rtol=1e-12)
    # uniform N: discrete c_m = N h / sqrt(2(1-cos(m pi/nk)))
    nk, D, N = 50, 4000.0, 2e-3
    vg = VerticalGrid.uniform(nk=nk)
    h = jnp.full((nk, 2, 2), D / nk)
    dTdz = N ** 2 * rho0 / (g * 0.2)
    zc = (np.arange(nk) + 0.5) * D / nk
    T = jnp.asarray(np.broadcast_to(
        (dTdz * (D - zc))[:, None, None], (nk, 2, 2)).copy())
    S = jnp.full((nk, 2, 2), 35.0)
    c = np.asarray(wave_speeds(vg, h, T, S, eos, n_mode=3))
    for m in range(3):
        disc = N * (D / nk) / math.sqrt(
            2 * (1 - math.cos((m + 1) * math.pi / nk)))
        np.testing.assert_allclose(c[m, 0, 0], disc, rtol=1e-4)


def test_froude_drag_caps_supercritical_energy():
    """INT_TIDE_FROUDE_DRAG: where the modal velocity exceeds the
    phase speed (Fr > 1), the energy is rescaled by 1/Fr² and the
    loss reported."""
    d, g = _setup()
    cfg = InternalTidesCfg(n_angle=8, apply_bottom_drag=False,
                           apply_wave_drag=False,
                           apply_froude_drag=True)
    En = init_en(cfg, (d.njh, d.nih))
    # huge energy → Fr >> 1 with slow waves
    En = En.at[:, :].set(1.0e7 / cfg.n_angle)
    cn = jnp.full((d.njh, d.nih), 0.5)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.zeros((d.njh, d.nih))
    r = step_internal_tides(cfg, d, g, En, cn, 3600.0,
                            jnp.zeros_like(htot), nb, htot)
    # post-breaking: Fr <= 1, i.e. 2E/(rho0 D) <= c²
    ub2 = 2.0 * np.asarray(d.interior(r.tot_En)) / (1035.0 * 4000.0)
    assert np.all(ub2 <= 0.25 * 1.001)
    assert float(jnp.max(r.froude_loss)) > 0.0
    # subcritical energy untouched
    En2 = init_en(cfg, (d.njh, d.nih)).at[:, :].set(1.0 / cfg.n_angle)
    r2 = step_internal_tides(cfg, d, g, En2, cn, 3600.0,
                             jnp.zeros_like(htot), nb, htot)
    np.testing.assert_allclose(float(jnp.max(r2.froude_loss)), 0.0,
                               atol=1e-12)


def test_frequency_axis_partition_and_gating():
    """The frequency axis (En(freq, mode, angle, y, x)): forcing is
    partitioned by ENERGY_FRACTION_PER_FREQ, each bin propagates at
    its own omega, the sub-inertial gate acts per frequency, and the
    loss budgets are reported per frequency."""
    # f between K1 and M2: K1 (7.29e-5) is sub-inertial, M2 is not
    d, g = _setup(f0=1.0e-4)
    cfg = InternalTidesCfg(n_angle=8, freqs=(1.4052e-4, 7.2921e-5),
                           freq_fraction=(0.6, 0.4),
                           apply_bottom_drag=True,
                           apply_wave_drag=True)
    En = init_en(cfg, (d.njh, d.nih))
    assert En.shape[0] == 2
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.full((d.njh, d.nih), 2e-3)
    tke = jnp.full((d.njh, d.nih), 1e-3)
    r = step_internal_tides(cfg, d, g, En, cn, 3600.0, tke, nb, htot,
                            u_bt2=0.01 ** 2)
    tot_f = [float(np.asarray(d.interior(r.En[f])).sum())
             for f in range(2)]
    assert tot_f[0] > 0.0
    # K1 is sub-inertial everywhere here: its bin got no input
    np.testing.assert_allclose(tot_f[1], 0.0, atol=1e-12)
    # per-frequency loss budgets: all in the M2 bin
    assert r.itidal_loss_freq.shape[0] == 2
    assert float(jnp.max(r.itidal_loss_freq[0])) > 0.0
    np.testing.assert_allclose(
        float(jnp.max(r.itidal_loss_freq[1])), 0.0, atol=1e-20)
    # summed diagnostics equal the per-freq sums
    np.testing.assert_allclose(
        np.asarray(r.quad_loss),
        np.asarray(jnp.sum(r.quad_loss_freq, axis=0)), rtol=1e-12)


def test_frequency_bins_propagate_at_own_speed():
    """Lower-frequency bins have slower group speed cg = cn
    sqrt(1 - f^2/w^2): after one step the low bin leaves more energy
    on the source cell."""
    d, g = _setup(f0=5.0e-5)
    cfg = InternalTidesCfg(n_angle=8, freqs=(1.4052e-4, 6.0e-5),
                           freq_fraction=(0.5, 0.5),
                           apply_bottom_drag=False,
                           apply_wave_drag=False)
    En = init_en(cfg, (d.njh, d.nih))
    jc, ic = H + NJ // 2, H + NI // 2
    En = En.at[:, :, :, jc, ic].set(100.0)
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    r = step_internal_tides(cfg, d, g, En, cn, 30000.0,
                            jnp.zeros_like(htot),
                            jnp.zeros((d.njh, d.nih)), htot)
    Ehi = np.asarray(r.En[0, 0]).sum(axis=0)
    Elo = np.asarray(r.En[1, 0]).sum(axis=0)
    assert Ehi[jc, ic] < Elo[jc, ic]


def test_ppm_advection_conserves_and_sharpens():
    """The PPM horizontal scheme conserves energy and diffuses a
    point release less than first-order upwind."""
    d, g = _setup()
    base = dict(n_angle=8, apply_bottom_drag=False,
                apply_wave_drag=False)
    jc, ic = H + NJ // 2, H + NI // 2
    cn = jnp.full((d.njh, d.nih), 2.0)
    htot = jnp.full((d.njh, d.nih), 4000.0)
    nb = jnp.zeros((d.njh, d.nih))
    outs = {}
    for scheme in ("upwind_1st", "ppm"):
        # an eastward beam (all energy in wedge 0) on an f=0 plane:
        # pure 1D transport, so peak retention isolates the scheme's
        # numerical diffusion
        d0, g0 = _setup(f0=0.0)
        cfg = InternalTidesCfg(scheme=scheme, **base)
        En = init_en(cfg, (d0.njh, d0.nih))
        En = En.at[:, :, 0, jc, ic].set(1.0e3)
        r = step_internal_tides(cfg, d0, g0, En, cn, 20000.0,
                                jnp.zeros_like(htot), nb, htot)
        for _ in range(3):
            r = step_internal_tides(cfg, d0, g0, r.En, cn, 20000.0,
                                    jnp.zeros_like(htot), nb, htot)
        outs[scheme] = np.asarray(d0.interior(r.tot_En))
    area = np.asarray(d.interior(g.areaT))
    t_up = (outs["upwind_1st"] * area).sum()
    t_pp = (outs["ppm"] * area).sum()
    np.testing.assert_allclose(t_pp, t_up, rtol=1e-9)
    # PPM keeps more energy near the peak (less numerical diffusion)
    assert outs["ppm"].max() > outs["upwind_1st"].max()
