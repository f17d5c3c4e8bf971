import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.io import (write_fields, read_field,
                                   field_names)
from mom6_tpu.param.lateral.tidal_forcing import (TidalForcingCfg,
                                                  equilibrium_tide,
                                                  scalar_sal)
from mom6_tpu.param.vertical.kappa_shear import (KappaShearCfg,
                                                 kappa_shear_coeffs)
from mom6_tpu.param.waves.wave_interface import (WavesCfg,
                                                 stokes_profile,
                                                 langmuir_number,
                                                 langmuir_enhancement)
from mom6_tpu.ice_shelf.thermo import (IceShelfCfg, three_equation_melt,
                                       shelf_draft)
from mom6_tpu.diagnostics.wave_speed import brunt_vaisala2
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.eos import LinearEOS


def col(a):
    return jnp.asarray(np.asarray(a, dtype=np.float64)).reshape(-1, 1, 1)


def test_netcdf_roundtrip(tmp_path):
    path = str(tmp_path / "t.nc")
    a = np.arange(24.0).reshape(4, 6)
    b = np.linspace(0, 1, 6)
    write_fields(path, {"depth": a, "x": b},
                 dims={"depth": ("ny", "nx"), "x": ("nx",)},
                 attrs={"depth": {"units": "m"}})
    np.testing.assert_array_equal(read_field(path, "depth"), a)
    np.testing.assert_allclose(read_field(path, "x"), b)
    assert set(field_names(path)) == {"depth", "x"}
    with pytest.raises(KeyError):
        read_field(path, "nope")


def test_equilibrium_tide_m2():
    cfg = TidalForcingCfg(constituents=("M2",))
    lat = jnp.asarray([[0.0]])
    lon = jnp.asarray([[0.0]])
    om = 1.40519e-4
    e0 = float(equilibrium_tide(cfg, 0.0, lat, lon)[0, 0])
    # amplitude at equator = Love * 0.2423
    assert abs(e0 - 0.693 * 0.242334) < 1e-6
    # period: value repeats after 2π/ω
    e1 = float(equilibrium_tide(cfg, 2 * np.pi / om, lat, lon)[0, 0])
    assert abs(e1 - e0) < 1e-9
    # poles: semidiurnal vanishes
    ep = float(equilibrium_tide(cfg, 0.0, jnp.asarray([[90.0]]),
                                lon)[0, 0])
    assert abs(ep) < 1e-12
    assert abs(float(scalar_sal(TidalForcingCfg(), jnp.asarray(1.0)))
               - 0.094) < 1e-12


def test_kappa_shear_behavior():
    vg = VerticalGrid.uniform(nk=8, gint=0.01)
    eos = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)
    h = col([20.0] * 8)
    S = col([35.0] * 8)
    u_sheared = col(np.linspace(0.8, -0.8, 8))
    v = jnp.zeros_like(u_sheared)
    T_weak = col(np.linspace(10.0, 9.95, 8))
    T_strong = col(np.linspace(20.0, 4.0, 8))
    n2w = brunt_vaisala2(vg, h, T_weak, S, eos)
    n2s = brunt_vaisala2(vg, h, T_strong, S, eos)
    k_w = kappa_shear_coeffs(KappaShearCfg(), u_sheared, v, h, n2w)
    k_s = kappa_shear_coeffs(KappaShearCfg(), u_sheared, v, h, n2s)
    assert float(jnp.max(k_w)) > 1e-4          # vigorous mixing
    assert float(jnp.max(k_s)) < float(jnp.max(k_w)) * 0.5
    # no shear → no mixing above seed
    k_0 = kappa_shear_coeffs(KappaShearCfg(), jnp.zeros_like(u_sheared),
                             v, h, n2w)
    assert float(jnp.max(k_0)) < 1e-5


def test_stokes_and_langmuir():
    h = col([5.0] * 10)
    u10 = jnp.full((1, 1), 10.0)
    res = stokes_profile(WavesCfg(), h, u10=u10)
    us = np.asarray(res.us).ravel()
    np.testing.assert_allclose(float(res.us0[0, 0]), 0.16, rtol=1e-12)
    assert np.all(np.diff(us) < 0)             # monotone decay
    assert us[0] > 0.01 and us[-1] < 1e-3
    la = langmuir_number(jnp.asarray(0.01), res.us0)
    assert 0.1 < float(la[0, 0]) < 1.0
    f = langmuir_enhancement(la)
    assert float(f[0, 0]) > 1.0                # enhancement


def test_three_equation_melt():
    cfg = IceShelfCfg()
    # warm water (+1C) at 500 dbar under ice → melting
    t_w = jnp.asarray([[1.0]])
    s_w = jnp.asarray([[34.5]])
    p_b = jnp.asarray([[5.0e6]])
    r = three_equation_melt(cfg, t_w, s_w, p_b)
    melt = float(r.melt[0, 0])
    assert melt > 0.0
    # melt rate in m/yr of ice: plausibly 0.1..100
    m_yr = melt / cfg.rho_ice * 86400 * 365
    assert 0.05 < m_yr < 200.0, m_yr
    # boundary layer is fresher and at the (depressed) freezing point
    assert float(r.s_b[0, 0]) < 34.5
    assert float(r.t_b[0, 0]) < 0.0
    # very cold water at surface pressure → near-zero or refreezing
    r2 = three_equation_melt(cfg, jnp.asarray([[-2.5]]),
                             s_w, jnp.asarray([[0.0]]))
    assert float(r2.melt[0, 0]) < melt
    # masked: no flux outside the shelf
    r3 = three_equation_melt(cfg, t_w, s_w, p_b,
                             shelf_mask=jnp.asarray([[0.0]]))
    assert float(r3.melt[0, 0]) == 0.0


def test_ssa_ice_tongue_extends():
    """A floating ice tongue thinning seaward must extend (du/dx > 0,
    u increasing toward the front) under the SSA balance."""
    from mom6_tpu.ice_shelf.dynamics import SSACfg, ssa_velocity_solve
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    d = Domain(ni=24, nj=8, halo=4)
    g = cartesian_grid(d, lenlon_km=120.0, lenlat_km=40.0)
    x = np.arange(32)
    # thickness ramps from 800 m at the grounding line to 200 m
    hsh = np.clip(800.0 - 25.0 * (x - 4), 200.0, 800.0)
    h_shelf = jnp.asarray(np.broadcast_to(hsh, (16, 32)).copy())
    # pin the outer ring (the stencils wrap; an unmasked seam couples
    # the two ends and leaves a rigid-body null space)
    m = np.ones((16, 32))
    m[:4] = m[-4:] = 0
    m[:, :4] = m[:, -4:] = 0
    mask = jnp.asarray(m)
    res = ssa_velocity_solve(SSACfg(), g, h_shelf, mask)
    u = np.asarray(d.interior(res.u))[4]
    assert np.all(np.isfinite(u))
    # flow is seaward (+x, downslope of the surface) throughout the
    # ramp, fastest where the surface slope lives
    assert u[8] > 0.0 and u[14] > 0.0
    assert np.max(u) > 0.01          # an ice-stream-like speed exists
    # viscosity is positive and finite
    assert float(jnp.min(res.visc)) > 0.0


def test_kappa_shear_jhl_structure():
    """The JHL steady system (find_kappa_tke): kappa is zero above the
    critical Richardson number, grows with shear below it, decays
    toward the boundaries through the L_bdry length scale, and the
    TKE/kappa alternation converges (insensitive to extra sweeps)."""
    import dataclasses as _dc
    from mom6_tpu.param.vertical.kappa_shear import (KappaShearCfg,
                                                     kappa_shear_coeffs)
    nk, nj, ni = 16, 2, 2
    h = jnp.full((nk, nj, ni), 25.0)
    z = (jnp.arange(nk) + 0.5) * 25.0
    # linear shear du/dz = 4e-3 -> S2 = 1.6e-5
    u = jnp.broadcast_to((4.0e-3 * z).reshape(-1, 1, 1),
                         (nk, nj, ni)) + jnp.zeros((nk, nj, ni))
    v = jnp.zeros((nk, nj, ni))
    cfg = KappaShearCfg()
    s2 = 1.6e-5
    # subcritical Ri = 0.1 -> active mixing
    n2_sub = jnp.full((nk - 1, nj, ni), 0.1 * s2)
    k_sub = kappa_shear_coeffs(cfg, u, v, h, n2_sub)
    # supercritical Ri = 0.5 -> no mixing at all
    n2_sup = jnp.full((nk - 1, nj, ni), 0.5 * s2)
    k_sup = kappa_shear_coeffs(cfg, u, v, h, n2_sup)
    assert float(jnp.max(k_sub)) > 1e-5
    np.testing.assert_allclose(np.asarray(k_sup), 0.0, atol=1e-12)
    # boundary decay: interior maximum, smaller near top/bottom
    prof = np.asarray(k_sub[:, 0, 0])
    assert prof[nk // 2 - 1] > prof[0]
    assert prof[nk // 2 - 1] > prof[-1]
    # converged: 8 vs 16 sweeps agree closely
    k_16 = kappa_shear_coeffs(_dc.replace(cfg, max_rino_it=16),
                              u, v, h, n2_sub)
    np.testing.assert_allclose(np.asarray(k_16), np.asarray(k_sub),
                               rtol=3e-2, atol=1e-6)


def test_tidal_mixing_polzin_profile():
    """INT_TIDE_PROFILE=POLZIN_09: the algebraic bottom-intensified
    deposition integrates to the same total energy as STLAURENT_02
    but decays more slowly away from the bottom."""
    import dataclasses as _dc
    from mom6_tpu.param.vertical.tidal_mixing import (TidalMixingCfg,
                                                      tidal_mixing_coeffs)
    nk = 20
    h = jnp.full((nk, 2, 2), 200.0)
    n2 = jnp.full((nk - 1, 2, 2), 1e-5)
    e = jnp.full((2, 2), 1e-2)
    cfg_s = TidalMixingCfg(kd_max=1e9)
    cfg_p = _dc.replace(cfg_s, profile="POLZIN_09")
    kd_s = np.asarray(tidal_mixing_coeffs(cfg_s, h, n2, e))
    kd_p = np.asarray(tidal_mixing_coeffs(cfg_p, h, n2, e))
    # same column-integrated buoyancy-flux budget (same q*Gamma*E):
    # sum(kd * N2 * dz) equal for both normalized profiles
    dz = 200.0
    tot_s = (kd_s[:, 0, 0] * 1e-5 * dz).sum()
    tot_p = (kd_p[:, 0, 0] * 1e-5 * dz).sum()
    # interior-interface sampling misses the near-bottom peak of
    # each normalized profile differently; agreement is to the
    # discretization, not roundoff
    np.testing.assert_allclose(tot_p, tot_s, rtol=0.2)
    # Polzin carries more mixing into the upper column
    assert kd_p[2, 0, 0] > kd_s[2, 0, 0]
    # St Laurent is stronger right at the bottom
    assert kd_s[-1, 0, 0] > kd_p[-1, 0, 0]
