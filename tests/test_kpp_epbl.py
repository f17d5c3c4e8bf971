"""Column tests of the CVMix-fidelity KPP and the energetic PBL
against the published LMD94 limits and energetic expectations."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.param.vertical.kpp import (KPPCfg, kpp_coefficients,
                                         _phi_m, _phi_s, _w_scales)
from mom6_tpu.param.vertical.energetic_pbl import (EPBLCfg,
                                                   energetic_pbl)
from mom6_tpu.eos import make_eos

_K = 0.4   # von Karman


def test_stability_functions_lmd94_limits():
    # neutral: φ = 1
    assert float(_phi_m(jnp.asarray(0.0))) == 1.0
    assert float(_phi_s(jnp.asarray(0.0))) == 1.0
    # stable branch: 1 + 5ζ
    np.testing.assert_allclose(float(_phi_m(jnp.asarray(0.2))), 2.0)
    np.testing.assert_allclose(float(_phi_s(jnp.asarray(0.4))), 3.0)
    # unstable branches
    np.testing.assert_allclose(float(_phi_m(jnp.asarray(-0.1))),
                               (1.0 + 1.6) ** -0.25)
    np.testing.assert_allclose(float(_phi_s(jnp.asarray(-0.5))),
                               (1.0 + 8.0) ** -0.5)
    # convective limits: (a − cζ)^{-1/3}; LMD94's published constants
    # give near- (not exact-) continuity at the transitions
    np.testing.assert_allclose(float(_phi_m(jnp.asarray(-0.2 - 1e-9))),
                               float(_phi_m(jnp.asarray(-0.2))),
                               rtol=1e-3)
    np.testing.assert_allclose(float(_phi_s(jnp.asarray(-1.0 - 1e-9))),
                               float(_phi_s(jnp.asarray(-1.0))),
                               rtol=1e-3)
    # φ decreases (w increases) with more unstable forcing
    zs = jnp.asarray([-5.0, -1.0, -0.1, 0.0, 0.5])
    phis = np.asarray(_phi_s(zs))
    assert np.all(np.diff(phis) > 0)


def test_velocity_scale_neutral_and_convective():
    ustar = jnp.asarray(0.01)
    bld = jnp.asarray(50.0)
    # neutral: w_s = κ u*
    _, ws = _w_scales(jnp.asarray(0.5), bld, ustar, jnp.asarray(0.0))
    np.testing.assert_allclose(float(ws), _K * 0.01, rtol=1e-12)
    # free convection (u*→0): w_s ∝ (c_s κ ε B h)^{1/3} — finite and
    # set by the convective velocity
    _, ws_c = _w_scales(jnp.asarray(0.5), bld, jnp.asarray(1e-10),
                        jnp.asarray(1e-7))
    wstar = (1e-7 * 50.0) ** (1.0 / 3.0)
    assert 0.1 * wstar < float(ws_c) < 3.0 * wstar


def _column(nk=20, H=200.0, dT=5.0):
    h = jnp.full((nk, 2, 2), H / nk)
    z = jnp.cumsum(h, 0) - 0.5 * h
    T = 15.0 - dT * z / H
    S = jnp.full_like(T, 35.0)
    return h, T, S


def test_kpp_bld_interpolates_and_deepens_with_wind():
    eos = make_eos("LINEAR")
    h, T, S = _column(dT=0.2)       # weak stratification
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    cfg = KPPCfg()
    r1 = kpp_coefficients(cfg, u, v, h, T, S, eos, 1035.0, 9.8,
                          ustar=jnp.full((2, 2), 0.005))
    r2 = kpp_coefficients(cfg, u, v, h, T, S, eos, 1035.0, 9.8,
                          ustar=jnp.full((2, 2), 0.04))
    b1 = float(r1.bld[0, 0])
    b2 = float(r2.bld[0, 0])
    assert b2 > b1 > 0.99          # stronger wind → deeper BL
    assert b2 > 15.0               # spans several interfaces
    # interpolated BLD should not sit exactly on a layer center
    zc = np.asarray(jnp.cumsum(h[:, 0, 0]) - 0.5 * h[:, 0, 0])
    assert np.abs(zc - b2).min() > 1e-6
    kd = np.asarray(r2.kd_int[:, 0, 0])
    assert kd.max() > 1e-4          # O(bld·w) mixing inside the BL
    assert kd[0] == 0.0 and kd[-1] == 0.0


def test_kpp_stable_buoyancy_shoals_bld():
    eos = make_eos("LINEAR")
    h, T, S = _column(dT=0.2)
    u = jnp.zeros_like(h)
    ust = jnp.full((2, 2), 0.04)
    cfg = KPPCfg()
    r_n = kpp_coefficients(cfg, u, u, h, T, S, eos, 1035.0, 9.8,
                           ustar=ust, buoy_flux=jnp.zeros((2, 2)))
    r_s = kpp_coefficients(cfg, u, u, h, T, S, eos, 1035.0, 9.8,
                           ustar=ust,
                           buoy_flux=jnp.full((2, 2), -5e-8))
    assert float(r_s.bld[0, 0]) <= float(r_n.bld[0, 0]) + 1e-9
    # destabilizing forcing mixes deeper and raises Kd
    r_u = kpp_coefficients(cfg, u, u, h, T, S, eos, 1035.0, 9.8,
                           ustar=ust,
                           buoy_flux=jnp.full((2, 2), 5e-8))
    assert float(r_u.bld[0, 0]) >= float(r_n.bld[0, 0]) - 1e-9
    assert float(jnp.max(r_u.kd_int)) > float(jnp.max(r_n.kd_int))


def test_epbl_energetics():
    eos = make_eos("LINEAR")
    h, T, S = _column(dT=2.0)
    cfg = EPBLCfg()
    dt = 3600.0
    # more wind → deeper energetically-afforded MLD
    r1 = energetic_pbl(cfg, h, T, S, eos, 1035.0, 9.8, dt,
                       ustar=jnp.full((2, 2), 0.005))
    r2 = energetic_pbl(cfg, h, T, S, eos, 1035.0, 9.8, dt,
                       ustar=jnp.full((2, 2), 0.03))
    assert float(r2.mld[0, 0]) > float(r1.mld[0, 0])
    # surface cooling (destabilizing) deepens further
    r3 = energetic_pbl(cfg, h, T, S, eos, 1035.0, 9.8, dt,
                       ustar=jnp.full((2, 2), 0.005),
                       buoy_flux=jnp.full((2, 2), 1e-6))
    assert float(r3.mld[0, 0]) > float(r1.mld[0, 0])
    # stronger stratification → shallower
    h2, T2, S2 = _column(dT=16.0)
    r4 = energetic_pbl(cfg, h2, T2, S2, eos, 1035.0, 9.8, dt,
                       ustar=jnp.full((2, 2), 0.03))
    assert float(r4.mld[0, 0]) < float(r2.mld[0, 0]) + 1e-9
    kd = np.asarray(r2.kd_int[:, 0, 0])
    assert kd[0] == 0.0 and kd.max() > 1e-5


def test_epbl_om4_mstar_mode_reduces_in_strong_rotation():
    eos = make_eos("LINEAR")
    h, T, S = _column(dT=8.0)
    cfg = EPBLCfg(mstar_mode=2)
    dt = 1800.0
    slow = energetic_pbl(cfg, h, T, S, eos, 1035.0, 9.8, dt,
                         ustar=jnp.full((2, 2), 0.01),
                         absf=jnp.full((2, 2), 1e-5))
    fast = energetic_pbl(cfg, h, T, S, eos, 1035.0, 9.8, dt,
                         ustar=jnp.full((2, 2), 0.01),
                         absf=jnp.full((2, 2), 2e-4))
    assert float(fast.mld[0, 0]) <= float(slow.mld[0, 0]) + 1e-9
