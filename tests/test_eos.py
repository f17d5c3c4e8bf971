"""EOS consistency tests (the analog of the reference's
config_src/drivers/unit_tests/test_MOM_EOS.F90 checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.eos import make_eos

FORMS = ["LINEAR", "WRIGHT", "WRIGHT_FULL", "WRIGHT_RED", "UNESCO",
         "JACKETT_06", "ROQUET_RHO", "TEOS10"]

T0, S0, P0 = 10.0, 35.0, 2000.0e4   # 10degC, 35psu, 2000 dbar


@pytest.mark.parametrize("form", FORMS)
def test_density_plausible(form):
    eos = make_eos(form)
    rho = float(eos.density(jnp.asarray(T0), jnp.asarray(S0),
                            jnp.asarray(P0)))
    assert 1020.0 < rho < 1060.0, f"{form}: rho={rho}"


@pytest.mark.parametrize("form", FORMS)
def test_derivs_signs(form):
    """Warmer → lighter; saltier → denser."""
    eos = make_eos(form)
    dT, dS = eos.density_derivs(jnp.asarray(T0), jnp.asarray(S0),
                                jnp.asarray(P0))
    assert float(dT) < 0.0
    assert float(dS) > 0.0


@pytest.mark.parametrize("form", [f for f in FORMS if f != "LINEAR"])
def test_compressibility_positive(form):
    eos = make_eos(form)
    drho_dp = eos.compressibility(jnp.asarray(T0), jnp.asarray(S0),
                                  jnp.asarray(P0))
    assert float(drho_dp) > 0.0


@pytest.mark.parametrize("form", FORMS)
def test_derivs_match_finite_difference(form):
    eos = make_eos(form)
    dT, dS = eos.density_derivs(jnp.asarray(T0), jnp.asarray(S0),
                                jnp.asarray(P0))
    eps = 1e-4
    fdT = (float(eos.density(jnp.asarray(T0 + eps), jnp.asarray(S0),
                             jnp.asarray(P0)))
           - float(eos.density(jnp.asarray(T0 - eps), jnp.asarray(S0),
                               jnp.asarray(P0)))) / (2 * eps)
    fdS = (float(eos.density(jnp.asarray(T0), jnp.asarray(S0 + eps),
                             jnp.asarray(P0)))
           - float(eos.density(jnp.asarray(T0), jnp.asarray(S0 - eps),
                               jnp.asarray(P0)))) / (2 * eps)
    assert abs(float(dT) - fdT) < 1e-6 * max(1.0, abs(fdT))
    assert abs(float(dS) - fdS) < 1e-6 * max(1.0, abs(fdS))


def test_unesco_reference_value():
    """Jackett & McDougall (1995) check value: rho(T=3C, S=35.5psu,
    p=300 bar) = 1041.83267 kg/m3 (their Table A1)."""
    eos = make_eos("UNESCO")
    rho = float(eos.density(jnp.asarray(3.0), jnp.asarray(35.5),
                            jnp.asarray(300.0e5)))
    assert abs(rho - 1041.83267) < 5e-4, rho


def test_roquet_surface_value():
    """Roquet et al. 2015 style check: rho(CT=10, SA=35.16504, p=0)
    should be near 1027 kg/m3 (σ0 ≈ 26.95 for this state)."""
    eos = make_eos("ROQUET_RHO")
    rho = float(eos.density(jnp.asarray(10.0), jnp.asarray(35.16504),
                            jnp.asarray(0.0)))
    assert abs(rho - 1027.0) < 1.0, rho


def test_forms_mutually_consistent():
    """All nonlinear EOS agree on density to within ~0.5 kg/m3 at a
    mid-ocean state (they fit the same ocean)."""
    vals = {}
    for form in ["WRIGHT_FULL", "WRIGHT_RED", "UNESCO", "JACKETT_06",
                 "ROQUET_RHO"]:
        vals[form] = float(make_eos(form).density(
            jnp.asarray(T0), jnp.asarray(S0), jnp.asarray(P0)))
    vmax, vmin = max(vals.values()), min(vals.values())
    assert vmax - vmin < 0.6, vals


def test_unknown_form():
    with pytest.raises(ValueError):
        make_eos("NOT_AN_EOS")


def test_second_derivs_match_finite_differences():
    """density_second_derivs (nested forward AD) vs central finite
    differences for the full EOS suite
    (calculate_density_second_derivs, MOM_EOS.F90)."""
    import numpy as np
    from mom6_tpu.eos import make_eos
    T = jnp.asarray([2.0, 10.0, 24.0])
    S = jnp.asarray([33.0, 35.0, 37.0])
    p = jnp.asarray([1.0e5, 2.0e7, 5.0e7])
    for form in ("WRIGHT", "WRIGHT_FULL", "UNESCO", "JACKETT_06",
                 "ROQUET_RHO", "TEOS10", "LINEAR"):
        eos = make_eos(form)
        d2 = eos.density_second_derivs(T, S, p)
        eps_T, eps_S, eps_p = 0.05, 0.05, 1e5

        def fd2(f, x, eps):
            return (f(x + eps) - 2.0 * f(x) + f(x - eps)) / eps ** 2

        def fdx(f, x, y, ex, ey):
            return ((f(x + ex, y + ey) - f(x + ex, y - ey))
                    - (f(x - ex, y + ey) - f(x - ex, y - ey))) \
                / (4.0 * ex * ey)

        rho = lambda t=T, s=S, q=p: eos.density(t, s, q)
        ref = (
            fd2(lambda s: rho(s=s), S, eps_S),
            fdx(lambda s, t: rho(t=t, s=s), S, T, eps_S, eps_T),
            fd2(lambda t: rho(t=t), T, eps_T),
            fdx(lambda s, q: rho(s=s, q=q), S, p, eps_S, eps_p),
            fdx(lambda t, q: rho(t=t, q=q), T, p, eps_T, eps_p),
        )
        for got, want, nm in zip(d2, ref, ("SS", "ST", "TT", "SP",
                                           "TP")):
            scale = np.max(np.abs(np.asarray(want))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3,
                atol=2e-3 * scale,
                err_msg=f"{form} d2rho/d{nm}")


def test_roquet_spv_native_polynomial():
    """The SpV-native polynomial (MOM_EOS_Roquet_SpV.F90) agrees with
    the reciprocal of the rho polynomial to the fits' mutual accuracy
    (~5e-9 m3/kg ≈ 5e-3 kg/m3) over the ocean range, and is NOT the
    reciprocal (they are independent fits)."""
    spv_eos = make_eos("ROQUET_SPV")
    rho_eos = make_eos("ROQUET_RHO")
    T = jnp.asarray([-1.0, 4.0, 10.0, 20.0, 2.0])
    S = jnp.asarray([30.0, 34.0, 35.16504, 36.5, 34.8])
    p = jnp.asarray([0.0, 1.0e6, 1.0e7, 4.0e7, 9.0e7])
    spv = spv_eos.spec_vol(T, S, p)
    spv_recip = 1.0 / rho_eos.density(T, S, p)
    import numpy as np
    np.testing.assert_allclose(np.asarray(spv), np.asarray(spv_recip),
                               rtol=2e-7)
    d = np.abs(np.asarray(spv) - np.asarray(spv_recip))
    assert d.max() > 0.0    # genuinely distinct fits
    # density via the SpV-native path stays consistent too
    rho_spv = spv_eos.density(T, S, p)
    np.testing.assert_allclose(np.asarray(rho_spv),
                               np.asarray(rho_eos.density(T, S, p)),
                               rtol=2e-7)
    # derivatives (AD through the reciprocal) have the right signs
    dT, dS = spv_eos.density_derivs(jnp.asarray(10.0),
                                    jnp.asarray(35.0),
                                    jnp.asarray(2.0e7))
    assert float(dT) < 0.0 and float(dS) > 0.0
