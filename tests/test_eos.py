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
