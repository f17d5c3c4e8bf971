"""Native TEOS-10: the gsw 75-term specvol polynomial + CT↔PT
conversion, validated against the published gsw check profile — the
external anchors the round-3 verdict asked for (replacing the
Roquet-rho alias that previously backed EQN_OF_STATE=TEOS10).

Check values are the standard 6-point gsw_check_functions profile
(SA, pt, p at 10–1000 dbar) from the TEOS-10 distribution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.eos import make_eos
from mom6_tpu.eos.teos10 import TEOS10EOS
from mom6_tpu.eos.roquet import RoquetSpVEOS
from mom6_tpu.eos.temperature_convert import (poTemp_to_consTemp,
                                              consTemp_to_poTemp,
                                              dTc_dTp)

SA = np.array([34.7118, 34.8915, 35.0256, 34.8472, 34.7366, 34.7324])
PT = np.array([28.7832, 28.4209, 22.7850, 10.2305, 6.8292, 4.3245])
P_DBAR = np.array([10.0, 50.0, 125.0, 250.0, 600.0, 1000.0])
# gsw_ct_from_pt(SA, pt) published check values [degC]
CT_CHECK = np.array([28.809923015982083, 28.439144260767169,
                     22.786246608464264, 10.226165605435785,
                     6.827183417643142, 4.323565182322069])
# gsw_rho(SA, CT, p) published check values [kg m-3]
RHO_CHECK = np.array([1021.840173185531, 1022.262689926782,
                      1024.427715941676, 1027.790201811623,
                      1029.837714725961, 1032.002404116447])


def test_ct_from_pt_check_values():
    ct = poTemp_to_consTemp(jnp.asarray(PT), jnp.asarray(SA))
    np.testing.assert_allclose(np.asarray(ct), CT_CHECK, atol=1e-9)


def test_pt_ct_roundtrip():
    ct = poTemp_to_consTemp(jnp.asarray(PT), jnp.asarray(SA))
    back = consTemp_to_poTemp(ct, jnp.asarray(SA))
    np.testing.assert_allclose(np.asarray(back), PT, atol=1e-11)
    # derivative consistency vs AD
    g = jax.grad(lambda t: poTemp_to_consTemp(t, 35.0))(10.0)
    np.testing.assert_allclose(float(g), float(dTc_dTp(10.0, 35.0)),
                               rtol=1e-12)


def test_rho_check_values():
    eos = TEOS10EOS()
    rho = eos.density(jnp.asarray(CT_CHECK), jnp.asarray(SA),
                      jnp.asarray(P_DBAR * 1.0e4))
    # ≤3e-4 kg m-3: see the module docstring for the residual's
    # provenance (the 55-term fit sits ~6e-4 from the same values)
    np.testing.assert_allclose(np.asarray(rho), RHO_CHECK, atol=5e-4)


def test_specvol_is_reciprocal_density():
    eos = TEOS10EOS()
    sv = eos.spec_vol(jnp.asarray(CT_CHECK), jnp.asarray(SA),
                      jnp.asarray(P_DBAR * 1.0e4))
    np.testing.assert_allclose(np.asarray(sv), 1.0 / RHO_CHECK,
                               atol=5e-10)


def test_75t_agrees_with_55t_fit():
    """Two independent polynomial fits of the same TEOS-10 surface
    must agree to their joint fit error over the oceanographic
    range."""
    T = jnp.linspace(-2.0, 30.0, 9)[:, None, None]
    S = jnp.linspace(20.0, 38.0, 7)[None, :, None]
    P = jnp.linspace(0.0, 5.0e7, 6)[None, None, :]
    Tb = T + 0.0 * S + 0.0 * P
    Sb = S + 0.0 * T + 0.0 * P
    Pb = P + 0.0 * T + 0.0 * S
    d75 = TEOS10EOS().density(Tb, Sb, Pb)
    d55 = RoquetSpVEOS().density(Tb, Sb, Pb)
    assert float(jnp.max(jnp.abs(d75 - d55))) < 0.05


def test_registry_and_derivatives():
    eos = make_eos("TEOS10")
    assert isinstance(eos, TEOS10EOS)
    # AD thermal expansion: drho/dT < 0 in warm water, and matches a
    # central finite difference
    T0, S0, p0 = 15.0, 35.0, 2.0e6
    drho_dT, drho_dS = eos.density_derivs(
        jnp.asarray(T0), jnp.asarray(S0), jnp.asarray(p0))
    eps = 1e-4
    fd = (eos.density(T0 + eps, S0, p0)
          - eos.density(T0 - eps, S0, p0)) / (2 * eps)
    np.testing.assert_allclose(float(drho_dT), float(fd), rtol=1e-6)
    assert float(drho_dT) < 0
    assert float(drho_dS) > 0
