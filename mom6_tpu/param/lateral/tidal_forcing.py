"""Astronomical tidal forcing and scalar self-attraction & loading.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_tidal_forcing.F90: the equilibrium tidal potential for the main
semidiurnal and diurnal constituents,

  semidiurnal: η_eq = A·L·cos²(φ)·cos(ω t + 2λ)
  diurnal:     η_eq = A·L·sin(2φ)·cos(ω t + λ)

with Love-number factor L ≈ 1+k₂−h₂ ≈ 0.693, plus the scalar SAL
approximation η_sal = β·η (SAL_SCALAR_VALUE; the spherical-harmonic
SAL of MOM_self_attr_load.F90 lives in
mom6_tpu/param/lateral/self_attr_load.py).  The sum is an
addition to the geopotential in the pressure force / barotropic PG
(eta_tide, MOM_PressureForce_FV.F90 e_tide terms).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["TidalForcingCfg", "CONSTITUENTS", "equilibrium_tide",
           "scalar_sal"]

# name: (frequency [rad/s], amplitude [m], species: 2=semidiurnal 1=diurnal)
CONSTITUENTS = {
    "M2": (1.40519e-4, 0.242334, 2),
    "S2": (1.45444e-4, 0.112743, 2),
    "N2": (1.37880e-4, 0.046397, 2),
    "K2": (1.45842e-4, 0.030684, 2),
    "K1": (0.72921e-4, 0.141565, 1),
    "O1": (0.67598e-4, 0.100661, 1),
    "P1": (0.72523e-4, 0.046848, 1),
    "Q1": (0.64959e-4, 0.019273, 1),
}

_LOVE = 0.693      # 1 + k2 − h2


@dataclasses.dataclass(frozen=True)
class TidalForcingCfg:
    constituents: tuple = ("M2",)       # OBC_TIDE_CONSTITUENTS etc.
    use_sal_scalar: bool = True
    sal_scalar: float = 0.094           # SAL_SCALAR_VALUE


def equilibrium_tide(cfg: TidalForcingCfg, time_s: float, lat_deg,
                     lon_deg):
    """η_eq(t) [m] at h points from the selected constituents."""
    phi = jnp.deg2rad(lat_deg)
    lam = jnp.deg2rad(lon_deg)
    eta = jnp.zeros_like(lat_deg)
    for name in cfg.constituents:
        om, amp, species = CONSTITUENTS[name]
        if species == 2:
            eta = eta + _LOVE * amp * jnp.cos(phi) ** 2 \
                * jnp.cos(om * time_s + 2.0 * lam)
        else:
            eta = eta + _LOVE * amp * jnp.sin(2.0 * phi) \
                * jnp.cos(om * time_s + lam)
    return eta


def scalar_sal(cfg: TidalForcingCfg, eta):
    """Scalar self-attraction and loading: η_sal = β η."""
    if not cfg.use_sal_scalar:
        return jnp.zeros_like(eta)
    return cfg.sal_scalar * eta
