"""Tidally-driven internal-wave mixing.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_tidal_mixing.F90 (St Laurent et al. 2002 / Simmons et al. 2004
scheme) and MOM_internal_tide_input.F90: barotropic tidal energy lost
to internal tides E(x,y) deposits as diapycnal mixing with a
bottom-intensified exponential vertical structure,

  Kd_tidal(z) = q·Γ·E(x,y)·F(z) / (ρ·max(N², N0²)),
  F(z) = exp(−(H−z)/ζ) / (ζ·(1−exp(−H/ζ)))   (∫F dz = 1).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["TidalMixingCfg", "tidal_mixing_coeffs",
           "internal_tide_input"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class TidalMixingCfg:
    int_tide_dissipation: bool = True
    gamma_itides: float = 0.2        # GAMMA_ITIDES mixing efficiency
    q_itides: float = 0.3333         # fraction dissipating locally
    int_tide_decay_scale: float = 500.0   # INT_TIDE_DECAY_SCALE ζ [m]
    kd_max: float = 5e-3             # cap [m2 s-1]
    min_n2: float = 1e-8             # N0² floor [s-2]
    # INT_TIDE_PROFILE: STLAURENT_02 (exponential) or POLZIN_09
    # (algebraic 1/(z_p+hab)² decay, MOM_tidal_mixing.F90
    # add_int_tide_diffusivity Polzin branch)
    profile: str = "STLAURENT_02"
    polzin_decay_scale: float = 300.0     # z_p [m]


def internal_tide_input(u_tide_amp, h_rough, n_bot, rho0=1035.0,
                        kappa_itides=2.0 * 3.14159265 / 1.0e4):
    """Barotropic→internal tide energy flux E [W m-2] (Jayne & St
    Laurent 2001): E = 0.5 ρ κ h² N_bot U²."""
    return 0.5 * rho0 * kappa_itides * h_rough ** 2 * n_bot \
        * u_tide_amp ** 2


def tidal_mixing_coeffs(cfg: TidalMixingCfg, h, n2, e_flux,
                        rho0: float = 1035.0):
    """Kd at interior interfaces (nk-1, ...) from the tidal energy."""
    if not cfg.int_tide_dissipation:
        return jnp.zeros_like(h[1:])
    htot = jnp.sum(h, axis=0)
    z_int = jnp.cumsum(h, axis=0)[:-1]          # interior interfaces
    hab = htot[None] - z_int                    # height above bottom
    if cfg.profile.upper().startswith("POLZIN"):
        # Polzin (2009): F(hab) = z_p/(z_p+hab)² with unit integral
        # over the column
        zp = cfg.polzin_decay_scale
        norm = htot / (zp + htot) + _EPS
        Fz = (zp / (zp + hab) ** 2) / norm[None]
    else:
        zeta = cfg.int_tide_decay_scale
        norm = zeta * (1.0 - jnp.exp(-htot / zeta)) + _EPS
        Fz = jnp.exp(-hab / zeta) / norm[None]
    kd = (cfg.q_itides * cfg.gamma_itides * e_flux[None] * Fz
          / (rho0 * jnp.maximum(n2, cfg.min_n2)))
    return jnp.minimum(kd, cfg.kd_max)
