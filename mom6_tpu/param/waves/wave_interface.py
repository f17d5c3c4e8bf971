"""Surface-wave coupling: Stokes drift and Langmuir numbers.

Re-design of /root/reference/src/user/MOM_wave_interface.F90: Stokes
drift profiles for the Craik-Leibovich vortex force and Langmuir
mixing enhancement.  Supported forms: the one-band exponential profile
from a surface Stokes drift and decay scale (DHH85-like monochromatic)
computed from wind speed (WAVE_METHOD "LF17"-style empirical), and the
turbulent Langmuir number La_t = √(u*/U_s) with the KPP/ePBL mixing
enhancement factor of Li et al. (2016).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["WavesCfg", "stokes_profile", "langmuir_number",
           "langmuir_enhancement"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class WavesCfg:
    wave_method: str = "EMPIRICAL"   # EMPIRICAL (wind-based) | CONST
    const_us: float = 0.0            # surface Stokes drift [m s-1]
    const_decay: float = 5.0         # e-folding depth [m]
    # empirical: U_s ≈ 0.016 U10; decay from a peak wavelength ~ wind
    us_wind_frac: float = 0.016


class StokesResult(NamedTuple):
    us: jnp.ndarray       # (nk, ...) zonal Stokes drift at layer centers
    vs: jnp.ndarray
    us0: jnp.ndarray      # surface magnitude


def stokes_profile(cfg: WavesCfg, h, u10=None, wind_dir_x=None,
                   wind_dir_y=None):
    """Exponential Stokes profile u_s(z) = U_s0 exp(-2k z)."""
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    z_mid = 0.5 * (z_int[:-1] + z_int[1:])
    if cfg.wave_method == "CONST":
        us0 = jnp.full_like(h[0], cfg.const_us)
        decay = cfg.const_decay
    else:
        u10 = u10 if u10 is not None else jnp.zeros_like(h[0])
        us0 = cfg.us_wind_frac * u10
        # peak wavelength grows with wind: λ ≈ 0.33 U10² (fully
        # developed) → decay = λ/(4π)
        decay = jnp.maximum(0.33 * u10 * u10 / (4.0 * jnp.pi), 1.0)
    prof = us0[None] * jnp.exp(-z_mid / jnp.maximum(decay, _EPS))
    dx = wind_dir_x if wind_dir_x is not None else jnp.ones_like(h[0])
    dy = wind_dir_y if wind_dir_y is not None else jnp.zeros_like(h[0])
    norm = jnp.sqrt(dx * dx + dy * dy) + _EPS
    return StokesResult(us=prof * (dx / norm)[None],
                        vs=prof * (dy / norm)[None], us0=us0)


def langmuir_number(ustar, us0):
    """Turbulent Langmuir number La_t = sqrt(u*/U_s0)."""
    return jnp.sqrt(jnp.maximum(ustar, _EPS)
                    / jnp.maximum(us0, _EPS))


def langmuir_enhancement(la_t):
    """Li et al. (2016) mixing enhancement for KPP/ePBL:
    F = sqrt(1 + (1.5 La)^-2 + (5.4 La)^-4), capped."""
    la = jnp.maximum(la_t, 0.1)
    f = jnp.sqrt(1.0 + (1.5 * la) ** -2 + (5.4 * la) ** -4)
    return jnp.minimum(f, 5.0)
