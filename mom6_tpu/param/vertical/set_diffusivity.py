"""Assembly of interface diapycnal diffusivities.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_set_diffusivity.F90: sums the enabled contributions into interface
diffusivities Kd_int (and matching viscosities).  Currently wired:
constant background (KD) and a simple latitude-independent background
profile; shear-driven (kappa-shear/CVMix), tidal, double-diffusion and
BBL-TKE contributions are planned follow-ons with the same signature.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["DiffusivityCfg", "set_diffusivity"]


@dataclasses.dataclass(frozen=True)
class DiffusivityCfg:
    kd: float = 1e-5              # KD background diapycnal diff [m2 s-1]
    kd_min: float = 0.0           # KD_MIN
    kd_max: float = -1.0          # KD_MAX (<0: none)
    kv_conversion: float = 1.0    # Prandtl-ish Kv/Kd for returned Kv


def set_diffusivity(h, cfg: DiffusivityCfg):
    """Returns (kd_int, kv_int): (nk+1, ...) interface coefficients."""
    nk = h.shape[0]
    shape = (nk + 1,) + h.shape[1:]
    kd = jnp.full(shape, cfg.kd, h.dtype)
    kd = jnp.maximum(kd, cfg.kd_min)
    if cfg.kd_max > 0:
        kd = jnp.minimum(kd, cfg.kd_max)
    # no flux through surface/bottom interfaces
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return kd, cfg.kv_conversion * kd
