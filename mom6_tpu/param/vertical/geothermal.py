"""Geothermal heating.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_geothermal.F90: a bottom heat flux added to the deepest wet layer
(the reference also optionally transfers heated water across layers in
isopycnal mode; the ALE-mode in-place heating is implemented here).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["GeothermalCfg", "geothermal_heating"]

_CP = 3991.86795711963


@dataclasses.dataclass(frozen=True)
class GeothermalCfg:
    geothermal_flux: float = 0.0     # GEOTHERMAL_FLUX [W m-2]
    rho0: float = 1035.0


def geothermal_heating(cfg: GeothermalCfg, T, h, dt, flux_2d=None):
    """Heat the bottom-most layer with mass: dT = Q dt/(rho0 Cp h)."""
    if cfg.geothermal_flux <= 0.0 and flux_2d is None:
        return T
    q = flux_2d if flux_2d is not None else cfg.geothermal_flux
    # find the deepest layer with meaningful thickness per column
    nk = h.shape[0]
    htol = 1e-3
    is_wet = h > htol
    k_idx = jnp.arange(nk).reshape((-1,) + (1,) * (h.ndim - 1))
    k_bot = jnp.max(jnp.where(is_wet, k_idx, -1), axis=0)
    sel = k_idx == k_bot[None]
    dT = q * dt / (cfg.rho0 * _CP * jnp.maximum(h, htol))
    return T + jnp.where(sel, dT, 0.0)
