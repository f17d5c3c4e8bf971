"""Diabatic (column physics) driver — ALE path skeleton.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diabatic_driver.F90:1122 diabatic_ALE:
  set_diffusivity → (KPP BLD/mixing, CVMix conv — planned) →
  applyBoundaryFluxesInOut (surface heat/salt forcing into the top
  layers) → implicit vertical diffusion of T/S and tracers
  (tracer_vertdiff_Eulerian) → tracer column physics → (ALE sponge —
  planned).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import Fluxes
from mom6_tpu.param.vertical.set_diffusivity import (DiffusivityCfg,
                                                     set_diffusivity)
from mom6_tpu.tracer.vertdiff import tracer_vertdiff

__all__ = ["DiabaticCfg", "diabatic"]

_CP = 3991.86795711963      # J kg-1 K-1 (reference C_P default)


@dataclasses.dataclass(frozen=True)
class DiabaticCfg:
    diffusivity: DiffusivityCfg = DiffusivityCfg()
    rho0: float = 1035.0
    pen_sw_frac: float = 0.42   # non-penetrating SW fraction absorbed
                                # in the top layer (opacity is planned)


def diabatic(state: State, fluxes: Optional[Fluxes], dt: float,
             cfg: DiabaticCfg, tracers: dict | None = None):
    """Apply surface fluxes + implicit vertical mixing to T/S/tracers.

    Returns (new_state, new_tracers, kd_int)."""
    h = state.h
    kd_int, kv_int = set_diffusivity(h, cfg.diffusivity)

    T, S = state.T, state.S
    sfc_T = None
    sfc_S = None
    if fluxes is not None and T is not None:
        heat = jnp.zeros_like(h[0])
        for f in (fluxes.sw, fluxes.lw, fluxes.latent, fluxes.sensible):
            if f is not None:
                heat = heat + f
        sfc_T = heat / (cfg.rho0 * _CP)          # [degC m s-1]
        if fluxes.salt_flux is not None:
            sfc_S = fluxes.salt_flux * (1000.0 / cfg.rho0)

    if T is not None:
        T = tracer_vertdiff(T, h, kd_int, dt, sfc_flux=sfc_T)
        S = tracer_vertdiff(S, h, kd_int, dt, sfc_flux=sfc_S)

    new_tracers = tracers
    if tracers is not None:
        new_tracers = {k: tracer_vertdiff(v, h, kd_int, dt)
                       for k, v in tracers.items()}

    return state.replace(T=T, S=S), new_tracers, kd_int
