"""Analytic surface forcing configurations for the solo driver.

Re-design of /root/reference/config_src/drivers/solo_driver/
MOM_surface_forcing.F90: named wind configurations (zero, constant,
gyres, 2gyre, scurves) and buoyancy configurations (zero, constant
heat flux, linear SST/SSS restoring) producing (MechForcing, Fluxes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.forcing import MechForcing, Fluxes

__all__ = ["SurfaceForcingCfg", "build_wind", "buoyancy_restoring"]

_CP = 3991.86795711963


@dataclasses.dataclass(frozen=True)
class SurfaceForcingCfg:
    wind_config: str = "zero"           # WIND_CONFIG
    taux_magnitude: float = 0.1         # TAUX_MAGNITUDE [Pa]
    buoy_config: str = "zero"           # BUOY_CONFIG
    sensible_heat: float = 0.0          # constant heat flux [W m-2]
    restore_sst: bool = False           # RESTOREBUOY-style SST restoring
    fluxconst: float = 0.0              # FLUXCONST piston velocity [m day-1]
    sst_north: float = 5.0              # linear target SST range
    sst_south: float = 25.0
    rho0: float = 1035.0


def build_wind(cfg: SurfaceForcingCfg, grid: Grid, south: float,
               lenlat: float) -> MechForcing:
    yn = (grid.geoLatT - south) / max(lenlat, 1e-30)
    if cfg.wind_config == "zero":
        return MechForcing()
    if cfg.wind_config == "constant":
        return MechForcing(taux=cfg.taux_magnitude * grid.mask2dCu)
    if cfg.wind_config == "gyres":
        taux = cfg.taux_magnitude * -jnp.cos(2.0 * jnp.pi * yn)
        return MechForcing(taux=taux * grid.mask2dCu)
    if cfg.wind_config == "2gyre":
        taux = cfg.taux_magnitude * (1.0 - jnp.cos(2.0 * jnp.pi * yn)) \
            * 0.5
        return MechForcing(taux=taux * grid.mask2dCu)
    raise ValueError(f"Unknown WIND_CONFIG '{cfg.wind_config}'")


def buoyancy_restoring(cfg: SurfaceForcingCfg, grid: Grid, sst, south,
                       lenlat) -> Fluxes:
    """Heat flux from linear-target SST restoring (the reference's
    RESTOREBUOY with FLUXCONST) plus any constant flux."""
    heat = jnp.zeros_like(sst)
    if cfg.sensible_heat != 0.0:
        heat = heat + cfg.sensible_heat
    if cfg.restore_sst and cfg.fluxconst > 0.0:
        yn = (grid.geoLatT - south) / max(lenlat, 1e-30)
        sst_target = cfg.sst_south + (cfg.sst_north - cfg.sst_south) * yn
        piston = cfg.fluxconst / 86400.0         # m/s
        heat = heat + piston * cfg.rho0 * _CP * (sst_target - sst)
    return Fluxes(sensible=heat * grid.mask2dT)
