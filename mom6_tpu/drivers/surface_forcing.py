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
    # the reference's gyres profile
    # taux = A + B·sin(nπy') + C·cos(nπy')  (wind_forcing_gyres,
    # MOM_surface_forcing.F90:508)
    taux_const: float = 0.0             # TAUX_CONST (A) [Pa]
    taux_sin_amp: float = 0.0           # TAUX_SIN_AMP (B) [Pa]
    taux_cos_amp: float = 0.0           # TAUX_COS_AMP (C) [Pa]
    taux_n_pis: float = 1.0             # TAUX_N_PIS (n)
    buoy_config: str = "zero"           # BUOY_CONFIG
    sensible_heat: float = 0.0          # constant heat flux [W m-2]
    restore_sst: bool = False           # RESTOREBUOY-style SST restoring
    fluxconst: float = 0.0              # FLUXCONST piston velocity [m day-1]
    sst_north: float = 5.0              # linear target SST range
    sst_south: float = 25.0
    sss_north: float = 35.0             # linear target SSS range
    sss_south: float = 35.0
    restore_sss: bool = False
    rho0: float = 1035.0
    cp: float = _CP


def build_wind(cfg: SurfaceForcingCfg, grid: Grid, south: float,
               lenlat: float) -> MechForcing:
    yn = (grid.geoLatT - south) / max(lenlat, 1e-30)
    if cfg.wind_config == "zero":
        return MechForcing()
    if cfg.wind_config == "constant":
        return MechForcing(taux=cfg.taux_magnitude * grid.mask2dCu)
    if cfg.wind_config == "gyres":
        if cfg.taux_sin_amp != 0.0 or cfg.taux_cos_amp != 0.0 \
                or cfg.taux_const != 0.0:
            n = cfg.taux_n_pis
            taux = (cfg.taux_const
                    + cfg.taux_sin_amp * jnp.sin(n * jnp.pi * yn)
                    + cfg.taux_cos_amp * jnp.cos(n * jnp.pi * yn))
        else:
            taux = cfg.taux_magnitude * -jnp.cos(2.0 * jnp.pi * yn)
        return MechForcing(taux=taux * grid.mask2dCu)
    if cfg.wind_config == "2gyre":
        taux = cfg.taux_magnitude * (1.0 - jnp.cos(2.0 * jnp.pi * yn)) \
            * 0.5
        return MechForcing(taux=taux * grid.mask2dCu)
    raise ValueError(f"Unknown WIND_CONFIG '{cfg.wind_config}'")


def buoyancy_restoring(cfg: SurfaceForcingCfg, grid: Grid, sst, south,
                       lenlat, sss=None) -> Fluxes:
    """Heat (and salt) fluxes from linear-target surface restoring —
    the reference's BUOY_CONFIG='linear' with RESTOREBUOY/FLUXCONST
    (buoyancy_forcing_linear, MOM_surface_forcing.F90:1053) — plus any
    constant flux."""
    heat = jnp.zeros_like(sst)
    salt = None
    if cfg.sensible_heat != 0.0:
        heat = heat + cfg.sensible_heat
    if cfg.restore_sst and cfg.fluxconst > 0.0:
        yn = (grid.geoLatT - south) / max(lenlat, 1e-30)
        sst_target = cfg.sst_south + (cfg.sst_north - cfg.sst_south) * yn
        piston = cfg.fluxconst / 86400.0         # m/s
        heat = heat + piston * cfg.rho0 * cfg.cp * (sst_target - sst)
        if cfg.restore_sss and sss is not None:
            sss_target = cfg.sss_south \
                + (cfg.sss_north - cfg.sss_south) * yn
            # equivalent salt flux [kg m-2 s-1 of salt /1000]
            salt = piston * cfg.rho0 * (sss_target - sss) / 1000.0 \
                * grid.mask2dT
    return Fluxes(sensible=heat * grid.mask2dT, salt_flux=salt)
