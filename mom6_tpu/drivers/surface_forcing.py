"""Analytic and file-driven surface forcing for the solo driver.

Re-design of /root/reference/config_src/drivers/solo_driver/
MOM_surface_forcing.F90: named wind configurations (zero, constant,
gyres, 2gyre, file) and buoyancy configurations (zero, constant
heat flux, linear SST/SSS restoring, file) producing
(MechForcing, Fluxes).  File configs (wind_forcing_from_file :677,
buoyancy_forcing_from_files :860) return functions of a *traced*
model time so that the time interpolation runs inside the jitted
step (see framework/interp_external.py).
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


def wind_forcing_from_file(grid, wind_file: str, x_var: str, y_var: str,
                           stagger: str = "C", scale: float = 1.0):
    """WIND_CONFIG='file': build a function t[s] -> MechForcing with
    stresses time-interpolated from ``wind_file``
    (wind_forcing_from_file, MOM_surface_forcing.F90:677).

    WIND_STAGGER='A' regrids from the file's own lon/lat straight to
    the model's u/v points; 'C' expects ongrid fields.
    """
    from mom6_tpu.framework.interp_external import load_external_field
    # A-grid files carry their own lon/lat and regrid to the u/v
    # points; C-grid ('ongrid') files must already match the compute
    # domain and are only halo-padded.  Both cases are resolved by
    # shape inside load_external_field.
    tx = load_external_field(wind_file, x_var, grid=grid, stagger="U",
                             scale=scale)
    ty = load_external_field(wind_file, y_var, grid=grid, stagger="V",
                             scale=scale)

    def forces_fn(t):
        return MechForcing(taux=tx.at(t) * grid.mask2dCu,
                           tauy=ty.at(t) * grid.mask2dCv)
    forces_fn.time_varying = not (tx.static and ty.static)
    return forces_fn


_BUOY_FILE_FIELDS = (
    # (Fluxes field, MOM_input parameter, file variable, sign)
    ("lw", "LONGWAVE_FILE", "LW", 1.0),
    ("sw", "SHORTWAVE_FILE", "SW", 1.0),
    ("latent", "LATENTHEAT_FILE", "latent", 1.0),
    ("sensible", "SENSIBLEHEAT_FILE", "sensible", 1.0),
    ("evap", "EVAPORATION_FILE", "evap", 1.0),
    ("lprec", "RAIN_FILE", "liq_precip", 1.0),
    ("fprec", "SNOW_FILE", "froz_precip", 1.0),
)


def buoyancy_forcing_from_files(grid, files: dict):
    """BUOY_CONFIG='file': heat/freshwater fluxes time-interpolated
    from per-component files (buoyancy_forcing_from_files,
    MOM_surface_forcing.F90:860).  ``files`` maps Fluxes field names
    to (path, varname).
    """
    from mom6_tpu.framework.interp_external import load_external_field
    efs = {name: load_external_field(path, var, grid=grid, stagger="T")
           for name, (path, var) in files.items()}

    def fluxes_fn(state, t):
        vals = {name: ef.at(t) * grid.mask2dT
                for name, ef in efs.items()}
        return Fluxes(**vals)
    fluxes_fn.time_varying = any(not ef.static for ef in efs.values())
    return fluxes_fn
