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


def scm_wind(grid: Grid, tau_x: float, tau_y: float) -> MechForcing:
    """WIND_CONFIG='SCM_CVMix_tests': spatially uniform stress
    (SCM_CVMix_tests_wind_forcing,
    /root/reference/src/user/SCM_CVMix_tests.F90:195)."""
    return MechForcing(taux=tau_x * grid.mask2dCu,
                       tauy=tau_y * grid.mask2dCv)


def scm_buoyancy_fn(grid: Grid, heat_flux: float = 0.0,
                    evaporation: float = 0.0, max_sw: float = 0.0,
                    rho_restore: float = 1035.0, cp: float = _CP):
    """BUOY_CONFIG='SCM_CVMix_tests' fluxes
    (SCM_CVMix_tests_buoyancy_forcing, SCM_CVMix_tests.F90:232).

    CVMix test inputs give the heat flux in kinematic units
    [m degC s-1] and evaporation in [m s-1]; both are converted with
    rho_restore (RESTORE_FLUX_RHO) and cp.  The diurnal shortwave
    peaks at local noon: sw = max_sw·max(0, cos(2π(t/86400 − 0.5)))·
    rho·cp, a function of the traced model time."""
    def fluxes_fn(state, t):
        sens = sw = evap = None
        if heat_flux != 0.0:
            sens = heat_flux * rho_restore * cp * grid.mask2dT
        if evaporation != 0.0:
            evap = evaporation * rho_restore * grid.mask2dT
        if max_sw != 0.0:
            amp = jnp.maximum(
                0.0, jnp.cos(2.0 * jnp.pi * (t / 86400.0 - 0.5)))
            sw = max_sw * amp * rho_restore * cp * grid.mask2dT
        return Fluxes(sensible=sens, sw=sw, evap=evap)
    fluxes_fn.time_varying = max_sw != 0.0
    return fluxes_fn


@dataclasses.dataclass(frozen=True)
class HurricaneCfg:
    """Idealized translating hurricane (Holland 1980 parametric wind
    + Zhang & Uhlhorn 2012 inflow angle), re-designed from
    /root/reference/src/user/Idealized_Hurricane.F90:96-471."""
    rho_air: float = 1.2              # IDL_HURR_RHO_AIR [kg m-3]
    p_ambient: float = 101200.0       # IDL_HURR_AMBIENT_PRESSURE [Pa]
    p_central: float = 96800.0        # IDL_HURR_CENTRAL_PRESSURE [Pa]
    rad_max_wind: float = 50.0e3      # IDL_HURR_RAD_MAX_WIND [m]
    max_windspeed: float = 65.0       # IDL_HURR_MAX_WIND [m s-1]
    translation_spd: float = 5.0      # IDL_HURR_TRAN_SPEED [m s-1]
    translation_dir: float = 180.0    # IDL_HURR_TRAN_DIR [deg]
    x0: float = 0.0                   # IDL_HURR_X0 [m]
    y0: float = 0.0                   # IDL_HURR_Y0 [m]
    scm_mode: bool = False            # IDL_HURR_SCM
    br_bench: bool = False            # IDL_HURR_SCM_BR_BENCH
    dy_from_center: float = 0.0       # IDL_HURR_SCM_LOCY [m]

    @property
    def holland_b(self) -> float:
        dp = self.p_ambient - self.p_central
        return self.max_windspeed ** 2 * self.rho_air * np.e / dp

    @property
    def holland_a(self) -> float:
        return self.rad_max_wind ** self.holland_b


def _hurricane_stress(cfg: HurricaneCfg, xx, yy, absf):
    """Holland-profile 10 m wind → (taux, tauy) at one stagger
    (idealized_hurricane_wind_profile, Idealized_Hurricane.F90:329),
    using the post-2019 algebraically stable U10 form and zero ocean
    currents (IDL_HURR_TAU_CURR_REL default)."""
    deg2rad = np.pi / 180.0
    dp = cfg.p_ambient - cfg.p_central
    B = cfg.holland_b
    A = cfg.holland_a
    AxBxDP = A * B * dp
    rmw = cfg.rad_max_wind

    radius = jnp.sqrt(xx ** 2 + yy ** 2)
    # the benchmark variant keeps the (erroneous) km-based Coriolis
    # term of the original experiment (BR_Bench comment, :380)
    km = 1.0e-3 if cfg.br_bench else 1.0
    radiusB = jnp.maximum(radius, 1e-3 * rmw) ** B
    tmp = (0.5 * radius * km * absf) * (cfg.rho_air * radiusB)
    core = AxBxDP * jnp.exp(-A / radiusB)
    u10_in = core / (tmp + jnp.sqrt(core * (cfg.rho_air * radiusB)
                                    + tmp ** 2))
    # outer ring 10–15 rmw: linearly ramp the 10-rmw wind to zero
    radiusB10 = (10.0 * rmw) ** B
    tmp10 = (0.5 * 10.0 * rmw * km * absf) * (cfg.rho_air * radiusB10)
    core10 = AxBxDP * jnp.exp(-A / radiusB10)
    u10_edge = (3.0 - radius / (5.0 * rmw)) * core10 \
        / (tmp10 + jnp.sqrt(core10 * (cfg.rho_air * radiusB10)
                            + tmp10 ** 2))
    u10 = jnp.where(radius <= 1e-3 * rmw, 0.0,
                    jnp.where(radius < 10.0 * rmw, u10_in,
                              jnp.where(radius < 15.0 * rmw,
                                        jnp.maximum(u10_edge, 0.0),
                                        0.0)))

    adir = jnp.arctan2(yy, xx)
    trans_dir = cfg.translation_dir * deg2rad
    # inflow angle (Zhang & Uhlhorn 2012), ramped off past 10 rmw
    rstr = jnp.minimum(10.0, radius / rmw)
    a0 = -0.9 * rstr - 0.09 * cfg.max_windspeed - 14.33
    a1 = -a0 * (0.04 * rstr + 0.05 * cfg.translation_spd + 0.14)
    p1 = (6.88 * rstr - 9.60 * cfg.translation_spd + 85.31) * deg2rad
    alph = a0 - a1 * jnp.cos(trans_dir - adir - p1)
    alph = jnp.where(radius > 15.0 * rmw, 0.0,
                     jnp.where(radius > 10.0 * rmw,
                               alph * (15.0 - radius / rmw) / 5.0,
                               alph)) * deg2rad

    u_ts = cfg.translation_spd * 0.5 * jnp.cos(trans_dir)
    v_ts = cfg.translation_spd * 0.5 * jnp.sin(trans_dir)
    du = u10 * jnp.sin(adir - jnp.pi - alph) + u_ts
    dv = u10 * jnp.cos(adir - alph) + v_ts
    du10 = jnp.sqrt(du ** 2 + dv ** 2)
    # Sullivan et al. (2010) piecewise drag coefficient
    cd = jnp.where(du10 < 11.0, 1.2e-3,
                   jnp.where(du10 < 20.0,
                             (0.49 + 0.065 * du10) * 1.0e-3, 1.8e-3))
    return (cfg.rho_air * cd * du10 * du,
            cfg.rho_air * cd * du10 * dv)


def idealized_hurricane_fn(cfg: HurricaneCfg, grid: Grid):
    """WIND_CONFIG='ideal_hurr'|'SCM_ideal_hurr': t[s] → MechForcing
    with the storm center translating at the configured speed/heading
    (idealized_hurricane_wind_forcing, Idealized_Hurricane.F90:208).
    geoLon/geoLat are in km on cartesian grids, matching the
    reference's *1000 conversion."""
    deg2rad = np.pi / 180.0
    trans_dir = cfg.translation_dir * deg2rad
    if cfg.br_bench:
        fbench = 5.5659e-5

        def absf_at(fq_avg):
            return jnp.full_like(fq_avg, fbench)
    else:
        def absf_at(fq_avg):
            return jnp.abs(fq_avg)

    fq = grid.CoriolisBu
    # |f| averaged to the u/v points (:66, :90)
    from mom6_tpu.parallel.stencil import jm1, im1
    absf_u = absf_at(0.5 * (fq + jm1(fq)))
    absf_v = absf_at(0.5 * (fq + im1(fq)))

    def forces_fn(t):
        xc = cfg.x0 + t * cfg.translation_spd * jnp.cos(trans_dir)
        yc = cfg.y0 + t * cfg.translation_spd * jnp.sin(trans_dir)
        if cfg.scm_mode:
            # the column sits on the storm track: its position
            # relative to the center is (XC, YC + dy) (:69-71)
            ones = jnp.ones_like(grid.geoLonCu)
            xx_u = xc * ones
            yy_u = (yc + cfg.dy_from_center) * ones
            xx_v, yy_v = xx_u, yy_u
        else:
            xx_u = grid.geoLonCu * 1000.0 - xc
            yy_u = grid.geoLatCu * 1000.0 - yc
            xx_v = grid.geoLonCv * 1000.0 - xc
            yy_v = grid.geoLatCv * 1000.0 - yc
        tx, _ = _hurricane_stress(cfg, xx_u, yy_u, absf_u)
        _, ty = _hurricane_stress(cfg, xx_v, yy_v, absf_v)
        return MechForcing(taux=tx * grid.mask2dCu,
                           tauy=ty * grid.mask2dCv)
    forces_fn.time_varying = True
    return forces_fn


def bfb_buoyancy_fn(grid: Grid, sst_s: float = 20.0,
                    sst_n: float = 10.0, lfr_slat: float = 20.0,
                    lfr_nlat: float = 40.0, flux_const: float = 0.0,
                    rho_restore: float = 1035.0, cp: float = _CP):
    """BUOY_CONFIG='BFB': restore the surface toward a linear
    meridional SST ramp between LFR_SLAT and LFR_NLAT
    (BFB_buoyancy_forcing,
    /root/reference/src/user/BFB_surface_forcing.F90:52-173).  The
    reference's buoyancy-only flux is expressed here as the
    equivalent restoring heat flux rho·cp·piston·(T_rest − SST)."""
    lat = grid.geoLatT
    ramp = (sst_s - sst_n) / (lfr_slat - lfr_nlat) \
        * (lat - lfr_slat) + sst_s
    t_rest = jnp.where(lat <= lfr_slat, sst_s,
                       jnp.where(lat >= lfr_nlat, sst_n, ramp))
    piston = flux_const / 86400.0

    def fluxes_fn(state, t):
        heat = piston * rho_restore * cp * (t_rest - state.T[0])
        return Fluxes(sensible=heat * grid.mask2dT)
    fluxes_fn.time_varying = False
    return fluxes_fn


@dataclasses.dataclass(frozen=True)
class DumbbellForcingCfg:
    """dumbbell_surface_forcing.F90: oscillating sea-level pressure
    over the two reservoirs plus salinity restoring there."""
    slp_amplitude: float = 10000.0   # DUMBBELL_SLP_AMP [Pa]
    slp_period: float = 1.0          # DUMBBELL_SLP_PERIOD [days]
    s_surf: float = 34.0             # INITIAL_SSS
    s_range: float = 2.0             # INITIAL_S_RANGE
    flux_const: float = 0.0          # FLUXCONST [m day-1]
    rho_restore: float = 1035.0      # RESTORE_FLUX_RHO
    rotate: bool = False             # DUMBBELL_ROTATION


def dumbbell_forcing(cfg: DumbbellForcingCfg, grid: Grid, west, lenlon,
                     south, lenlat):
    """Returns (forces_fn, fluxes_fn) for the dumbbell test: the SLP
    seesaw p_surf = mask·A·sin(deg2rad·days/period) in the reservoirs
    (dumbbell_dynamic_forcing, dumbbell_surface_forcing.F90:157 —
    including the reference's degree-based argument), and the
    reservoir salinity restoring as a virtual-precip mass flux
    (dumbbell_buoyancy_forcing :115)."""
    if cfg.rotate:
        x = (grid.geoLatT - south) / max(lenlat, 1e-30) - 0.5
    else:
        x = (grid.geoLonT - west) / max(lenlon, 1e-30) - 0.5
    fmask = jnp.where(jnp.abs(x) > 0.25, 1.0, 0.0) * grid.mask2dT
    s_rest = jnp.where(x > 0.25, cfg.s_surf + cfg.s_range,
                       jnp.where(x < -0.25, cfg.s_surf - cfg.s_range,
                                 cfg.s_surf))
    deg_rad = np.pi / 180.0
    # restoring rate in mass-flux units [kg m-2 s-1]
    fc = cfg.rho_restore * cfg.flux_const / 86400.0

    def forces_fn(t):
        rdays = t / 86400.0
        p = fmask * cfg.slp_amplitude \
            * jnp.sin(deg_rad * rdays / cfg.slp_period)
        return MechForcing(p_surf=p)
    forces_fn.time_varying = True

    def fluxes_fn(state, t):
        sss = state.S[0]
        vprec = -(fmask * fc) * (s_rest - sss) \
            / jnp.maximum(0.5 * (s_rest + sss), 1e-12)
        return Fluxes(lprec=vprec)
    fluxes_fn.time_varying = False
    return forces_fn, (fluxes_fn if cfg.flux_const > 0.0 else None)


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
