"""Assembly of interface diapycnal diffusivities.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_set_diffusivity.F90: sums the enabled contributions into interface
diffusivities Kd_int (and matching viscosities Kv_int):

    Kd = background(profile) + shear(LMD94/PP81 or Jackson-Hallberg-
         Legg kappa-shear) + convection + double diffusion + tidal
         (St Laurent / Simmons bottom-intensified internal-tide
         dissipation) (+ KPP/ePBL boundary layer, applied by the
         diabatic driver which owns the surface forcing context)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.param.vertical.bkgnd_mixing import (BkgndMixingCfg,
                                                  bkgnd_mixing_coeffs)
from mom6_tpu.param.vertical.shear_mixing import (ShearMixingCfg,
                                                  shear_mixing_coeffs)
from mom6_tpu.param.vertical.conv_ddiff import (ConvectionCfg,
                                                convection_coeffs,
                                                DoubleDiffusionCfg,
                                                ddiff_coeffs)
from mom6_tpu.param.vertical.kappa_shear import (KappaShearCfg,
                                                 kappa_shear_coeffs)
from mom6_tpu.param.vertical.tidal_mixing import (TidalMixingCfg,
                                                  tidal_mixing_coeffs)
from mom6_tpu.diagnostics.wave_speed import brunt_vaisala2

__all__ = ["DiffusivityCfg", "set_diffusivity", "DiffusivityResult"]


@dataclasses.dataclass(frozen=True)
class DiffusivityCfg:
    kd: float = 1e-5              # KD background [m2 s-1] (shortcut)
    kd_min: float = 0.0           # KD_MIN
    kd_max: float = -1.0          # KD_MAX (<0: none)
    kv_conversion: float = 1.0    # Prandtl-ish Kv/Kd for returned Kv
    bkgnd: Optional[BkgndMixingCfg] = None
    use_shear: bool = False       # USE_LMD94 / USE_PP81
    shear: ShearMixingCfg = ShearMixingCfg()
    use_conv: bool = False        # USE_CVMix_CONVECTION
    conv: ConvectionCfg = ConvectionCfg()
    use_ddiff: bool = False       # DOUBLE_DIFFUSION
    ddiff: DoubleDiffusionCfg = DoubleDiffusionCfg()
    use_kappa_shear: bool = False  # USE_JACKSON_PARAM
    kappa_shear: KappaShearCfg = KappaShearCfg()
    # PRANDTL_TURB (MOM_set_viscosity.F90:2957 / kappa_shear kv_io):
    # turbulent Prandtl number converting the shear-driven diffusivity
    # into the Kv_shear viscosity the dynamics' vertvisc consumes
    prandtl_turb: float = 1.0
    use_tidal: bool = False       # INT_TIDE_DISSIPATION
    tidal: TidalMixingCfg = TidalMixingCfg()
    # user-prescribed lat/density band diffusivity
    # (USER_CHANGE_DIFFUSIVITY, user_change_diffusivity.F90)
    use_user_kd: bool = False
    user_kd: Optional["UserKdCfg"] = None
    # bottom-drag TKE mixing by the law of the wall
    # (USE_LOTW_BBL_DIFFUSIVITY, MOM_set_diffusivity.F90
    # add_LOTW_BBL_diffusivity :1399)
    use_lotw_bbl: bool = False
    bbl_effic: float = 0.2        # BBL_EFFIC
    lotw_cdrag: float = 0.003     # CDRAG
    lotw_max_decay: float = 200.0  # 1/IMax_decay [m]
    vonkar: float = 0.41
    # ML_RADIATION (add_MLrad_diffusivity, MOM_set_diffusivity.F90
    # :1600): mixed-layer TKE radiating below the ML base
    ml_radiation: bool = False
    ml_rad_coeff: float = 0.2     # ML_RAD_COEFF
    ml_rad_efold: float = 2.0     # ML_RAD_EFOLD_COEFF
    ml_rad_kd_max: float = 1e-3   # ML_RAD_KD_MAX [m2 s-1]
    mstar_mlrad: float = 1.2      # MSTAR
    tke_decay_mlrad: float = 2.5  # TKE_DECAY
    # internal-tide energy flux E(x,y) [W m-2]: a constant here; a 2D
    # field from MOM_int_tide_input can be passed to set_diffusivity
    tidal_energy_flux: float = 0.0


class DiffusivityResult(NamedTuple):
    kd_int: jnp.ndarray
    kv_int: jnp.ndarray
    kd_extra_S: Optional[jnp.ndarray] = None   # double-diff salt excess
    # shear-driven interface viscosity Prandtl_turb * kappa_shear
    # (the visc%Kv_shear the reference carries from the diabatic
    # phase into the next dynamics step's vertvisc,
    # MOM_kappa_shear.F90:330, MOM_vert_friction.F90:1892)
    kv_shear: Optional[jnp.ndarray] = None


def set_diffusivity(h, cfg: DiffusivityCfg, vgrid=None, u=None, v=None,
                    T=None, S=None, eos=None, lat=None,
                    tidal_energy_2d=None, ustar=None, mld=None):
    """Returns DiffusivityResult with (nk+1, ...) interface coeffs.

    tidal_energy_2d: optional internal-tide energy flux E(x,y)
    [W m-2] overriding cfg.tidal_energy_flux."""
    nk = h.shape[0]
    shape = (nk + 1,) + h.shape[1:]
    bk = cfg.bkgnd or BkgndMixingCfg(kd=cfg.kd)
    kd = bkgnd_mixing_coeffs(bk, h, lat)
    kv = cfg.kv_conversion * kd
    kd_extra_S = None
    kv_shear = None

    needs_n2 = (cfg.use_shear or cfg.use_conv or cfg.use_kappa_shear
                or cfg.use_tidal or cfg.use_lotw_bbl
                or cfg.ml_radiation)
    if needs_n2 and vgrid is not None:
        n2 = brunt_vaisala2(vgrid, h, T, S, eos)
        if cfg.use_shear and u is not None:
            ks = shear_mixing_coeffs(cfg.shear, u, v, h, n2)
            kd = kd.at[1:-1].add(ks)
            kv = kv.at[1:-1].add(cfg.prandtl_turb * ks)
            kv_shear = (jnp.zeros(shape, h.dtype) if kv_shear is None
                        else kv_shear).at[1:-1].add(
                cfg.prandtl_turb * ks)
        if cfg.use_kappa_shear and u is not None:
            kj = kappa_shear_coeffs(cfg.kappa_shear, u, v, h, n2)
            kd = kd.at[1:-1].add(kj)
            kv = kv.at[1:-1].add(cfg.prandtl_turb * kj)
            kv_shear = (jnp.zeros(shape, h.dtype) if kv_shear is None
                        else kv_shear).at[1:-1].add(
                cfg.prandtl_turb * kj)
        if cfg.use_conv:
            kc = convection_coeffs(cfg.conv, n2)
            kd = kd.at[1:-1].add(kc)
            kv = kv.at[1:-1].add(0.1 * kc)
        if cfg.use_lotw_bbl and u is not None:
            kb = lotw_bbl_diffusivity(cfg, h, n2, u, v,
                                      absf=absf_2d(h, lat))
            kd = kd.at[1:-1].add(kb)
            kv = kv.at[1:-1].add(kb)
        if cfg.ml_radiation and ustar is not None \
                and mld is not None:
            km = mlrad_diffusivity(cfg, h, n2, ustar, mld,
                                   absf_2d(h, lat))
            kd = kd.at[1:-1].add(km)
            kv = kv.at[1:-1].add(km)
        if cfg.use_tidal:
            e_flux = tidal_energy_2d if tidal_energy_2d is not None \
                else jnp.full_like(h[0], cfg.tidal_energy_flux)
            rho0 = vgrid.Rho0 if vgrid is not None else 1035.0
            kt = tidal_mixing_coeffs(cfg.tidal, h, n2, e_flux,
                                     rho0=rho0)
            kd = kd.at[1:-1].add(kt)
            kv = kv.at[1:-1].add(kt)

    if cfg.use_ddiff and T is not None and eos is not None:
        zs = jnp.cumsum(h, axis=0)
        rho0 = vgrid.Rho0 if vgrid is not None else 1035.0
        g = vgrid.g_Earth if vgrid is not None else 9.8
        p_int = rho0 * g * zs[:-1]
        kd_t, kd_s = ddiff_coeffs(cfg.ddiff, T, S, p_int, eos)
        kd = kd.at[1:-1].add(kd_t)
        kd_extra_S = jnp.zeros(shape, h.dtype).at[1:-1].set(
            jnp.maximum(kd_s - kd_t, 0.0))

    if cfg.use_user_kd and cfg.user_kd is not None and T is not None \
            and eos is not None and lat is not None:
        from mom6_tpu.param.vertical.user_change_diff import \
            user_change_diff
        ku = user_change_diff(cfg.user_kd, h, T, S, eos, lat)
        kd = kd.at[1:-1].add(ku)

    kd = jnp.maximum(kd, cfg.kd_min)
    if cfg.kd_max > 0:
        kd = jnp.minimum(kd, cfg.kd_max)
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return DiffusivityResult(kd_int=kd, kv_int=kv,
                             kd_extra_S=kd_extra_S,
                             kv_shear=kv_shear)


def absf_2d(h, lat, omega: float = 7.2921e-5):
    """|f| at h points from latitude (or a small equatorial floor)."""
    import math
    if lat is None:
        return jnp.full_like(h[0], 1e-5)
    f = jnp.abs(2.0 * omega * jnp.sin(lat * math.pi / 180.0)) + 1e-7
    # cartesian (km-unit) grids carry pseudo-latitudes beyond 90:
    # fall back to a nominal mid-latitude magnitude there
    return jnp.where(jnp.abs(lat) <= 90.0, f, 1e-5)


def lotw_bbl_diffusivity(cfg: DiffusivityCfg, h, n2, u, v, absf):
    """Bottom-drag-TKE diffusivity by the law of the wall
    (add_LOTW_BBL_diffusivity, MOM_set_diffusivity.F90:1399): the
    bottom-friction TKE column cdrag^{3/2}|u_b|^3 * BBL_EFFIC is spent
    upward against Kd_wall = vonKar u*^2 z (D-z) / (u* D + f z (D-z)),
    decaying by exp(-z/decay) with decay = min(u*/f, 200 m); the
    sequential spend is a reverse lax.scan from the bottom."""
    import jax as _jax
    from mom6_tpu.parallel.stencil import im1, jm1
    u_b = 0.5 * (u[-1] + im1(u[-1]))
    v_b = 0.5 * (v[-1] + jm1(v[-1]))
    umag = jnp.sqrt(u_b * u_b + v_b * v_b)
    cdrag = cfg.lotw_cdrag
    ustar = jnp.sqrt(cdrag) * umag
    ustar2 = ustar * ustar
    tke_col = cfg.bbl_effic * (cdrag ** 1.5) * umag ** 3
    idecay = jnp.maximum(1.0 / cfg.lotw_max_decay,
                         absf / jnp.maximum(ustar, 1e-10))
    D = jnp.sum(h, axis=0) + 1e-30
    ustar_D = ustar * D
    n2min = 1e-10

    def step(carry, xs):
        tke_rem, z_bot = carry
        h_k, h_km1, n2_k = xs
        tke_rem = jnp.exp(-idecay * h_k) * tke_rem
        z_b = z_bot + h_k
        dmz = jnp.maximum(D - z_b, 0.0)
        kd_wall = (cfg.vonkar * ustar2 * z_b * dmz) \
            / (ustar_D + absf * (z_b * dmz) + 1e-30)
        dz_int = 0.5 * (h_k + h_km1)
        tke_need = kd_wall * dz_int * jnp.maximum(n2_k, n2min)
        consumed = jnp.minimum(tke_need, tke_rem)
        kd = jnp.where(tke_need > 0.0,
                       kd_wall * consumed / (tke_need + 1e-300), 0.0)
        return (tke_rem - consumed, z_b), kd

    # interfaces K = nk-1 .. 1 (0-based interior), scanning upward
    xs = (h[::-1][:-1], h[::-1][1:], n2[::-1])
    (_, _), kd_rev = _jax.lax.scan(
        step, (tke_col, jnp.zeros_like(D)), xs)
    return kd_rev[::-1]


def mlrad_diffusivity(cfg: DiffusivityCfg, h, n2, ustar, mld, absf):
    """Mixed-layer-radiated TKE mixing below the ML base
    (add_MLrad_diffusivity): the flux MSTAR*ML_RAD_COEFF*u*^3 decays
    below the MLD with I_decay² = TKE_DECAY² f²/u*² + 1/(efold·h_ml)²,
    and each interface converts the flux absorbed across its span to
    Kd = ΔTKE/(dz N²), capped at ML_RAD_KD_MAX.  Closed-form in the
    interface depth (per-column constant decay), no scan needed."""
    us = jnp.maximum(ustar, 1e-8)
    flux0 = cfg.mstar_mlrad * cfg.ml_rad_coeff * us ** 3
    h_ml = jnp.maximum(mld, 1.0)
    hml_sq = (cfg.ml_rad_efold * h_ml) ** 2
    i_dec2 = cfg.tke_decay_mlrad ** 2 * (absf / us) ** 2
    i_decay = jnp.sqrt((i_dec2 * hml_sq + 1.0) / hml_sq)
    z_int = jnp.cumsum(h, axis=0)[:-1]
    dz_int = 0.5 * (h[:-1] + h[1:]) + 1e-30
    below = jnp.maximum(z_int - h_ml[None], 0.0)
    flux = flux0[None] * jnp.exp(-i_decay[None] * below)
    absorbed = flux * (1.0 - jnp.exp(-i_decay[None] * dz_int))
    kd = absorbed / (dz_int * jnp.maximum(n2, 1e-10))
    kd = jnp.where(z_int > h_ml[None], kd, 0.0)
    return jnp.minimum(kd, cfg.ml_rad_kd_max)
