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
    use_tidal: bool = False       # INT_TIDE_DISSIPATION
    tidal: TidalMixingCfg = TidalMixingCfg()
    # internal-tide energy flux E(x,y) [W m-2]: a constant here; a 2D
    # field from MOM_int_tide_input can be passed to set_diffusivity
    tidal_energy_flux: float = 0.0


class DiffusivityResult(NamedTuple):
    kd_int: jnp.ndarray
    kv_int: jnp.ndarray
    kd_extra_S: Optional[jnp.ndarray] = None   # double-diff salt excess


def set_diffusivity(h, cfg: DiffusivityCfg, vgrid=None, u=None, v=None,
                    T=None, S=None, eos=None, lat=None,
                    tidal_energy_2d=None):
    """Returns DiffusivityResult with (nk+1, ...) interface coeffs.

    tidal_energy_2d: optional internal-tide energy flux E(x,y)
    [W m-2] overriding cfg.tidal_energy_flux."""
    nk = h.shape[0]
    shape = (nk + 1,) + h.shape[1:]
    bk = cfg.bkgnd or BkgndMixingCfg(kd=cfg.kd)
    kd = bkgnd_mixing_coeffs(bk, h, lat)
    kv = cfg.kv_conversion * kd
    kd_extra_S = None

    needs_n2 = (cfg.use_shear or cfg.use_conv or cfg.use_kappa_shear
                or cfg.use_tidal)
    if needs_n2 and vgrid is not None:
        n2 = brunt_vaisala2(vgrid, h, T, S, eos)
        if cfg.use_shear and u is not None:
            ks = shear_mixing_coeffs(cfg.shear, u, v, h, n2)
            kd = kd.at[1:-1].add(ks)
            kv = kv.at[1:-1].add(ks)
        if cfg.use_kappa_shear and u is not None:
            kj = kappa_shear_coeffs(cfg.kappa_shear, u, v, h, n2)
            kd = kd.at[1:-1].add(kj)
            kv = kv.at[1:-1].add(kj)
        if cfg.use_conv:
            kc = convection_coeffs(cfg.conv, n2)
            kd = kd.at[1:-1].add(kc)
            kv = kv.at[1:-1].add(0.1 * kc)
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

    kd = jnp.maximum(kd, cfg.kd_min)
    if cfg.kd_max > 0:
        kd = jnp.minimum(kd, cfg.kd_max)
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return DiffusivityResult(kd_int=kd, kv_int=kv,
                             kd_extra_S=kd_extra_S)
