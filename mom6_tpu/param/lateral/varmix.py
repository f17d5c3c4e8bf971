"""Variable mixing coefficient scalings (VarMix).

Re-design of /root/reference/src/parameterizations/lateral/
MOM_lateral_mixing_coeffs.F90: the resolution function
Res(x) = 1/(1 + (Rd/(dx·fn_power))⁻ᵖ)⁻¹-style damping of eddy
parameterizations where the deformation radius is resolved
(calc_resolution_function :214), plus the Visbeck-style |S|N scaling
hooks (slope/Eady-growth pieces are follow-ons sharing this module).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.diagnostics.wave_speed import wave_speed_wkb

__all__ = ["VarMixCfg", "calc_resolution_function", "VarMixResult",
           "calc_eady_rate", "visbeck_kh"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class VarMixCfg:
    use_variable_mixing: bool = False   # USE_VARIABLE_MIXING
    res_scale_meke: bool = False
    res_fn_power: int = 2               # KH_RES_FN_POWER
    res_coef: float = 1.0               # KH_RES_SCALE_COEF
    # Visbeck et al. (1997) thickness diffusivity KH = cff * SN * L^2
    # (calc_Visbeck_coeffs / KHTH_SLOPE_CFF,
    # MOM_lateral_mixing_coeffs.F90:470)
    khth_slope_cff: float = 0.0         # KHTH_SLOPE_CFF
    visbeck_l_scale: float = 0.0        # VISBECK_L_SCALE [m]; <=0 → dx
    # slope cap in the Eady-rate integrand (SLOPE_MAX analog)
    slope_max: float = 1e-2


class VarMixResult(NamedTuple):
    res_fn: jnp.ndarray       # (njh, nih) in [0,1]: 1 → apply full eddy
    rd_dx: jnp.ndarray        # deformation radius / grid spacing


def calc_resolution_function(cfg: VarMixCfg, grid: Grid,
                             vgrid: VerticalGrid, h, T=None, S=None,
                             eos=None, f_min: float = 1e-6):
    """res_fn = 1/(1 + (coef·Rd/dx)^p): ≈1 where eddies are
    unresolved (apply the parameterization), →0 where resolved."""
    c1 = wave_speed_wkb(vgrid, h, T, S, eos)
    # |f| at h points from the corner values
    from mom6_tpu.parallel.stencil import im1, jm1
    f_h = 0.25 * ((jnp.abs(grid.CoriolisBu)
                   + im1(jm1(jnp.abs(grid.CoriolisBu))))
                  + (im1(jnp.abs(grid.CoriolisBu))
                     + jm1(jnp.abs(grid.CoriolisBu))))
    rd = c1 / jnp.maximum(f_h, f_min)
    dx = jnp.sqrt(grid.dxT * grid.dyT)
    rd_dx = rd / jnp.maximum(dx, _EPS)
    res = 1.0 / (1.0 + (cfg.res_coef * rd_dx) ** cfg.res_fn_power)
    return VarMixResult(res_fn=res, rd_dx=rd_dx)


def calc_eady_rate(cfg: VarMixCfg, grid: Grid, vgrid: VerticalGrid,
                   h, T=None, S=None, eos=None):
    """Column Eady growth rate SN [s-1] at h points
    (calc_slope_functions, MOM_lateral_mixing_coeffs.F90:700):
    SN² = (1/D) ∫ S² N² dz with the isopycnal slopes capped at
    SLOPE_MAX; for layered (no-EOS) columns the slope is the
    interface-height gradient and N² the Rlay jumps."""
    from mom6_tpu.parallel.stencil import im1, jm1

    if T is None or eos is None:
        # layered fallback: slopes from interface-height gradients,
        # N² from the Rlay jumps
        zs = jnp.cumsum(h, axis=0)[:-1]
        e = -zs
        sx = (e - im1(e)) * grid.IdxT
        sy = (e - jm1(e)) * grid.IdyT
        s2 = jnp.minimum(sx * sx + sy * sy, cfg.slope_max ** 2)
        rl = vgrid.Rlay.reshape((-1,) + (1,) * (h.ndim - 1))
        dz = 0.5 * (h[:-1] + h[1:]) + _EPS
        n2 = (vgrid.g_Earth / vgrid.Rho0) \
            * jnp.maximum(rl[1:] - rl[:-1], 0.0) / dz
    else:
        from mom6_tpu.core.isopycnal_slopes import (SlopeCfg,
                                                    isoneutral_slopes)
        sl = isoneutral_slopes(
            SlopeCfg(slope_max=cfg.slope_max), grid, vgrid, h, T, S,
            eos)
        sx_h = 0.5 * (sl.slope_x + im1(sl.slope_x))
        sy_h = 0.5 * (sl.slope_y + jm1(sl.slope_y))
        s2 = jnp.minimum(sx_h * sx_h + sy_h * sy_h,
                         cfg.slope_max ** 2)
        n2 = sl.n2
        dz = 0.5 * (h[:-1] + h[1:])
    depth = jnp.sum(h, axis=0) + _EPS
    sn2 = jnp.sum(s2 * jnp.maximum(n2, 0.0) * dz, axis=0) / depth
    return jnp.sqrt(jnp.maximum(sn2, 0.0)) * grid.mask2dT


def visbeck_kh(cfg: VarMixCfg, grid: Grid, sn):
    """Visbeck et al. (1997) thickness diffusivity
    KH = KHTH_SLOPE_CFF · SN · L² (MOM_lateral_mixing_coeffs.F90
    calc_Visbeck_coeffs essence, L the grid scale or
    VISBECK_L_SCALE)."""
    if cfg.khth_slope_cff <= 0.0:
        return None
    L = cfg.visbeck_l_scale if cfg.visbeck_l_scale > 0.0 \
        else jnp.sqrt(grid.areaT)
    return cfg.khth_slope_cff * sn * L * L * grid.mask2dT
