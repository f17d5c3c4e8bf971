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
    # GILL_EQUATORIAL_LD: Gill's equatorial deformation radius puts a
    # factor 2 on the beta term of the denominator; False is
    # Pedlosky's definition (MOM_lateral_mixing_coeffs.F90:1507)
    gill_equatorial_ld: bool = True
    # INTERPOLATE_RES_FN: average the h-point Res_fn to velocity
    # faces instead of evaluating the face-centered formula directly
    # (MOM_lateral_mixing_coeffs.F90:1494,374-381; default False =
    # direct evaluation, the reference default)
    interpolate_res_fn: bool = False
    # VARMIX_KTOP: shallowest interface (Fortran numbering, K=2 is
    # below layer 1) entering the SN integral
    # (calc_slope_functions_using_just_e, :829)
    varmix_ktop: int = 2
    # USE_STORED_SLOPES (MOM_lateral_mixing_coeffs.F90:1279,495):
    # True -> the Eady rate uses true EOS isoneutral slopes
    # (calc_Visbeck_coeffs_old on calc_isoneutral_slopes output);
    # False (reference default) -> slopes from interface-height
    # gradients only (calc_slope_functions_using_just_e)
    use_stored_slopes: bool = False


class VarMixResult(NamedTuple):
    res_fn: jnp.ndarray       # (njh, nih) in [0,1]: 1 → apply full eddy
    rd_dx: jnp.ndarray        # deformation radius / grid spacing
    res_fn_u: jnp.ndarray | None = None   # at u faces
    res_fn_v: jnp.ndarray | None = None   # at v faces


def _res_fn(dx_term2, cg1, coef, power):
    """Res_fn = dx_term^p / (dx_term^p + (coef·cg1)^p) with
    dx_term2 = f²dx² + cg1·βdx² (the squared length-scale term);
    power >= 100 is the sharp cutoff limit
    (calc_resoln_function, MOM_lateral_mixing_coeffs.F90:310-459)."""
    if power >= 100:
        return jnp.where((coef * cg1) ** 2 > dx_term2, 0.0, 1.0)
    if power == 2:
        return dx_term2 / (dx_term2 + (coef * cg1) ** 2)
    if power % 2 == 0:
        dxt = dx_term2 ** (power // 2)
        return dxt / (dxt + (coef * cg1) ** power)
    dxt = jnp.sqrt(dx_term2) ** power
    return dxt / (dxt + (coef * cg1) ** power)


def calc_resolution_function(cfg: VarMixCfg, grid: Grid,
                             vgrid: VerticalGrid, h, T=None, S=None,
                             eos=None, f_min: float = 1e-17):
    """Resolution function ≈1 where the deformation radius is
    unresolved (apply the full eddy parameterization), →0 where
    resolved (calc_resoln_function, MOM_lateral_mixing_coeffs.F90:
    214-459): Res_fn = dx_term/(dx_term + (coef·cg1)^p) with
    dx_term = (f²·(dx²+dy²) + cg1·β·(dx²+dy²))^(p/2), the β term
    carrying Gill's (factor 2, default) or Pedlosky's equatorial
    deformation radius (GILL_EQUATORIAL_LD, :1507-1596).  ``f_min``
    is VERY_SMALL_FREQUENCY (:1284)."""
    from mom6_tpu.parallel.stencil import im1, ip1, jm1, jp1
    c1 = wave_speed_wkb(vgrid, h, T, S, eos)
    fB = grid.CoriolisBu
    fB2 = fB * fB
    one_or_two = 2.0 if cfg.gill_equatorial_ld else 1.0
    # corner-difference |grad f| pieces: x-differences live at v
    # faces, y-differences at u faces (:1574-1581)
    dfx = (fB - im1(fB)) * grid.IdxCv
    dfy = (fB - jm1(fB)) * grid.IdyCu
    dfx2, dfy2 = dfx * dfx, dfy * dfy

    # --- h points ---
    f2_h = 0.25 * ((fB2 + im1(jm1(fB2))) + (im1(fB2) + jm1(fB2)))
    L2_h = grid.dxT ** 2 + grid.dyT ** 2
    f2_dx2_h = L2_h * jnp.maximum(f2_h, f_min ** 2)
    beta_dx2_h = one_or_two * L2_h * jnp.sqrt(
        0.5 * ((dfx2 + jm1(dfx2)) + (dfy2 + im1(dfy2))))
    dx_term_h = f2_dx2_h + c1 * beta_dx2_h
    rd_dx = c1 / jnp.sqrt(jnp.maximum(dx_term_h, _EPS))
    res_h = _res_fn(dx_term_h, c1, cfg.res_coef, cfg.res_fn_power)

    if cfg.interpolate_res_fn:
        res_u = 0.5 * (res_h + ip1(res_h))
        res_v = 0.5 * (res_h + jp1(res_h))
    else:
        # --- u faces (:1527-1540) ---
        L2_u = grid.dxCu ** 2 + grid.dyCu ** 2
        f2_u = jnp.maximum(0.5 * (fB2 + jm1(fB2)), f_min ** 2)
        beta_u = one_or_two * L2_u * jnp.sqrt(
            0.25 * ((jm1(dfx2) + ip1(dfx2))
                    + (ip1(jm1(dfx2)) + dfx2)) + dfy2)
        cg1_u = 0.5 * (c1 + ip1(c1))
        res_u = _res_fn(L2_u * f2_u + cg1_u * beta_u, cg1_u,
                        cfg.res_coef, cfg.res_fn_power)
        # --- v faces (:1542-1556) ---
        L2_v = grid.dxCv ** 2 + grid.dyCv ** 2
        f2_v = jnp.maximum(0.5 * (fB2 + im1(fB2)), f_min ** 2)
        beta_v = one_or_two * L2_v * jnp.sqrt(
            dfx2 + 0.25 * ((im1(dfy2) + jp1(dfy2))
                           + (jp1(im1(dfy2)) + dfy2)))
        cg1_v = 0.5 * (c1 + jp1(c1))
        res_v = _res_fn(L2_v * f2_v + cg1_v * beta_v, cg1_v,
                        cfg.res_coef, cfg.res_fn_power)
    return VarMixResult(res_fn=res_h, rd_dx=rd_dx,
                        res_fn_u=res_u, res_fn_v=res_v)


def calc_eady_rate(cfg: VarMixCfg, grid: Grid, vgrid: VerticalGrid,
                   h, T=None, S=None, eos=None):
    """Column Eady growth rate SN [s-1] at h points
    (calc_slope_functions, MOM_lateral_mixing_coeffs.F90:700):
    SN² = (1/D) ∫ S² N² dz with the isopycnal slopes capped at
    SLOPE_MAX; for layered (no-EOS) columns the slope is the
    interface-height gradient and N² the Rlay jumps."""
    from mom6_tpu.parallel.stencil import im1, jm1

    if T is None or eos is None or not cfg.use_stored_slopes:
        # calc_slope_functions_using_just_e: slopes from interface-
        # height gradients, N² from the coordinate (Rlay) jumps —
        # the reference default; USE_STORED_SLOPES selects the
        # EOS-slope branch below
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
    if cfg.varmix_ktop > 2:
        # VARMIX_KTOP: exclude interfaces above K=ktop (Fortran
        # numbering; interface idx k ↔ K=k+2) from the SN integral
        # (calc_slope_functions_using_just_e loops K=nz,ktop,-1)
        kidx = jnp.arange(s2.shape[0]).reshape(
            (-1,) + (1,) * (s2.ndim - 1))
        s2 = jnp.where(kidx >= cfg.varmix_ktop - 2, s2, 0.0)
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
