"""Finite-volume PPM continuity solver.

Re-design of /root/reference/src/core/MOM_continuity_PPM.F90 (dispatch
MOM_continuity.F90): directionally-split thickness update with
piecewise-parabolic reconstruction of layer thickness, positive-definite
(or Colella-Woodward monotonic) limiting, upwind parabola-sweep face
fluxes, and the Newton velocity-correction iteration that makes column
transports match a supplied barotropic transport (the
baroclinic↔barotropic consistency glue, zonal_flux_adjust
MOM_continuity_PPM.F90:1171-1200).

All operations are vectorized over the full (nk, njh, nih) block with
`jnp.roll` shifts; Fortran's do_I masks and variable loop bounds become
`jnp.where` masks and halo-validity bookkeeping (each directional sweep
consumes 2 halo cells of validity; callers must present h, u, v with ≥4
valid halo rings, as the reference requests via cont_stencil).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["ContinuityCfg", "ContinuityResult", "continuity_ppm",
           "ppm_edges_x", "ppm_edges_y", "zonal_mass_flux",
           "meridional_mass_flux", "continuity_stencil",
           "BTContFaces", "set_up_bt_cont"]


@dataclasses.dataclass(frozen=True)
class ContinuityCfg:
    """CONTINUITY_SCHEME options (MOM_continuity_PPM.F90 control struct)."""
    upwind_1st: bool = False       # UPWIND_1ST_CONTINUITY
    simple_2nd: bool = False       # SIMPLE_2ND_PPM_CONTINUITY
    monotonic: bool = False        # MONOTONIC_CONTINUITY (CW84 limiter)
    vol_cfl: bool = False          # CONT_PPM_VOLUME_BASED_CFL
    newton_iters: int = 6          # fixed iteration count for flux adjust
    cfl_limit: float = 0.9         # max CFL for velocity corrections
    # CONTINUITY_USE_PALLAS: route transport-matched calls through
    # the fused Pallas TPU kernel (continuity_pallas.py) when the
    # configuration supports it (TPU backend, full-PPM scheme, no
    # OBC/porous faces); equivalence is roundoff-level
    use_pallas_fused: bool = False


def continuity_stencil(cfg: ContinuityCfg) -> int:
    """Halo width the solver needs (MOM_continuity.F90:21)."""
    if cfg.upwind_1st:
        return 2
    return 2 if cfg.simple_2nd else 3


class ContinuityResult(NamedTuple):
    h: jnp.ndarray
    uh: jnp.ndarray
    vh: jnp.ndarray
    u_cor: Optional[jnp.ndarray] = None
    v_cor: Optional[jnp.ndarray] = None
    # the 2D barotropic Newton corrections u_cor = u + visc_rem*du
    # (continuity's du_cor/dv_cor outputs, used by split RK2b to carry
    # the filtered-vs-instantaneous velocity increment across steps)
    du_cor: Optional[jnp.ndarray] = None
    dv_cor: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------
# PPM edge reconstruction
# ---------------------------------------------------------------------

def _ppm_edges(h, mask, shift_p, shift_m, cfg: ContinuityCfg, h_min: float):
    """Shared x/y edge-value construction.

    shift_p(f) = value one cell in +direction; shift_m = −direction.
    Returns (h_minus, h_plus): reconstructed thickness at the cell's
    lower-index edge (W or S) and higher-index edge (E or N).
    """
    if cfg.upwind_1st:
        return h, h

    m_p = shift_p(mask)
    m_m = shift_m(mask)
    h_p = m_p * shift_p(h) + (1.0 - m_p) * h     # neighbor or self at walls
    h_m = m_m * shift_m(h) + (1.0 - m_m) * h

    if cfg.simple_2nd:
        h_minus = 0.5 * (h_m + h)
        h_plus = 0.5 * (h_p + h)
        return h_minus, h_plus

    # 2nd-order slope with the Lin (1994) monotonic constraint
    hp_raw, hm_raw = shift_p(h), shift_m(h)
    slp = 0.5 * (hp_raw - hm_raw)
    dMx = jnp.maximum(jnp.maximum(hp_raw, hm_raw), h) - h
    dMn = h - jnp.minimum(jnp.minimum(hp_raw, hm_raw), h)
    slp = jnp.sign(slp) * jnp.minimum(jnp.abs(slp),
                                      2.0 * jnp.minimum(dMx, dMn))
    slp = jnp.where(shift_p(mask) * mask * shift_m(mask) > 0.0, slp, 0.0)

    one6 = 1.0 / 6.0
    h_minus = 0.5 * (h_m + h) + one6 * (shift_m(slp) - slp)
    h_plus = 0.5 * (h_p + h) + one6 * (slp - shift_p(slp))

    if cfg.monotonic:
        # Colella & Woodward 1984 monotonic limiter
        # if (h_plus - h)*(h - h_minus) <= 0: piecewise constant
        pc = (h_plus - h) * (h - h_minus) <= 0.0
        dh = h_plus - h_minus
        curv = 6.0 * h - 3.0 * (h_minus + h_plus)
        h_minus = jnp.where(pc, h, jnp.where(dh * curv > dh * dh,
                                             3.0 * h - 2.0 * h_plus, h_minus))
        h_plus = jnp.where(pc, h, jnp.where(dh * curv < -dh * dh,
                                            3.0 * h - 2.0 * h_minus, h_plus))
    else:
        # positive-definite limiter (PPM_limit_pos): prevent interior
        # minima of the parabola undershooting h_min
        curv = 3.0 * (h_minus + h_plus - 2.0 * h)
        dh = h_plus - h_minus
        interior_min = (curv > 0.0) & (jnp.abs(dh) < curv)
        denom = curv * curv + 3.0 * dh * dh
        need_scale = 12.0 * curv * (h - h_min) < denom
        scale = jnp.where(denom > 0.0,
                          12.0 * curv * jnp.maximum(h - h_min, 0.0)
                          / jnp.where(denom > 0.0, denom, 1.0), 1.0)
        flat = interior_min & (h <= h_min)
        shrink = interior_min & (~flat) & need_scale
        h_minus = jnp.where(flat, h,
                            jnp.where(shrink, h + scale * (h_minus - h),
                                      h_minus))
        h_plus = jnp.where(flat, h,
                           jnp.where(shrink, h + scale * (h_plus - h),
                                     h_plus))
    return h_minus, h_plus


def ppm_edges_x(grid: Grid, h, cfg: ContinuityCfg, h_min: float):
    """(h_W, h_E) thickness at west/east edges of each cell."""
    return _ppm_edges(h, grid.mask2dT, ip1, im1, cfg, h_min)


def ppm_edges_y(grid: Grid, h, cfg: ContinuityCfg, h_min: float):
    """(h_S, h_N) thickness at south/north edges of each cell."""
    return _ppm_edges(h, grid.mask2dT, jp1, jm1, cfg, h_min)


# ---------------------------------------------------------------------
# Face fluxes
# ---------------------------------------------------------------------

def _flux_1dir(u, h, h_minus, h_plus, dt, dlen_face, Idx_up, Idx_dn,
               Iarea_up, Iarea_dn, shift_p, vol_cfl, face_mask, visc_rem):
    """Upwind PPM face flux and its velocity derivative.

    Face i lies between cell i ("up" side for u>0) and cell i+1 ("dn"
    side for u<0).  Exact integral of the parabola swept past the face
    in dt (zonal_flux_layer, MOM_continuity_PPM.F90:640-706).
    """
    h_dn = shift_p(h)
    hW_dn = shift_p(h_minus)   # "minus" edge of downwind cell
    hE_up = h_plus             # "plus" edge of upwind cell
    hW_up = h_minus
    hE_dn = shift_p(h_plus)

    if vol_cfl:
        cfl_p = (u * dt) * (dlen_face * Iarea_up)
        cfl_m = (-u * dt) * (dlen_face * Iarea_dn)
    else:
        cfl_p = u * dt * Idx_up
        cfl_m = -u * dt * Idx_dn

    curv3_p = hW_up + hE_up - 2.0 * h
    flux_p = dlen_face * u * (
        hE_up + cfl_p * (0.5 * (hW_up - hE_up) + curv3_p * (cfl_p - 1.5)))
    marg_p = hE_up + cfl_p * ((hW_up - hE_up) + 3.0 * curv3_p * (cfl_p - 1.0))

    curv3_m = hW_dn + hE_dn - 2.0 * h_dn
    flux_m = dlen_face * u * (
        hW_dn + cfl_m * (0.5 * (hE_dn - hW_dn) + curv3_m * (cfl_m - 1.5)))
    marg_m = hW_dn + cfl_m * ((hE_dn - hW_dn) + 3.0 * curv3_m * (cfl_m - 1.0))

    pos = u > 0.0
    neg = u < 0.0
    flux = jnp.where(pos, flux_p, jnp.where(neg, flux_m, 0.0)) * face_mask
    h_marg = jnp.where(pos, marg_p,
                       jnp.where(neg, marg_m, 0.5 * (hW_dn + hE_up)))
    dflux_du = dlen_face * h_marg * visc_rem * face_mask
    return flux, dflux_du


def _flux_adjust(u, h, h_minus, h_plus, dt, flux_args, hbt, visc_rem,
                 cfg: ContinuityCfg, dx_face):
    """Newton iteration for a per-face barotropic correction du such
    that sum_k flux_k(u_k + visc_rem_k*du) = hbt (zonal_flux_adjust).

    Fixed iteration count with CFL-bounded clipping in place of the
    reference's Newton-with-bisection loop — branchless and jit-safe.
    Returns (flux, u_cor, du)."""
    du = jnp.zeros_like(hbt)
    du_lim = cfg.cfl_limit * dx_face / dt
    for _ in range(cfg.newton_iters):
        u_try = u + visc_rem * du[None]
        flux, dfdu = _flux_1dir(u_try, h, h_minus, h_plus, dt, *flux_args,
                                visc_rem=visc_rem)
        err = jnp.sum(flux, axis=0) - hbt
        denom = jnp.sum(dfdu, axis=0)
        step = -err / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        du = jnp.clip(du + step, -du_lim, du_lim)
    u_cor = u + visc_rem * du[None]
    flux, _ = _flux_1dir(u_cor, h, h_minus, h_plus, dt, *flux_args,
                         visc_rem=visc_rem)
    return flux, u_cor, du


def _porous_factor(grid: Grid, h, stagger: str):
    """Per-layer open-face fraction when the grid carries subgrid
    (porous-barrier) topography; 1.0 otherwise.  Multiplies the face
    mask so partially blocked faces pass reduced transport
    (MOM_continuity_PPM.F90:167 por_face_areaU)."""
    davg = grid.porous_DavgU if stagger == "U" else grid.porous_DavgV
    if davg is None:
        return None
    from mom6_tpu.core.porous_barriers import porous_widths_from_h
    porU, porV = porous_widths_from_h(grid, h)
    return porU if stagger == "U" else porV


def zonal_mass_flux(grid: Grid, u, h, h_W, h_E, dt, cfg: ContinuityCfg,
                    uhbt=None, visc_rem_u=None):
    """uh at east faces; optionally Newton-corrected to match uhbt.

    Returns (uh, duhdu, u_cor, du) where du is the 2D barotropic
    Newton correction (zonal_flux_adjust's du; None unless uhbt)."""
    vr = visc_rem_u if visc_rem_u is not None else jnp.ones_like(u)
    mask = grid.mask2dCu
    por = _porous_factor(grid, h, "U")
    if por is not None:
        mask = mask * por
    args = (grid.dyCu, grid.IdxT, ip1(grid.IdxT),
            grid.IareaT, ip1(grid.IareaT), ip1,
            cfg.vol_cfl, mask)
    uh, duhdu = _flux_1dir(u, h, h_W, h_E, dt, *args, visc_rem=vr)
    u_cor = du = None
    if uhbt is not None:
        uh, u_cor, du = _flux_adjust(u, h, h_W, h_E, dt, args, uhbt, vr,
                                     cfg, dx_face=grid.dxCu)
    return uh, duhdu, u_cor, du


def meridional_mass_flux(grid: Grid, v, h, h_S, h_N, dt, cfg: ContinuityCfg,
                         vhbt=None, visc_rem_v=None):
    """vh at north faces; optionally Newton-corrected to match vhbt."""
    vr = visc_rem_v if visc_rem_v is not None else jnp.ones_like(v)
    mask = grid.mask2dCv
    por = _porous_factor(grid, h, "V")
    if por is not None:
        mask = mask * por
    args = (grid.dxCv, grid.IdyT, jp1(grid.IdyT),
            grid.IareaT, jp1(grid.IareaT), jp1,
            cfg.vol_cfl, mask)
    vh, dvhdv = _flux_1dir(v, h, h_S, h_N, dt, *args, visc_rem=vr)
    v_cor = dv = None
    if vhbt is not None:
        vh, v_cor, dv = _flux_adjust(v, h, h_S, h_N, dt, args, vhbt, vr,
                                     cfg, dx_face=grid.dyCv)
    return vh, dvhdv, v_cor, dv


# ---------------------------------------------------------------------
# BT_cont: effective face areas as a function of barotropic flow
# ---------------------------------------------------------------------

class BTContFaces(NamedTuple):
    """Nonlinear barotropic face-area curves (BT_cont_type,
    /root/reference/src/core/MOM_variables.F90:334): the total face
    transport as a piecewise cubic/linear function of the barotropic
    velocity, fitted from the layered continuity solver so the
    barotropic subcycle's transports stay consistent with the layers.

    Names follow the reference: for a u face, _W areas apply to
    eastward (u>0) flow drawing from the west cell, _E to westward;
    _0 are the marginal areas at the zero-transport point, _WW/_EE
    the asymptotic areas at the CFL-limited test velocities
    uBT_WW ≥ 0 / uBT_EE ≤ 0 where the curve turns linear."""
    FA_u_EE: jnp.ndarray
    FA_u_E0: jnp.ndarray
    FA_u_W0: jnp.ndarray
    FA_u_WW: jnp.ndarray
    uBT_EE: jnp.ndarray
    uBT_WW: jnp.ndarray
    FA_v_NN: jnp.ndarray
    FA_v_N0: jnp.ndarray
    FA_v_S0: jnp.ndarray
    FA_v_SS: jnp.ndarray
    vBT_NN: jnp.ndarray
    vBT_SS: jnp.ndarray


def _bt_cont_1dir(u, h, h_minus, h_plus, dt, args, vr, cfg, dx_face):
    """Fit one direction's face-area curve (set_zonal_BT_cont,
    MOM_continuity_PPM.F90:1247): probe the layered flux function at
    the zero-transport correction du0 and at CFL-limited corrections
    that make every layer flow one way, then fit the 3-segment
    marginal-area curve the barotropic solver evaluates.

    Perf note: du0 only anchors the PROBE locations — the curve is
    re-anchored to the exact layered transports via the uhbt0 residual
    in btstep — so a short Newton (3 iterations) suffices."""
    zero2 = jnp.zeros_like(u[0])
    # short Newton for the zero-transport correction
    du0 = jnp.zeros_like(zero2)
    du_lim = cfg.cfl_limit * dx_face / dt
    for _ in range(3):
        flux, dfdu = _flux_1dir(u + vr * du0[None], h, h_minus,
                                h_plus, dt, *args, visc_rem=vr)
        err = jnp.sum(flux, axis=0)
        denom = jnp.sum(dfdu, axis=0)
        step = -err / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        du0 = jnp.clip(du0 + step, -du_lim, du_lim)
    du_max = du_lim
    du_cfl = 1.0e-6 * dx_face / dt
    vr_max = jnp.max(vr, axis=0)
    vr_lim = jnp.maximum(vr, 0.1 * vr_max[None]) + 1e-30

    # corrections that turn every layer eastward (duL) / westward (duR)
    duL_req = jnp.max((du_cfl[None] * vr - u) / vr_lim, axis=0)
    duL = jnp.clip(jnp.maximum(du0 + du_cfl, duL_req), 0.0, du_max)
    duR_req = jnp.min(-(u + du_cfl[None] * vr) / vr_lim, axis=0)
    duR = jnp.clip(jnp.minimum(du0 - du_cfl, duR_req), -du_max, 0.0)

    def probe(du):
        flux, dfdu = _flux_1dir(u + vr * du[None], h, h_minus, h_plus,
                                dt, *args, visc_rem=vr)
        return jnp.sum(flux, axis=0), jnp.sum(dfdu, axis=0)

    _, fa_0 = probe(du0)
    uh_l, fa_l = probe(duL)
    uh_r, fa_r = probe(duR)

    def fit(d_probe, uh_tot, fa_far):
        """(FA_0_adj, FA_far, u_turn): cubic-to-linear transition fit
        with the reference's secant-slope regularization."""
        d_safe = jnp.where(d_probe != 0.0, d_probe, 1.0)
        fa_avg = jnp.where(d_probe != 0.0, uh_tot / d_safe, fa_0)
        hi = jnp.maximum(fa_0, fa_far)
        lo = jnp.minimum(fa_0, fa_far)
        fa0_adj = jnp.where(fa_avg < lo, fa_avg, fa_0)
        fa_avg = jnp.clip(fa_avg, lo, hi)
        denom = fa_far - fa0_adj
        degen = jnp.abs(denom) <= 1e-12 * jnp.abs(fa0_adj)
        u_turn = jnp.where(
            degen, 0.0,
            (1.5 * d_probe) * ((fa_far - fa_avg)
                               / jnp.where(degen, 1.0, denom)))
        return fa0_adj, u_turn

    fa_w0, u_ww = fit(duL - du0, uh_l, fa_l)
    fa_e0, u_ee = fit(duR - du0, uh_r, fa_r)
    u_ww = jnp.maximum(u_ww, 0.0)
    u_ee = jnp.minimum(u_ee, 0.0)
    return fa_r, fa_e0, fa_w0, fa_l, u_ee, u_ww


@jax.named_scope("set_up_bt_cont")
def set_up_bt_cont(grid: Grid, vgrid: VerticalGrid, u, v, h, dt,
                   cfg: ContinuityCfg = ContinuityCfg(),
                   visc_rem_u=None, visc_rem_v=None) -> BTContFaces:
    """Build the BT_cont face-area curves for both directions from the
    current state (set_up_BT_cont via continuity_PPM,
    MOM_continuity_PPM.F90:757).  Needs ≥3 valid halo rings on u/v/h."""
    hmin2 = 2.0 * vgrid.angstrom
    vru = visc_rem_u if visc_rem_u is not None else jnp.ones_like(u)
    vrv = visc_rem_v if visc_rem_v is not None else jnp.ones_like(v)

    h_W, h_E = ppm_edges_x(grid, h, cfg, hmin2)
    args_x = (grid.dyCu, grid.IdxT, ip1(grid.IdxT),
              grid.IareaT, ip1(grid.IareaT), ip1,
              cfg.vol_cfl, grid.mask2dCu)
    fa_ee, fa_e0, fa_w0, fa_ww, u_ee, u_ww = _bt_cont_1dir(
        u, h, h_W, h_E, dt, args_x, vru, cfg, grid.dxCu)

    h_S, h_N = ppm_edges_y(grid, h, cfg, hmin2)
    args_y = (grid.dxCv, grid.IdyT, jp1(grid.IdyT),
              grid.IareaT, jp1(grid.IareaT), jp1,
              cfg.vol_cfl, grid.mask2dCv)
    # positional mapping mirrors x: far-negative side → NN (southward
    # flow draws from the north cell), positive side → SS
    fa_nn, fa_n0, fa_s0, fa_ss, v_nn, v_ss = _bt_cont_1dir(
        v, h, h_S, h_N, dt, args_y, vrv, cfg, grid.dyCv)

    return BTContFaces(FA_u_EE=fa_ee, FA_u_E0=fa_e0, FA_u_W0=fa_w0,
                       FA_u_WW=fa_ww, uBT_EE=u_ee, uBT_WW=u_ww,
                       FA_v_NN=fa_nn, FA_v_N0=fa_n0, FA_v_S0=fa_s0,
                       FA_v_SS=fa_ss, vBT_NN=v_nn, vBT_SS=v_ss)


# ---------------------------------------------------------------------
# Full directionally-split update
# ---------------------------------------------------------------------

@jax.named_scope("continuity")
def continuity_ppm(grid: Grid, vgrid: VerticalGrid, u, v, h, dt,
                   cfg: ContinuityCfg = ContinuityCfg(),
                   uhbt=None, vhbt=None,
                   visc_rem_u=None, visc_rem_v=None,
                   x_first: bool = True) -> ContinuityResult:
    """h(n+1), uh, vh from the directionally split PPM update
    (continuity_PPM, MOM_continuity_PPM.F90:86).

    The sweep order alternates per call via ``x_first`` mirroring
    G%first_direction (MOM.F90:1371).  Inputs must have ≥4 valid halo
    rings; the result's compute domain is fully valid, halos are not.
    """
    h_min = vgrid.angstrom
    hmin2 = 2.0 * vgrid.angstrom

    def x_sweep(hx):
        h_W, h_E = ppm_edges_x(grid, hx, cfg, hmin2)
        uh, _, u_cor, du = zonal_mass_flux(grid, u, hx, h_W, h_E, dt, cfg,
                                           uhbt=uhbt,
                                           visc_rem_u=visc_rem_u)
        h_new = jnp.maximum(
            hx - dt * grid.IareaT * (uh - im1(uh)), h_min)
        return h_new, uh, u_cor, du

    def y_sweep(hy):
        h_S, h_N = ppm_edges_y(grid, hy, cfg, hmin2)
        vh, _, v_cor, dv = meridional_mass_flux(grid, v, hy, h_S, h_N,
                                                dt, cfg, vhbt=vhbt,
                                                visc_rem_v=visc_rem_v)
        h_new = jnp.maximum(
            hy - dt * grid.IareaT * (vh - jm1(vh)), h_min)
        return h_new, vh, v_cor, dv

    if x_first:
        h1, uh, u_cor, du = x_sweep(h)
        h2, vh, v_cor, dv = y_sweep(h1)
    else:
        h1, vh, v_cor, dv = y_sweep(h)
        h2, uh, u_cor, du = x_sweep(h1)
    return ContinuityResult(h=h2, uh=uh, vh=vh, u_cor=u_cor, v_cor=v_cor,
                            du_cor=du, dv_cor=dv)
