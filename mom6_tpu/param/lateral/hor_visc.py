"""Horizontal (along-layer) viscosity.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_hor_visc.F90:245 horizontal_viscosity: stress-tensor Laplacian and
biharmonic friction with constant, velocity-scale (KH_VEL_SCALE /
AH_VEL_SCALE, :2516,:2604), Smagorinsky (1963), and Leith (1996)
nonlinear coefficients (incl. the modified Leith divergence-gradient
term), anisotropic viscosity along a fixed direction (:1154-1221,
:1545-1592), and the CFL stability bounds.  Horizontal tension sh_xx
lives at h points, shearing strain sh_xy at q points; the divergence
of the thickness-weighted stress gives (diffu, diffv).

Following the reference, nonlinear coefficients combine with the
background by ``max`` (or by addition with ADD_LES_VISCOSITY), and
the Leith coefficients are Δ³|∇ω|/π³ (Laplacian, :1095-1103) and
Δ⁶|∇²ω|/π⁶ (biharmonic, :1251-1255).  (GME/backscatter remains the
one absent option; it needs the MEKE energy threaded in.)
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["HorViscCfg", "horizontal_viscosity"]

_H_NEGLECT = 1e-20
_INV_PI3 = 1.0 / math.pi ** 3
_INV_PI6 = _INV_PI3 * _INV_PI3


@dataclasses.dataclass(frozen=True)
class HorViscCfg:
    kh: float = 0.0               # KH background Laplacian [m2 s-1]
    ah: float = 0.0               # AH background biharmonic [m4 s-1]
    kh_vel_scale: float = 0.0     # KH_VEL_SCALE [m s-1]: Kh >= vel*Δ
    ah_vel_scale: float = 0.0     # AH_VEL_SCALE [m s-1]: Ah >= vel*Δ³
    smag_lap_const: float = 0.0   # SMAG_LAP_CONST (SMAGORINSKY_KH)
    smag_bi_const: float = 0.0    # SMAG_BI_CONST (SMAGORINSKY_AH)
    leith_kh: bool = False        # LEITH_KH
    leith_lap_const: float = 0.0  # LEITH_LAP_CONST
    leith_ah: bool = False        # LEITH_AH
    leith_bi_const: float = 0.0   # LEITH_BI_CONST
    modified_leith: bool = False  # MODIFIED_LEITH (adds |grad div|)
    add_les_viscosity: bool = False   # ADD_LES_VISCOSITY
    anisotropic: bool = False     # ANISOTROPIC_VISCOSITY
    kh_aniso: float = 0.0         # KH_ANISO [m2 s-1]
    aniso_n: tuple = (1.0, 0.0)   # ANISO_GRID_DIR direction (n1, n2)
    laplacian: bool = False       # LAPLACIAN
    biharmonic: bool = False      # BIHARMONIC
    no_slip: bool = False         # NOSLIP
    bound_coef: bool = True       # BOUND_KH/BOUND_AH CFL-stability bounds
    dt: float = 3600.0            # used only for the stability bounds
    use_zb2020: bool = False      # USE_ZB2020 (added to diffu/diffv)
    zb_scaling: float = 0.5       # ZB_SCALING
    zb_type: int = 0              # ZB_TYPE
    zb_cons: int = 0              # ZB_CONS
    # GME backscatter (USE_GME, MOM_hor_visc.F90:1685): anti-viscous
    # stress proportional to the BAROTROPIC strain with the GM
    # thickness diffusivity as the coefficient
    use_gme: bool = False         # USE_GME
    gme_h0: float = 1000.0        # GME_H0 [m]
    gme_efficiency: float = 1.0   # GME_EFFICIENCY
    gme_limiter: float = 1.0e7    # GME_LIMITER [m2 s-1]
    gme_kh: float = 0.0           # GM KH fed back (KHTH)
    # USE_LAND_MASK_FOR_HVISC (MOM_hor_visc.F90:705,2270, default
    # true): mask each CELL's thickness before averaging to faces, so
    # arbitrary land values never enter hq; coast faces get half the
    # wet thickness (the face-mask product would zero them and kill
    # the NOSLIP wall stress)
    use_land_mask: bool = True
    # open-boundary treatment of the shear/vorticity at segment
    # q-points and of the biharmonic Laplacian at segment faces
    # (MOM_open_boundary.F90:468-516; applied in MOM_hor_visc.F90:735,
    # :889, :1388)
    obc_zero_vorticity: bool = False    # OBC_ZERO_VORTICITY
    obc_freeslip_vorticity: bool = False  # OBC_FREESLIP_VORTICITY
    obc_zero_strain: bool = False       # OBC_ZERO_STRAIN
    obc_freeslip_strain: bool = False   # OBC_FREESLIP_STRAIN
    obc_zero_biharmonic: bool = False   # OBC_ZERO_BIHARMONIC


class HorViscResult(NamedTuple):
    diffu: jnp.ndarray
    diffv: jnp.ndarray


def _obc_qline(f, obc, comps):
    """Zero the given shear/vorticity component field at the q-point
    line of each open edge (the reference's per-segment loops,
    MOM_hor_visc.F90:735-770).  ``comps`` selects which edges act:
    'ns' (N/S segments), 'ew', or 'both'."""
    H = obc.halo
    nj, ni = obc.njl, obc.nil
    if comps in ("ns", "both"):
        if obc.open_n:
            jq = H + nj - 1
            line = obc.strip_n[jq, :] > 0 \
                if obc.strip_n is not None else True
            f = f.at[..., jq, :].set(
                jnp.where(line, 0.0, f[..., jq, :]))
        if obc.open_s:
            jq = H - 1
            line = obc.strip_s[H, :] > 0 \
                if obc.strip_s is not None else True
            f = f.at[..., jq, :].set(
                jnp.where(line, 0.0, f[..., jq, :]))
    if comps in ("ew", "both"):
        if obc.open_e:
            iq = H + ni - 1
            line = obc.strip_e[:, iq] > 0 \
                if obc.strip_e is not None else True
            f = f.at[..., :, iq].set(
                jnp.where(line, 0.0, f[..., :, iq]))
        if obc.open_w:
            iq = H - 1
            line = obc.strip_w[:, H] > 0 \
                if obc.strip_w is not None else True
            f = f.at[..., :, iq].set(
                jnp.where(line, 0.0, f[..., :, iq]))
    return f


def _strains(grid: Grid, u, v, no_slip: bool, obc=None,
             cfg: "HorViscCfg | None" = None):
    DY_dxT = grid.dyT * grid.IdxT
    DX_dyT = grid.dxT * grid.IdyT
    DY_dxBu = grid.dyBu * grid.IdxBu
    DX_dyBu = grid.dxBu * grid.IdyBu
    dudx = DY_dxT * (grid.IdyCu * u - im1(grid.IdyCu * u))
    dvdy = DX_dyT * (grid.IdxCv * v - jm1(grid.IdxCv * v))
    sh_xx = dudx - dvdy
    dvdx = DY_dxBu * (ip1(grid.IdyCv * v) - grid.IdyCv * v)
    dudy = DX_dyBu * (jp1(grid.IdxCu * u) - grid.IdxCu * u)
    s_dvdx, s_dudy = dvdx, dudy          # strain components
    v_dvdx, v_dudy = dvdx, dudy          # vorticity components
    if obc is not None and cfg is not None:
        # OBC_ZERO_STRAIN kills both components at segment q-points;
        # OBC_FREESLIP_STRAIN only the cross-boundary gradient of the
        # tangential velocity (dudy on N/S, dvdx on E/W); likewise for
        # the vorticity flags (MOM_hor_visc.F90:735-770)
        if cfg.obc_zero_strain:
            s_dvdx = _obc_qline(s_dvdx, obc, "both")
            s_dudy = _obc_qline(s_dudy, obc, "both")
        elif cfg.obc_freeslip_strain:
            s_dudy = _obc_qline(s_dudy, obc, "ns")
            s_dvdx = _obc_qline(s_dvdx, obc, "ew")
        if cfg.obc_zero_vorticity:
            v_dvdx = _obc_qline(v_dvdx, obc, "both")
            v_dudy = _obc_qline(v_dudy, obc, "both")
        elif cfg.obc_freeslip_vorticity:
            v_dudy = _obc_qline(v_dudy, obc, "ns")
            v_dvdx = _obc_qline(v_dvdx, obc, "ew")
    if no_slip:
        sh_xy = (2.0 - grid.mask2dBu) * (s_dvdx + s_dudy)
    else:
        sh_xy = grid.mask2dBu * (s_dvdx + s_dudy)
    return sh_xx, sh_xy, dudx + dvdy, v_dvdx - v_dudy


def _combine(base, les, add):
    """Reference semantics: nonlinear coefficients take the max with
    the background unless ADD_LES_VISCOSITY."""
    return base + les if add else jnp.maximum(base, les)


def _smooth9(f):
    """One 9-point smoothing pass (the smooth_GME diffusive filter)."""
    c = 0.25 * f
    e = 0.125 * (ip1(f) + im1(f) + jp1(f) + jm1(f))
    x = 0.0625 * (ip1(jp1(f)) + im1(jp1(f))
                  + ip1(jm1(f)) + im1(jm1(f)))
    return c + e + x


@jax.named_scope("hor_visc")
def horizontal_viscosity(grid: Grid, u, v, h,
                         cfg: HorViscCfg = HorViscCfg(),
                         u_bt=None, v_bt=None,
                         htot=None, kh_scale=None,
                         kh_extra=None, obc=None) -> HorViscResult:
    """(diffu, diffv) [m s-2] from Laplacian+biharmonic friction.

    Needs u, v valid to ≥2 halo rings, h to ≥1.  With USE_GME the
    caller supplies the (2D) barotropic velocities and column depth;
    the GME stress backscatters energy at the barotropic strain.
    ``kh_scale``: optional (njh, nih) multiplier on the Laplacian
    viscosity (the VarMix resolution function, RESOLN_SCALED_KH,
    MOM_hor_visc.F90 Kh *= VarMix%Res_fn_h).
    ``kh_extra``: optional (njh, nih) ADDITIVE Laplacian viscosity at
    h points (MEKE%Ku, MOM_hor_visc.F90:1145-1149), applied after the
    resolution scaling and subject to the CFL bound; may be negative
    (backscatter) — the bound then clips from below as well."""
    zb_u = zb_v = None
    if cfg.use_zb2020:
        from mom6_tpu.param.lateral.zanna_bolton import (ZB2020Cfg,
                                                         zb2020_accel)
        zb = zb2020_accel(grid, u, v, h,
                          ZB2020Cfg(amplitude=cfg.zb_scaling,
                                    zb_type=cfg.zb_type,
                                    zb_cons=cfg.zb_cons))
        zb_u, zb_v = zb.du, zb.dv
    if not (cfg.laplacian or cfg.biharmonic):
        z = jnp.zeros_like(u)
        if zb_u is not None:
            return HorViscResult(zb_u, zb_v)
        return HorViscResult(z, z)

    dy2h = grid.dyT * grid.dyT
    dx2h = grid.dxT * grid.dxT
    dy2q = grid.dyBu * grid.dyBu
    dx2q = grid.dxBu * grid.dxBu

    sh_xx, sh_xy, div_xx, vort_xy = _strains(grid, u, v, cfg.no_slip,
                                             obc=obc, cfg=cfg)

    # grid spacing scales for the nonlinear coefficients and bounds
    grid_sp_h2 = (2.0 * dx2h * dy2h) / (dx2h + dy2h + _H_NEGLECT)
    grid_sp_q2 = (2.0 * dx2q * dy2q) / (dx2q + dy2q + _H_NEGLECT)
    grid_sp_h3 = grid_sp_h2 * jnp.sqrt(grid_sp_h2)
    grid_sp_q3 = grid_sp_q2 * jnp.sqrt(grid_sp_q2)

    def shear_mag_h():
        xy2 = 0.25 * ((sh_xy * sh_xy + im1(jm1(sh_xy * sh_xy)))
                      + (im1(sh_xy * sh_xy) + jm1(sh_xy * sh_xy)))
        return jnp.sqrt(sh_xx * sh_xx + xy2)

    def shear_mag_q():
        xx2 = 0.25 * ((sh_xx * sh_xx + ip1(jp1(sh_xx * sh_xx)))
                      + (ip1(sh_xx * sh_xx) + jp1(sh_xx * sh_xx)))
        return jnp.sqrt(sh_xy * sh_xy + xx2)

    use_leith = cfg.leith_kh or cfg.leith_ah
    if use_leith:
        # vorticity gradient (MOM_hor_visc.F90:934-943): d/dx at
        # v-points, d/dy at u-points
        DY_dxBu = grid.dyBu * grid.IdxBu
        DX_dyBu = grid.dxBu * grid.IdyBu
        vdx = DY_dxBu * (vort_xy * grid.IdyCu
                         - im1(vort_xy * grid.IdyCu))
        vdy = DX_dyBu * (vort_xy * grid.IdxCv
                         - jm1(vort_xy * grid.IdxCv))
        gvort_h = jnp.sqrt((0.5 * (vdx + jm1(vdx))) ** 2
                           + (0.5 * (vdy + im1(vdy))) ** 2)
        gvort_q = jnp.sqrt((0.5 * (vdx + ip1(vdx))) ** 2
                           + (0.5 * (vdy + jp1(vdy))) ** 2)
        if cfg.modified_leith:
            # add the divergence-gradient magnitude (full Leith)
            ddx = (ip1(div_xx) - div_xx) * grid.IdxCu
            ddy = (jp1(div_xx) - div_xx) * grid.IdyCv
            gdiv_h = jnp.sqrt((0.5 * (ddx + im1(ddx))) ** 2
                              + (0.5 * (ddy + jm1(ddy))) ** 2)
            gdiv_q = jnp.sqrt((0.5 * (ddx + jp1(ddx))) ** 2
                              + (0.5 * (ddy + ip1(ddy))) ** 2)
            gvort_h = gvort_h + gdiv_h
            gvort_q = gvort_q + gdiv_q
        if cfg.leith_ah:
            # Laplacian of vorticity at q, averaged to h (:965,:1251)
            d2v_q = (DY_dxBu * (ip1(vdx * grid.IdyCv)
                                - vdx * grid.IdyCv)
                     + DX_dyBu * (jp1(vdy * grid.IdxCu)
                                  - vdy * grid.IdxCu))
            d2v_h = 0.25 * ((d2v_q + im1(jm1(d2v_q)))
                            + (im1(d2v_q) + jm1(d2v_q)))

    str_xx = jnp.zeros_like(sh_xx)
    str_xy = jnp.zeros_like(sh_xy)

    if cfg.laplacian:
        # background: constant or velocity-scale floor (:2516)
        Kh_h = jnp.maximum(
            jnp.asarray(cfg.kh),
            cfg.kh_vel_scale * jnp.sqrt(grid_sp_h2))
        Kh_q = jnp.maximum(
            jnp.asarray(cfg.kh),
            cfg.kh_vel_scale * jnp.sqrt(grid_sp_q2))
        if cfg.smag_lap_const > 0.0:
            Kh_h = _combine(Kh_h, cfg.smag_lap_const * grid_sp_h2
                            * shear_mag_h(), cfg.add_les_viscosity)
            Kh_q = _combine(Kh_q, cfg.smag_lap_const * grid_sp_q2
                            * shear_mag_q(), cfg.add_les_viscosity)
        if cfg.leith_kh:
            Kh_h = _combine(Kh_h, cfg.leith_lap_const * grid_sp_h3
                            * gvort_h * _INV_PI3, cfg.add_les_viscosity)
            Kh_q = _combine(Kh_q, cfg.leith_lap_const * grid_sp_q3
                            * gvort_q * _INV_PI3, cfg.add_les_viscosity)
        if cfg.anisotropic:
            n1, n2 = cfg.aniso_n
            nmag = math.hypot(n1, n2) or 1.0
            n1, n2 = n1 / nmag, n2 / nmag
            n1n2 = n1 * n2
            n11_m_n22 = n1 * n1 - n2 * n2
            # isotropic part of the anisotropic tensor (:1157, :1545)
            Kh_h = Kh_h + cfg.kh_aniso * (1.0 - n1n2 ** 2)
            Kh_q = Kh_q + cfg.kh_aniso * n1n2 ** 2
        if kh_scale is not None:
            from mom6_tpu.parallel.stencil import ip1 as _ip1j, \
                jp1 as _jp1j
            Kh_h = Kh_h * kh_scale
            # corner-point scale: 4-point mean of the h-point field
            ks_q = 0.25 * ((kh_scale + _ip1j(_jp1j(kh_scale)))
                           + (_ip1j(kh_scale) + _jp1j(kh_scale)))
            Kh_q = Kh_q * ks_q
        if kh_extra is not None:
            from mom6_tpu.parallel.stencil import ip1 as _ip1k, \
                jp1 as _jp1k
            Kh_h = Kh_h + kh_extra
            Kh_q = Kh_q + 0.25 * ((kh_extra + _ip1k(_jp1k(kh_extra)))
                                  + (_ip1k(kh_extra)
                                     + _jp1k(kh_extra)))
        if cfg.bound_coef:
            Kh_h = jnp.minimum(Kh_h, 0.2 * grid_sp_h2 / cfg.dt)
            Kh_q = jnp.minimum(Kh_q, 0.2 * grid_sp_q2 / cfg.dt)
            if kh_extra is not None:
                # negative (backscatter) Ku: bound from below too
                Kh_h = jnp.maximum(Kh_h, -0.2 * grid_sp_h2 / cfg.dt)
                Kh_q = jnp.maximum(Kh_q, -0.2 * grid_sp_q2 / cfg.dt)
        str_xx = str_xx - Kh_h * sh_xx
        str_xy = str_xy - Kh_q * sh_xy
        if cfg.anisotropic and cfg.kh_aniso != 0.0:
            # cross-components of the direction tensor (:1221, :1592)
            strain_h = 0.25 * ((sh_xy + im1(jm1(sh_xy)))
                               + (im1(sh_xy) + jm1(sh_xy)))
            strain_q = 0.25 * ((sh_xx + ip1(jp1(sh_xx)))
                               + (ip1(sh_xx) + jp1(sh_xx)))
            str_xx = str_xx - cfg.kh_aniso * n1n2 * n11_m_n22 * strain_h
            str_xy = str_xy - cfg.kh_aniso * n1n2 * n11_m_n22 * strain_q

    if cfg.biharmonic:
        Idxdy2u = grid.IdxCu * grid.IdyCu * grid.IdyCu
        Idx2dyCu = grid.IdxCu * grid.IdxCu * grid.IdyCu
        Idxdy2v = grid.IdxCv * grid.IdyCv * grid.IdyCv
        Idx2dyCv = grid.IdxCv * grid.IdxCv * grid.IdyCv
        Del2u = (Idxdy2u * (ip1(dy2h * sh_xx) - dy2h * sh_xx)
                 + Idx2dyCu * (dx2q * sh_xy - jm1(dx2q * sh_xy)))
        Del2v = (Idxdy2v * (dy2q * sh_xy - im1(dy2q * sh_xy))
                 - Idx2dyCv * (jp1(dx2h * sh_xx) - dx2h * sh_xx))
        if obc is not None and cfg.obc_zero_biharmonic:
            # zero the flow Laplacian at segment faces so no
            # biharmonic stress acts across the boundary
            # (MOM_hor_visc.F90:889-900): Del2u on E/W segments,
            # Del2v on N/S
            H_o = obc.halo
            if obc.open_e:
                iq = H_o + obc.nil - 1
                line = obc.strip_e[:, iq] > 0 \
                    if obc.strip_e is not None else True
                Del2u = Del2u.at[..., :, iq].set(
                    jnp.where(line, 0.0, Del2u[..., :, iq]))
            if obc.open_w:
                line = obc.strip_w[:, H_o] > 0 \
                    if obc.strip_w is not None else True
                Del2u = Del2u.at[..., :, H_o - 1].set(
                    jnp.where(line, 0.0, Del2u[..., :, H_o - 1]))
            if obc.open_n:
                jq = H_o + obc.njl - 1
                line = obc.strip_n[jq, :] > 0 \
                    if obc.strip_n is not None else True
                Del2v = Del2v.at[..., jq, :].set(
                    jnp.where(line, 0.0, Del2v[..., jq, :]))
            if obc.open_s:
                line = obc.strip_s[H_o, :] > 0 \
                    if obc.strip_s is not None else True
                Del2v = Del2v.at[..., H_o - 1, :].set(
                    jnp.where(line, 0.0, Del2v[..., H_o - 1, :]))
        bh_xx, bh_xy, _, _ = _strains(grid, Del2u, Del2v, cfg.no_slip,
                                      obc=obc, cfg=cfg)
        # background: constant or velocity-scale floor (:2604)
        Ah_h = jnp.maximum(jnp.asarray(cfg.ah),
                           cfg.ah_vel_scale * grid_sp_h3)
        Ah_q = jnp.maximum(jnp.asarray(cfg.ah),
                           cfg.ah_vel_scale * grid_sp_q3)
        if cfg.smag_bi_const > 0.0:
            Ah_h = _combine(Ah_h, cfg.smag_bi_const * grid_sp_h2
                            * grid_sp_h2 / 16.0 * shear_mag_h(),
                            cfg.add_les_viscosity)
            Ah_q = _combine(Ah_q, cfg.smag_bi_const * grid_sp_q2
                            * grid_sp_q2 / 16.0 * shear_mag_q(),
                            cfg.add_les_viscosity)
        if cfg.leith_ah:
            Ah_h = _combine(Ah_h, cfg.leith_bi_const * grid_sp_h3
                            * grid_sp_h3 * jnp.abs(d2v_h) * _INV_PI6,
                            cfg.add_les_viscosity)
            Ah_q = _combine(Ah_q, cfg.leith_bi_const * grid_sp_q3
                            * grid_sp_q3 * jnp.abs(d2v_q) * _INV_PI6,
                            cfg.add_les_viscosity)
        if cfg.bound_coef:
            Ah_h = jnp.minimum(Ah_h, 0.012 * grid_sp_h2 ** 2 / cfg.dt)
            Ah_q = jnp.minimum(Ah_q, 0.012 * grid_sp_q2 ** 2 / cfg.dt)
        str_xx = str_xx + Ah_h * bh_xx
        str_xy = str_xy + Ah_q * bh_xy

    if cfg.use_gme and u_bt is not None:
        # GME (:1685-1708): anti-viscous stress at the barotropic
        # strain, coefficient = efficiency·min(htot/H0,1)²·KH_GM,
        # capped and smoothed once
        sh_xx_bt, sh_xy_bt, _, _ = _strains(grid, u_bt, v_bt,
                                            cfg.no_slip)
        if htot is None:
            htot = jnp.sum(h, axis=0)
        effic_h = cfg.gme_efficiency * grid.mask2dT \
            * jnp.minimum(htot / cfg.gme_h0, 1.0) ** 2
        htot_q = 0.25 * ((htot + ip1(jp1(htot)))
                         + (ip1(htot) + jp1(htot)))
        effic_q = cfg.gme_efficiency * grid.mask2dBu \
            * jnp.minimum(htot_q / cfg.gme_h0, 1.0) ** 2
        coeff_h = jnp.minimum(effic_h * cfg.gme_kh, cfg.gme_limiter)
        coeff_q = jnp.minimum(effic_q * cfg.gme_kh, cfg.gme_limiter)
        str_xx = str_xx + _smooth9(coeff_h * sh_xx_bt)
        str_xy = str_xy + _smooth9(coeff_q * sh_xy_bt) * grid.mask2dBu

    # thickness weighting.  hq is the harmonic-style mean of the four
    # surrounding face thicknesses (MOM_hor_visc.F90:1426): it vanishes
    # when any neighbor layer vanishes, so thin/massless layers never
    # receive stress divergences scaled by their thick neighbors.
    # USE_LAND_MASK_FOR_HVISC (:705): mask per CELL, not per face — a
    # coast face keeps half its wet cell's thickness, so hq at wall
    # corners stays finite and the NOSLIP doubled shear exerts drag
    if cfg.use_land_mask:
        h_m = grid.mask2dT * h
        h_u = 0.5 * (h_m + ip1(h_m))
        h_v = 0.5 * (h_m + jp1(h_m))
    else:
        h_u = 0.5 * (h + ip1(h))
        h_v = 0.5 * (h + jp1(h))
    h2uq = 4.0 * h_u * jp1(h_u)
    h2vq = 4.0 * h_v * ip1(h_v)
    hq = (2.0 * h2uq * h2vq) / (
        _H_NEGLECT + (h2uq + h2vq)
        * ((h_u + jp1(h_u)) + (h_v + ip1(h_v))))
    if cfg.no_slip:
        # coastal vorticity points (MOM_hor_visc.F90:1443-1465): the
        # 4-face harmonic hq vanishes when any face is land, which
        # would silence the doubled no-slip wall shear — rebuild hq
        # there from the WET faces only
        mcu, mcv = grid.mask2dCu, grid.mask2dCv
        hu_w = mcu * h_u + jp1(mcu * h_u)
        hv_w = mcv * h_v + ip1(mcv * h_v)
        nu_w = mcu + jp1(mcu)
        nv_w = mcv + ip1(mcv)
        one_sided = (nu_w * nv_w) == 0.0
        hq_coast = jnp.where(one_sided, hu_w + hv_w,
                             2.0 * hu_w * hv_w
                             / (hu_w + hv_w + _H_NEGLECT))
        coastal = (grid.mask2dBu < 0.5) & ((nu_w + nv_w) > 0.0)
        hq = jnp.where(coastal, hq_coast, hq)
    str_xx_h = str_xx * h
    str_xy_h = str_xy * hq

    diffu = ((grid.IdyCu * (dy2h * str_xx_h - ip1(dy2h * str_xx_h))
              + grid.IdxCu * (jm1(dx2q * str_xy_h) - dx2q * str_xy_h))
             * grid.IareaCu) / (h_u + _H_NEGLECT)
    diffv = ((grid.IdyCv * (im1(dy2q * str_xy_h) - dy2q * str_xy_h)
              - grid.IdxCv * (dx2h * str_xx_h - jp1(dx2h * str_xx_h)))
             * grid.IareaCv) / (h_v + _H_NEGLECT)
    diffu = diffu * grid.mask2dCu
    diffv = diffv * grid.mask2dCv
    if zb_u is not None:
        diffu = diffu + zb_u
        diffv = diffv + zb_v
    return HorViscResult(diffu=diffu, diffv=diffv)
