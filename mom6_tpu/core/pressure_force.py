"""Pressure-gradient accelerations.

Re-design of the reference's pressure-force stack:
/root/reference/src/core/MOM_PressureForce.F90 (dispatch),
MOM_PressureForce_FV.F90:462 (finite-volume Boussinesq form, Adcroft
et al. 2008), MOM_PressureForce_Montgomery.F90 (layered Montgomery
potential), and Set_pbce_Bouss (the ∂accel/∂eta coupling coefficients
fed to the barotropic solver).

The FV form here uses per-layer-constant density with 2-point face
quadrature for the pressure integrals (the reference's analytic
`int_density_dz` specializes this per-EOS; the subgrid T/S
reconstruction option arrives with ALE).  All cumulative-in-k loops are
`jnp.cumsum` over the leading layer axis.

Interface heights e (nk+1, njh, nih): e[0] = free surface,
e[nk] = -bathyT; layer k lies between e[k] (top) and e[k+1] (bottom)
(MOM_interface_heights.F90).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["PressureForceCfg", "pressure_force", "interface_heights",
           "set_pbce_bouss", "set_pbce_nonbouss"]

_H_NEGLECT = 1e-30
_DZ_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class PressureForceCfg:
    rho_ref: float = 1035.0      # RHO_PGF_REF
    gfs_scale: float = 1.0       # reduced-gravity trick scale on sfc PG
    montgomery: bool = False     # ANALYTIC_FV_PGF=False → Montgomery form
    # USE_STANLEY_PGF: subgrid-T-variance density correction
    # (MOM_PressureForce_FV.F90:997); < 0 disables
    stanley_coeff: float = -1.0  # STANLEY_COEFF
    # vertical quadrature points for the layer density integral
    # (MOM_density_integrals.F90 int_density_dz 5-point Boole rule;
    # 1 = midpoint).  5 recovers the reference's analytic-integral
    # accuracy for any EOS without per-form closed forms.
    quad_points: int = 1
    # RECONSTRUCT_FOR_PRESSURE (MOM_PressureForce_FV.F90:980, default
    # = USE_REGRIDDING): limited-PLM vertical reconstruction of T/S
    # inside the layer density integrals instead of the
    # constant-by-layer values (int_density_dz_generic_plm,
    # MOM_density_integrals.F90:388); needs quad_points=5 to matter
    reconstruct: bool = False


class PressureForceResult(NamedTuple):
    PFu: jnp.ndarray
    PFv: jnp.ndarray
    pbce: jnp.ndarray     # ∂(layer PG accel)/∂eta [m s-2 / m]
    eta_pf: jnp.ndarray   # sea surface height used by the PG [m]


def interface_heights(vgrid: VerticalGrid, h, bathyT):
    """e[K] for K=0..nk: reverse cumulative sum of h above -bathyT."""
    nk = h.shape[0]
    below = jnp.cumsum(h[::-1], axis=0)[::-1]      # sum of h[k:] per K
    zeros = jnp.zeros_like(h[:1])
    above_bottom = jnp.concatenate([below, zeros], axis=0)
    return -bathyT[None] + above_bottom


_BOOLE_W = (7.0 / 90.0, 32.0 / 90.0, 12.0 / 90.0, 32.0 / 90.0,
            7.0 / 90.0)


def _plm_profile(t, h):
    """Monotonized-central limited PLM edge values of a cell-mean
    profile within each layer: (t_top, t_bot) with the layer mean
    preserved (the PLM pressure reconstruction of
    MOM_density_integrals.F90:388 int_density_dz_generic_plm)."""
    t_up = jnp.concatenate([t[:1], t[:-1]], axis=0)
    t_dn = jnp.concatenate([t[1:], t[-1:]], axis=0)
    d_up = t - t_up
    d_dn = t_dn - t
    slp = 0.5 * (d_up + d_dn)
    lim = 2.0 * jnp.minimum(jnp.abs(d_up), jnp.abs(d_dn))
    slp = jnp.sign(slp) * jnp.minimum(jnp.abs(slp), lim)
    slp = jnp.where(d_up * d_dn > 0.0, slp, 0.0)
    return t - 0.5 * slp, t + 0.5 * slp


def _layer_densities(vgrid: VerticalGrid, h, e, T, S, eos, rho0, g,
                     quad_points: int = 1, reconstruct: bool = False):
    """Layer-mean in-situ density (nk, njh, nih).

    quad_points=5 evaluates the EOS at 5 Boole-rule levels through
    each layer (pressure varying) — the vertically exact layer
    density integral for any smooth EOS, the
    int_density_dz_generic_pcm analog
    (MOM_density_integrals.F90:228).  With ``reconstruct``
    (RECONSTRUCT_FOR_PRESSURE) the T/S sampled at each level follow
    the limited-PLM in-layer profile instead of the layer mean, so
    EOS nonlinearity sees the stratification within layers
    (int_density_dz_generic_plm, :388)."""
    if T is None or eos is None:
        rlay = vgrid.Rlay.reshape(-1, 1, 1)
        return jnp.broadcast_to(rlay, h.shape)
    if quad_points == 5:
        if reconstruct:
            T_t, T_b = _plm_profile(T, h)
            S_t, S_b = _plm_profile(S, h)
        rho = 0.0
        for m, w in enumerate(_BOOLE_W):
            frac = m / 4.0
            z = e[:-1] * (1.0 - frac) + e[1:] * frac
            if reconstruct:
                Tm = T_t * (1.0 - frac) + T_b * frac
                Sm = S_t * (1.0 - frac) + S_b * frac
            else:
                Tm, Sm = T, S
            rho = rho + w * eos.density(Tm, Sm, -rho0 * g * z)
        return rho
    z_mid = 0.5 * (e[:-1] + e[1:])
    p_mid = -rho0 * g * z_mid
    return eos.density(T, S, p_mid)


@jax.named_scope("pressure_force")
def pressure_force(grid: Grid, vgrid: VerticalGrid, h, T=None, S=None,
                   eos=None, p_atm=None,
                   cfg: PressureForceCfg = PressureForceCfg(),
                   e_tidal=None, varT_mult=None) -> PressureForceResult:
    """PFu, PFv, pbce, eta (PressureForce_FV_Bouss,
    MOM_PressureForce_FV.F90:462).

    ``e_tidal``: tidal + self-attraction/loading geopotential height
    anomaly [m] at h points; heights are measured relative to the
    perturbed equipotential (the FV analog of the Montgomery form's
    geopot_bot -= g(e_eq+e_sal), MOM_PressureForce_Montgomery.F90:228).
    The returned eta_pf stays the true free surface for the
    barotropic mass coupling."""
    if not vgrid.boussinesq:
        return _pressure_force_nonbouss(grid, vgrid, h, T, S, eos,
                                        p_atm, cfg, e_tidal)
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    I_rho0 = 1.0 / rho0
    e_true = interface_heights(vgrid, h, grid.bathyT)
    e = e_true if e_tidal is None else e_true - e_tidal[None]

    if cfg.montgomery and (T is None or eos is None):
        res = _montgomery_bouss(grid, vgrid, h, e, p_atm, cfg)
        if e_tidal is not None:
            res = res._replace(eta_pf=e_true[0])
        return res

    rho = _layer_densities(vgrid, h, e, T, S, eos, rho0, g,
                           quad_points=cfg.quad_points,
                           reconstruct=cfg.reconstruct)
    if cfg.stanley_coeff >= 0.0 and T is not None and eos is not None:
        # Stanley parameterization: rho += 0.5 varT d2rho/dT2
        from mom6_tpu.core.stoch_eos import (calc_varT,
                                             density_second_dT2)
        p_mid = -rho0 * g * 0.5 * (e[:-1] + e[1:])
        varT = calc_varT(grid, h, T, cfg.stanley_coeff)
        if varT_mult is not None:
            # STOCH_EOS (MOM_stoch_eos.F90:254): multiply the SGS
            # variance by exp(a*pattern)
            varT = varT * varT_mult[None]
        rho = rho + 0.5 * varT * density_second_dT2(eos, T, S, p_mid)
    rho_ref = cfg.rho_ref

    # pressure anomaly at the top interface of each layer
    pa_surf = (rho_ref * g) * e[0]
    if p_atm is not None:
        pa_surf = pa_surf + p_atm
    dpa = g * (rho - rho_ref) * h                       # across each layer
    pa_int = pa_surf[None] + jnp.concatenate(
        [jnp.zeros_like(dpa[:1]), jnp.cumsum(dpa, axis=0)], axis=0)
    pa_top = pa_int[:-1]                                # at layer tops

    intz_dpa = 0.5 * g * (rho - rho_ref) * h * h

    def _dir(shift, Idx_face, mask_face):
        pa_n = shift(pa_top)
        h_n = shift(h)
        intz_n = shift(intz_dpa)
        e_bot = e[1:]
        e_bot_n = shift(e_bot)
        intx_pa = 0.5 * (pa_top + pa_n)                 # 2-pt quadrature
        intx_dpa = 0.5 * (dpa + shift(dpa))
        PF = (((pa_top * h + intz_dpa) - (pa_n * h_n + intz_n))
              + ((h_n - h) * intx_pa - (e_bot_n - e_bot) * intx_dpa)) \
            * ((2.0 * I_rho0 * Idx_face) / ((h + h_n) + _H_NEGLECT))
        return PF * mask_face

    PFu = _dir(ip1, grid.IdxCu, grid.mask2dCu)
    PFv = _dir(jp1, grid.IdyCv, grid.mask2dCv)

    if cfg.gfs_scale < 1.0:
        rho_sfc = rho[0]
        dM = (cfg.gfs_scale - 1.0) * (g / rho0) * rho_sfc * e[0]
        PFu = PFu - (ip1(dM) - dM) * grid.IdxCu * grid.mask2dCu
        PFv = PFv - (jp1(dM) - dM) * grid.IdyCv * grid.mask2dCv

    pbce = set_pbce_bouss(vgrid, e, T, S, eos, cfg.gfs_scale)
    return PressureForceResult(PFu=PFu, PFv=PFv, pbce=pbce,
                               eta_pf=e_true[0])


def _montgomery_bouss(grid: Grid, vgrid: VerticalGrid, h, e, p_atm,
                      cfg: PressureForceCfg) -> PressureForceResult:
    """Layered Montgomery-potential form (PressureForce_Mont_Bouss,
    MOM_PressureForce_Montgomery.F90)."""
    gp = vgrid.g_prime.reshape(-1, 1, 1)       # (nk+1, 1, 1) semantics
    # M[0] = gfs_scale * g'0 * e[0]; M[k] = M[k-1] + g'_K e[K]
    contrib = jnp.concatenate(
        [cfg.gfs_scale * gp[0:1] * e[0:1], gp[1:-1] * e[1:-1]], axis=0)
    M = jnp.cumsum(contrib, axis=0)
    if p_atm is not None:
        M = M + (p_atm / vgrid.Rho0)[None]
    PFu = -(ip1(M) - M) * grid.IdxCu * grid.mask2dCu
    PFv = -(jp1(M) - M) * grid.IdyCv * grid.mask2dCv
    pbce = set_pbce_bouss(vgrid, e, None, None, None, cfg.gfs_scale)
    return PressureForceResult(PFu=PFu, PFv=PFv, pbce=pbce, eta_pf=e[0])


def _pressure_force_nonbouss(grid: Grid, vgrid: VerticalGrid, h, T, S,
                             eos, p_atm, cfg: PressureForceCfg,
                             e_tidal) -> PressureForceResult:
    """Non-Boussinesq finite-volume PGF (PressureForce_FV_nonBouss,
    MOM_PressureForce_FV.F90:89).

    Semi-Boussinesq unit convention (the reference's default,
    MOM_verticalGrid.F90:138): thickness h stays in meters-equivalent
    units with column mass = Rho0*h per unit area (H_to_kg_m2 = Rho0,
    H_to_Z = 1), so every kinematic path is shared with the Boussinesq
    build and only the pressure force sees true specific volumes.

    Pressure is the mass coordinate: interface pressures accumulate
    g*Rho0*h downward; the geopotential anomaly
    za = g*z + alpha_ref*p integrates *upward* from the bottom via
    dza = int (alpha - alpha_ref) dp per layer (the reference's
    int_specific_vol_dp, here a Boole/midpoint quadrature in p, the
    int_spec_vol_dp_generic analog of MOM_density_integrals.F90:1075).
    With the 2-point face quadrature used throughout this build, the
    up-then-down ordering of the reference collapses to face means of
    za, preserving the no-motion state for flat isopycnals exactly.
    """
    if cfg.stanley_coeff >= 0.0:
        raise ValueError("USE_STANLEY_PGF is not implemented in "
                         "non-Boussinesq mode (matching "
                         "MOM_PressureForce_FV.F90:183)")
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    H_to_P = g * rho0                     # h [m-equiv] -> pressure [Pa]
    alpha_ref = 1.0 / cfg.rho_ref
    dp_neglect = H_to_P * 1e-30

    dp = H_to_P * h                                      # (nk, ...)
    p_surf = p_atm if p_atm is not None else jnp.zeros_like(h[0])
    p_int = p_surf[None] + jnp.concatenate(
        [jnp.zeros_like(dp[:1]), jnp.cumsum(dp, axis=0)], axis=0)
    p_top, p_bot = p_int[:-1], p_int[1:]

    # per-layer specific-volume-anomaly integrals:
    #   dza     = int    alpha' dp          [m2 s-2]
    #   intp_dza = int (p - p_top) alpha' dp [Pa m2 s-2]
    if T is None or eos is None:
        a_anom = (1.0 / vgrid.Rlay - alpha_ref).reshape(-1, 1, 1)
        dza = a_anom * dp
        intp_dza = 0.5 * a_anom * dp * dp
    elif cfg.quad_points == 5:
        s0 = 0.0
        s1 = 0.0
        for m, w in enumerate(_BOOLE_W):
            frac = m / 4.0
            p_m = p_top * (1.0 - frac) + p_bot * frac
            a_m = 1.0 / eos.density(T, S, p_m) - alpha_ref
            s0 = s0 + w * a_m
            s1 = s1 + (w * frac) * a_m
        dza = s0 * dp
        intp_dza = s1 * dp * dp
    else:
        a_mid = 1.0 / eos.density(T, S, 0.5 * (p_top + p_bot)) - alpha_ref
        dza = a_mid * dp
        intp_dza = 0.5 * a_mid * dp * dp

    # geopotential anomaly: bottom -> surface, then back down per layer
    za_surf = (alpha_ref * p_int[-1] - g * grid.bathyT
               + jnp.sum(dza, axis=0))
    if e_tidal is not None:
        za_surf = za_surf - g * e_tidal
    # za along the *bottom* interface of each layer
    za_bot = za_surf[None] - jnp.cumsum(dza, axis=0)

    def _dir(shift, Idx_face, mask_face):
        dp_n = shift(dp)
        zb_n = shift(za_bot)
        ip_n = shift(intp_dza)
        intx_dza = 0.5 * (dza + shift(dza))
        intx_za = 0.5 * (za_bot + zb_n)        # == up-then-down w/ 2-pt
        PF = (((za_bot * dp + intp_dza) - (zb_n * dp_n + ip_n))
              + ((dp_n - dp) * intx_za
                 - (shift(p_top) - p_top) * intx_dza)) \
            * ((2.0 * Idx_face) / ((dp + dp_n) + dp_neglect))
        return PF * mask_face

    PFu = _dir(ip1, grid.IdxCu, grid.mask2dCu)
    PFv = _dir(jp1, grid.IdyCv, grid.mask2dCv)

    if cfg.gfs_scale < 1.0:
        if T is not None and eos is not None:
            rho_sfc = eos.density(T[0], S[0], p_int[0])
        else:
            rho_sfc = vgrid.Rlay[0]
        dM = (cfg.gfs_scale - 1.0) * (
            p_int[0] * (1.0 / rho_sfc - alpha_ref) + za_surf)
        PFu = PFu - (ip1(dM) - dM) * grid.IdxCu * grid.mask2dCu
        PFv = PFv - (jp1(dM) - dM) * grid.IdyCv * grid.mask2dCv

    pbce = set_pbce_nonbouss(vgrid, p_int, T, S, eos, cfg.gfs_scale)
    eta_true = interface_heights(vgrid, h, grid.bathyT)[0]
    return PressureForceResult(PFu=PFu, PFv=PFv, pbce=pbce,
                               eta_pf=eta_true)


def set_pbce_nonbouss(vgrid: VerticalGrid, p_int, T, S, eos,
                      gfs_scale: float = 1.0):
    """pbce[k] = ∂(layer k PG accel)/∂(column eta in H units)
    (Set_pbce_nonBouss, MOM_PressureForce_Montgomery.F90:752).

    Built upward from the bottom: the deepest layer feels
    dP_dH/rho_bottom per unit added column mass; each interface adds
    the specific-volume jump weighted by the fractional depth-pressure
    (p_int - p_surf)/(p_bot - p_surf)."""
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    dP_dH = g * rho0
    dp_neglect = dP_dH * 1e-30
    C_htot = dP_dH / ((p_int[-1] - p_int[0]) + dp_neglect)
    if T is not None and eos is not None:
        rho_bot = eos.density(T[-1], S[-1], p_int[-1])
        pbce_nz = dP_dH / rho_bot
        T_i = 0.5 * (T[:-1] + T[1:])
        S_i = 0.5 * (S[:-1] + S[1:])
        p_i = p_int[1:-1]
        rho_i = eos.density(T_i, S_i, p_i)
        dRdT, dRdS = eos.density_derivs(T_i, S_i, p_i)
        incs = ((p_i - p_int[0:1]) * C_htot[None]) * (
            (dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1]))
            / (rho_i * rho_i))
    else:
        alpha_lay = (1.0 / vgrid.Rlay).reshape(-1, 1, 1)
        pbce_nz = dP_dH * alpha_lay[-1] * jnp.ones_like(p_int[0])
        incs = ((p_int[1:-1] - p_int[0:1]) * C_htot) * (
            alpha_lay[:-1] - alpha_lay[1:])
    rev = jnp.cumsum(incs[::-1], axis=0)[::-1]
    pbce = pbce_nz[None] + jnp.concatenate(
        [rev, jnp.zeros_like(rev[:1])], axis=0)
    if gfs_scale < 1.0:
        pbce = pbce + (gfs_scale - 1.0) * pbce[0:1]
    return pbce


def set_pbce_bouss(vgrid: VerticalGrid, e, T, S, eos,
                   gfs_scale: float = 1.0):
    """pbce[k] = ∂(layer k PG accel)/∂(column eta) (Set_pbce_Bouss,
    MOM_PressureForce_Montgomery.F90)."""
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    Ihtot = 1.0 / ((e[0] - e[-1]) + _DZ_NEGLECT)
    if T is None or eos is None:
        gp = vgrid.g_prime
        pbce0 = gfs_scale * gp[0] * jnp.ones_like(e[0])
        # increments at interior interfaces K=1..nk-1
        incs = gp[1:-1].reshape(-1, 1, 1) * ((e[1:-1] - e[-1][None]) * Ihtot)
    else:
        p_top = -rho0 * g * e[0]
        rho_sfc = eos.density(T[0], S[0], p_top)
        pbce0 = (g / rho0) * gfs_scale * rho_sfc
        T_int = 0.5 * (T[:-1] + T[1:])
        S_int = 0.5 * (S[:-1] + S[1:])
        p_int = -rho0 * g * e[1:-1]
        dRdT, dRdS = eos.density_derivs(T_int, S_int, p_int)
        incs = (g / rho0) * ((e[1:-1] - e[-1][None]) * Ihtot) * (
            dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1]))
    pbce = pbce0[None] + jnp.concatenate(
        [jnp.zeros_like(pbce0)[None], jnp.cumsum(incs, axis=0)], axis=0)
    return pbce
