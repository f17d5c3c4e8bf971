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

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["PressureForceCfg", "pressure_force", "interface_heights",
           "set_pbce_bouss"]

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


def _layer_densities(vgrid: VerticalGrid, h, e, T, S, eos, rho0, g,
                     quad_points: int = 1):
    """Layer-mean in-situ density (nk, njh, nih).

    quad_points=5 evaluates the EOS at 5 Boole-rule levels through
    each layer (T/S uniform within the layer, pressure varying) — the
    vertically exact layer density integral for any smooth EOS, the
    int_density_dz_generic_pcm analog
    (MOM_density_integrals.F90:228)."""
    if T is None or eos is None:
        rlay = vgrid.Rlay.reshape(-1, 1, 1)
        return jnp.broadcast_to(rlay, h.shape)
    if quad_points == 5:
        rho = 0.0
        for m, w in enumerate(_BOOLE_W):
            frac = m / 4.0
            z = e[:-1] * (1.0 - frac) + e[1:] * frac
            rho = rho + w * eos.density(T, S, -rho0 * g * z)
        return rho
    z_mid = 0.5 * (e[:-1] + e[1:])
    p_mid = -rho0 * g * z_mid
    return eos.density(T, S, p_mid)


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
                           quad_points=cfg.quad_points)
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
