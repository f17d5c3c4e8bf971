"""Horizontal (along-layer) viscosity.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_hor_visc.F90:245 horizontal_viscosity: stress-tensor Laplacian and
biharmonic friction with constant and Smagorinsky (1963) nonlinear
coefficients.  Horizontal tension sh_xx lives at h points, shearing
strain sh_xy at q points; the divergence of the thickness-weighted
stress gives (diffu, diffv).  (Leith, anisotropic, GME/backscatter and
the Kh/Ah stability bounds beyond the basic CFL bound remain to be
added.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["HorViscCfg", "horizontal_viscosity"]

_H_NEGLECT = 1e-20


@dataclasses.dataclass(frozen=True)
class HorViscCfg:
    kh: float = 0.0               # KH background Laplacian [m2 s-1]
    ah: float = 0.0               # AH background biharmonic [m4 s-1]
    smag_lap_const: float = 0.0   # SMAGORINSKY_KH constant
    smag_bi_const: float = 0.0    # SMAGORINSKY_AH constant
    laplacian: bool = False       # LAPLACIAN
    biharmonic: bool = False      # BIHARMONIC
    no_slip: bool = False         # NOSLIP
    bound_coef: bool = True       # BOUND_KH/BOUND_AH CFL-stability bounds
    dt: float = 3600.0            # used only for the stability bounds


class HorViscResult(NamedTuple):
    diffu: jnp.ndarray
    diffv: jnp.ndarray


def _strains(grid: Grid, u, v, no_slip: bool):
    DY_dxT = grid.dyT * grid.IdxT
    DX_dyT = grid.dxT * grid.IdyT
    DY_dxBu = grid.dyBu * grid.IdxBu
    DX_dyBu = grid.dxBu * grid.IdyBu
    dudx = DY_dxT * (grid.IdyCu * u - im1(grid.IdyCu * u))
    dvdy = DX_dyT * (grid.IdxCv * v - jm1(grid.IdxCv * v))
    sh_xx = dudx - dvdy
    dvdx = DY_dxBu * (ip1(grid.IdyCv * v) - grid.IdyCv * v)
    dudy = DX_dyBu * (jp1(grid.IdxCu * u) - grid.IdxCu * u)
    if no_slip:
        sh_xy = (2.0 - grid.mask2dBu) * (dvdx + dudy)
    else:
        sh_xy = grid.mask2dBu * (dvdx + dudy)
    return sh_xx, sh_xy


def horizontal_viscosity(grid: Grid, u, v, h,
                         cfg: HorViscCfg = HorViscCfg()) -> HorViscResult:
    """(diffu, diffv) [m s-2] from Laplacian+biharmonic friction.

    Needs u, v valid to ≥2 halo rings, h to ≥1."""
    if not (cfg.laplacian or cfg.biharmonic):
        z = jnp.zeros_like(u)
        return HorViscResult(z, z)

    dy2h = grid.dyT * grid.dyT
    dx2h = grid.dxT * grid.dxT
    dy2q = grid.dyBu * grid.dyBu
    dx2q = grid.dxBu * grid.dxBu

    sh_xx, sh_xy = _strains(grid, u, v, cfg.no_slip)

    # grid spacing scales for Smagorinsky and stability bounds
    grid_sp_h2 = (2.0 * dx2h * dy2h) / (dx2h + dy2h + _H_NEGLECT)
    grid_sp_q2 = (2.0 * dx2q * dy2q) / (dx2q + dy2q + _H_NEGLECT)

    def shear_mag_h():
        xy2 = 0.25 * ((sh_xy * sh_xy + im1(jm1(sh_xy * sh_xy)))
                      + (im1(sh_xy * sh_xy) + jm1(sh_xy * sh_xy)))
        return jnp.sqrt(sh_xx * sh_xx + xy2)

    def shear_mag_q():
        xx2 = 0.25 * ((sh_xx * sh_xx + ip1(jp1(sh_xx * sh_xx)))
                      + (ip1(sh_xx * sh_xx) + jp1(sh_xx * sh_xx)))
        return jnp.sqrt(sh_xy * sh_xy + xx2)

    str_xx = jnp.zeros_like(sh_xx)
    str_xy = jnp.zeros_like(sh_xy)

    if cfg.laplacian:
        Kh_h = cfg.kh
        Kh_q = cfg.kh
        if cfg.smag_lap_const > 0.0:
            lap2_h = cfg.smag_lap_const * grid_sp_h2
            lap2_q = cfg.smag_lap_const * grid_sp_q2
            Kh_h = Kh_h + lap2_h * shear_mag_h()
            Kh_q = Kh_q + lap2_q * shear_mag_q()
        if cfg.bound_coef:
            Kh_h = jnp.minimum(Kh_h, 0.2 * grid_sp_h2 / cfg.dt)
            Kh_q = jnp.minimum(Kh_q, 0.2 * grid_sp_q2 / cfg.dt)
        str_xx = str_xx - Kh_h * sh_xx
        str_xy = str_xy - Kh_q * sh_xy

    if cfg.biharmonic:
        Idxdy2u = grid.IdxCu * grid.IdyCu * grid.IdyCu
        Idx2dyCu = grid.IdxCu * grid.IdxCu * grid.IdyCu
        Idxdy2v = grid.IdxCv * grid.IdyCv * grid.IdyCv
        Idx2dyCv = grid.IdxCv * grid.IdxCv * grid.IdyCv
        Del2u = (Idxdy2u * (ip1(dy2h * sh_xx) - dy2h * sh_xx)
                 + Idx2dyCu * (dx2q * sh_xy - jm1(dx2q * sh_xy)))
        Del2v = (Idxdy2v * (dy2q * sh_xy - im1(dy2q * sh_xy))
                 - Idx2dyCv * (jp1(dx2h * sh_xx) - dx2h * sh_xx))
        bh_xx, bh_xy = _strains(grid, Del2u, Del2v, cfg.no_slip)
        Ah_h = cfg.ah
        Ah_q = cfg.ah
        if cfg.smag_bi_const > 0.0:
            bi2_h = (cfg.smag_bi_const ** 1.0) * grid_sp_h2 * grid_sp_h2 \
                / 16.0
            bi2_q = (cfg.smag_bi_const ** 1.0) * grid_sp_q2 * grid_sp_q2 \
                / 16.0
            Ah_h = Ah_h + bi2_h * shear_mag_h()
            Ah_q = Ah_q + bi2_q * shear_mag_q()
        if cfg.bound_coef:
            Ah_h = jnp.minimum(Ah_h, 0.012 * grid_sp_h2 ** 2 / cfg.dt)
            Ah_q = jnp.minimum(Ah_q, 0.012 * grid_sp_q2 ** 2 / cfg.dt)
        str_xx = str_xx + Ah_h * bh_xx
        str_xy = str_xy + Ah_q * bh_xy

    # thickness weighting.  hq is the harmonic-style mean of the four
    # surrounding face thicknesses (MOM_hor_visc.F90:1426): it vanishes
    # when any neighbor layer vanishes, so thin/massless layers never
    # receive stress divergences scaled by their thick neighbors.
    h_u = 0.5 * (h + ip1(h)) * grid.mask2dCu
    h_v = 0.5 * (h + jp1(h)) * grid.mask2dCv
    h2uq = 4.0 * h_u * jp1(h_u)
    h2vq = 4.0 * h_v * ip1(h_v)
    hq = (2.0 * h2uq * h2vq) / (
        _H_NEGLECT + (h2uq + h2vq)
        * ((h_u + jp1(h_u)) + (h_v + ip1(h_v))))
    str_xx_h = str_xx * h
    str_xy_h = str_xy * hq * grid.mask2dBu

    diffu = ((grid.IdyCu * (dy2h * str_xx_h - ip1(dy2h * str_xx_h))
              + grid.IdxCu * (jm1(dx2q * str_xy_h) - dx2q * str_xy_h))
             * grid.IareaCu) / (h_u + _H_NEGLECT)
    diffv = ((grid.IdyCv * (im1(dy2q * str_xy_h) - dy2q * str_xy_h)
              - grid.IdxCv * (dx2h * str_xx_h - jp1(dx2h * str_xx_h)))
             * grid.IareaCv) / (h_v + _H_NEGLECT)
    return HorViscResult(diffu=diffu * grid.mask2dCu,
                         diffv=diffv * grid.mask2dCv)
