"""Neutral (isoneutral) slopes.

Re-design of /root/reference/src/core/MOM_isopycnal_slopes.F90
calc_isoneutral_slopes: the x/y slopes of neutral surfaces at
u/v-point interfaces,

  S_x = −(∂ρ/∂x)|_z / (∂ρ/∂z),    z positive UP,

i.e. the physical slope ∂e/∂x of the neutral surface height, from EOS
derivatives evaluated at interface pressure, with the N² floor and
slope magnitude clipping the downstream parameterizations (GM, Redi)
rely on.  Sign check: for a tracer c that tracks density, the
along-neutral gradient  ∂c/∂x + S_x·∂c/∂z (∂c/∂z also z-up)
vanishes (tests/test_neutral_diffusion.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["SlopeCfg", "isoneutral_slopes"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class SlopeCfg:
    slope_max: float = 0.01       # clip |S|
    n2_floor: float = 1e-8        # minimum stratification [s-2]


class SlopeResult(NamedTuple):
    slope_x: jnp.ndarray     # (nk-1, ...) at u-point interior interfaces
    slope_y: jnp.ndarray     # at v points
    n2: jnp.ndarray          # at h-point interfaces


def isoneutral_slopes(cfg: SlopeCfg, grid: Grid, vgrid: VerticalGrid,
                      h, T, S, eos):
    g, rho0 = vgrid.g_Earth, vgrid.Rho0
    zs = jnp.cumsum(h, axis=0)
    z_int = zs[:-1]                       # interior interfaces
    p_int = rho0 * g * z_int
    T_i = 0.5 * (T[:-1] + T[1:])
    S_i = 0.5 * (S[:-1] + S[1:])
    dRdT, dRdS = eos.density_derivs(T_i, S_i, p_int)

    # vertical density gradient at interfaces
    dz = 0.5 * (h[:-1] + h[1:]) + _EPS
    drho_dz = (dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1])) / dz
    n2 = jnp.maximum((g / rho0) * drho_dz, cfg.n2_floor)
    drho_dz = jnp.maximum(drho_dz, cfg.n2_floor * rho0 / g)

    def horiz(shift, Idx):
        dT = (shift(T_i) - T_i) * Idx
        dS = (shift(S_i) - S_i) * Idx
        dRdT_f = 0.5 * (dRdT + shift(dRdT))
        dRdS_f = 0.5 * (dRdS + shift(dRdS))
        drho_dx = dRdT_f * dT + dRdS_f * dS
        dz_f = 0.5 * (drho_dz + shift(drho_dz))
        # drho_dz above is +∂ρ/∂depth = −∂ρ/∂z(up), so the z-up
        # physical slope −(∂ρ/∂x)/(∂ρ/∂z_up) is +drho_dx/drho_dz
        s = drho_dx / jnp.maximum(dz_f, _EPS)
        return jnp.clip(s, -cfg.slope_max, cfg.slope_max)

    slope_x = horiz(ip1, grid.IdxCu) * grid.mask2dCu
    slope_y = horiz(jp1, grid.IdyCv) * grid.mask2dCv
    return SlopeResult(slope_x=slope_x, slope_y=slope_y, n2=n2)
