"""Thickness (Gent-McWilliams) diffusion.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_thickness_diffuse.F90: interface-height diffusion expressed through
a streamfunction at interfaces, so that layer transports are exactly
the streamfunction differences and the scheme moves no net column mass:

    psi(K)  = KhTh * dy_face * (e(i+1,K) − e(i,K)) / dx      [m3 s-1]
    uhD(k)  = psi(K) − psi(K+1)

(The full neutral-slope/streamfunction machinery with Visbeck scaling,
slope limits and the Ferrari-Young advective form arrives with
isopycnal_slopes; this is the layered KHTH form which reduces to it
for stacked isopycnal coordinates.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import interface_heights
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["ThicknessDiffuseCfg", "thickness_diffuse"]


@dataclasses.dataclass(frozen=True)
class ThicknessDiffuseCfg:
    khth: float = 0.0              # KHTH [m2 s-1]
    khth_max_cfl: float = 0.1      # stability bound on the applied Kh


class ThicknessDiffuseResult(NamedTuple):
    h: jnp.ndarray
    uhD: jnp.ndarray     # diffusive layer transports [m3 s-1]
    vhD: jnp.ndarray


def thickness_diffuse(grid: Grid, vgrid: VerticalGrid, h, dt,
                      cfg: ThicknessDiffuseCfg):
    """Apply interface-height diffusion over dt.  Needs h halos ≥2."""
    if cfg.khth <= 0.0:
        z = jnp.zeros_like(h)
        return ThicknessDiffuseResult(h=h, uhD=z, vhD=z)

    e = interface_heights(vgrid, h, grid.bathyT)
    kh_u = jnp.minimum(cfg.khth, cfg.khth_max_cfl
                       * grid.dxCu * grid.dxCu / dt)
    kh_v = jnp.minimum(cfg.khth, cfg.khth_max_cfl
                       * grid.dyCv * grid.dyCv / dt)

    # streamfunction at interfaces K=0..nk (zero at surface & bottom so
    # the column-integrated transport vanishes).  Since
    # de(K)/dt = −div(psi(K)), psi = −Kh ∇e gives downgradient
    # interface-height diffusion.
    psi_u = -kh_u * grid.dyCu * grid.IdxCu * (ip1(e) - e) * grid.mask2dCu
    psi_v = -kh_v * grid.dxCv * grid.IdyCv * (jp1(e) - e) * grid.mask2dCv
    psi_u = psi_u.at[0].set(0.0).at[-1].set(0.0)
    psi_v = psi_v.at[0].set(0.0).at[-1].set(0.0)

    uhD = psi_u[:-1] - psi_u[1:]
    vhD = psi_v[:-1] - psi_v[1:]

    # limit each face transport by the upwind layer's content so
    # vanished layers are never drained below zero (the reference
    # bounds the streamfunction by available thickness; without this
    # the positivity clamp would CREATE mass at bowl/shelf edges)
    frac = 0.2
    lim = frac * grid.areaT * h / dt
    uhD = jnp.clip(uhD, -ip1(lim), lim)
    vhD = jnp.clip(vhD, -jp1(lim), lim)

    h_new = h - dt * grid.IareaT * ((uhD - im1(uhD)) + (vhD - jm1(vhD)))
    h_new = jnp.maximum(h_new, vgrid.angstrom)
    return ThicknessDiffuseResult(h=h_new, uhD=uhD, vhD=vhD)
