"""Interface-height filter.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_interface_filter.F90: grid-scale smoothing of interface heights via
Laplacian (or biharmonic-signed) passes expressed through
streamfunction-form layer transports, so the mass redistribution can be
accumulated into the tracer transports (interface_filter returns
uhD/vhD exactly like thickness_diffuse; cf.
MOM_interface_filter.F90:117 filter_interface).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import interface_heights
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["InterfaceFilterCfg", "interface_filter"]


@dataclasses.dataclass(frozen=True)
class InterfaceFilterCfg:
    time_scale: float = 0.0        # INTERFACE_FILTER_TIME_SCALE [s]
    order: int = 2                 # 2=Laplacian, 4=biharmonic
    max_smoothing: float = 0.125   # nondim per-pass smoothing strength


def interface_filter(domain, grid: Grid, vgrid: VerticalGrid, h, dt,
                     cfg: InterfaceFilterCfg):
    """Smooth interface heights over dt.  Needs h halos ≥2.

    Returns (h_new, uhD, vhD) with uhD/vhD the layer volume
    transports [m3 s-1] that effected the smoothing, for accumulation
    into the tracer-advection transports."""
    if cfg.time_scale <= 0.0:
        z = jnp.zeros_like(h)
        return h, z, z
    coef = jnp.minimum(dt / cfg.time_scale, cfg.max_smoothing)

    e = interface_heights(vgrid, h, grid.bathyT)

    def lap(f):
        return ((ip1(f) - f) * grid.mask2dCu
                - (f - im1(f)) * im1(grid.mask2dCu)
                + (jp1(f) - f) * grid.mask2dCv
                - (f - jm1(f)) * jm1(grid.mask2dCv)) * 0.25

    # index-space smoothing de = coef*lap(e) written as the divergence
    # of face streamfunctions psi (volume flux per interface), so the
    # same update is available as layer transports
    area_u = 0.5 * (grid.areaT + ip1(grid.areaT))
    area_v = 0.5 * (grid.areaT + jp1(grid.areaT))
    if cfg.order >= 4:
        s = domain.fill_halos(lap(e), width=1)
        psi_u = (0.25 * coef / dt) * area_u * (ip1(s) - s) \
            * grid.mask2dCu
        psi_v = (0.25 * coef / dt) * area_v * (jp1(s) - s) \
            * grid.mask2dCv
    else:
        psi_u = -(0.25 * coef / dt) * area_u * (ip1(e) - e) \
            * grid.mask2dCu
        psi_v = -(0.25 * coef / dt) * area_v * (jp1(e) - e) \
            * grid.mask2dCv
    # surface and bottom interfaces stay fixed → column mass unchanged
    psi_u = psi_u.at[0].set(0.0).at[-1].set(0.0)
    psi_v = psi_v.at[0].set(0.0).at[-1].set(0.0)

    uhD = psi_u[:-1] - psi_u[1:]
    vhD = psi_v[:-1] - psi_v[1:]

    # bound each face transport by the upwind layer's content so
    # vanished layers are never drained negative (same guard as
    # thickness_diffuse)
    frac = 0.2
    lim = frac * grid.areaT * h / dt
    uhD = jnp.clip(uhD, -ip1(lim), lim)
    vhD = jnp.clip(vhD, -jp1(lim), lim)

    h_new = h - dt * grid.IareaT * ((uhD - im1(uhD)) + (vhD - jm1(vhD)))
    h_new = jnp.maximum(h_new, vgrid.angstrom)
    return h_new, uhD, vhD
