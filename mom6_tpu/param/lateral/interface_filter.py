"""Interface-height filter.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_interface_filter.F90: grid-scale smoothing of interface heights via
repeated Laplacian (or biharmonic-signed) passes with
streamfunction-form transports, used to suppress checkerboard noise in
interface heights without moving column mass.
"""

from __future__ import annotations

import dataclasses

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
    if cfg.time_scale <= 0.0:
        return h
    coef = jnp.minimum(dt / cfg.time_scale, cfg.max_smoothing)

    e = interface_heights(vgrid, h, grid.bathyT)

    def lap(f):
        return ((ip1(f) - f) * grid.mask2dCu
                - (f - im1(f)) * im1(grid.mask2dCu)
                + (jp1(f) - f) * grid.mask2dCv
                - (f - jm1(f)) * jm1(grid.mask2dCv)) * 0.25

    de = lap(e)
    if cfg.order >= 4:
        de = domain.fill_halos(de, width=1)
        de = -lap(de)
    e_new = e + coef * de
    # keep surface & bottom fixed → column mass unchanged
    e_new = e_new.at[0].set(e[0]).at[-1].set(e[-1])
    # monotone interfaces
    import jax
    e_mono = jax.lax.associative_scan(jnp.minimum, e_new, axis=0)
    h_new = jnp.maximum(e_mono[:-1] - e_mono[1:], vgrid.angstrom)
    return h_new
