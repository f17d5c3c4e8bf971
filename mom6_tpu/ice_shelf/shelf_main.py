"""Ice-shelf stepping and ocean coupling.

Re-design of /root/reference/src/ice_shelf/MOM_ice_shelf.F90 (the
shelf↔ocean exchange: basal pressure on the ocean surface, 3-equation
melt fluxes, stress shielding) and MOM_ice_shelf_dynamics.F90's
advective thickness update (ice_shelf_advect), with the SSA velocity
solve from dynamics.py.  The shelf solo driver
(config_src/drivers/ice_solo_driver/ice_shelf_driver.F90) loops
:func:`step_shelf` alone.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1
from mom6_tpu.ice_shelf.thermo import (IceShelfCfg, three_equation_melt,
                                       shelf_draft)
from mom6_tpu.ice_shelf.dynamics import SSACfg, ssa_velocity_solve

__all__ = ["ShelfCfg", "ShelfState", "step_shelf", "shelf_fluxes",
           "shelf_surface_pressure", "init_shelf_thickness"]

_EPS = 1e-20


@dataclasses.dataclass(frozen=True)
class ShelfCfg:
    thermo: IceShelfCfg = IceShelfCfg()
    ssa: SSACfg = SSACfg()
    dynamic: bool = False         # evolve thickness with SSA advection
    g: float = 9.8
    # stress shielding: fraction of wind stress reaching the ocean
    # under the shelf (0 = fully shielded, the reference default)
    stress_frac: float = 0.0
    min_thickness: float = 1e-3   # [m] shelf presence threshold


import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShelfState:
    h_shelf: jnp.ndarray          # ice thickness [m] (njh, nih)

    def mask(self, min_thickness: float = 1e-3):
        return (self.h_shelf > min_thickness).astype(self.h_shelf.dtype)


def init_shelf_thickness(config: str, grid: Grid, max_thick: float,
                         lon_extent: float, west: float = 0.0,
                         thick_file: str | None = None,
                         var: str = "thick", halo: int = 4):
    """SHELF_THICKNESS_CONFIG registry: 'channel' tapers linearly from
    max_thick at the west wall to zero at west+lon_extent (the
    ISOMIP/Jenkins-style profile of the reference's
    initialize_ice_thickness); 'file' reads a (nj, ni) field."""
    if config == "file":
        from mom6_tpu.framework.io import read_field
        arr = np.asarray(read_field(thick_file, var), np.float64)
        return jnp.asarray(np.pad(arr, halo, mode="edge"))
    if config == "channel":
        lon = np.asarray(grid.geoLonT)
        frac = np.clip((lon - west) / max(lon_extent, 1e-30), 0.0, 1.0)
        return jnp.asarray(max_thick * (1.0 - frac)
                           * np.asarray(grid.mask2dT))
    raise ValueError(f"Unknown SHELF_THICKNESS_CONFIG '{config}'")


class ShelfStepResult(NamedTuple):
    state: ShelfState
    u: jnp.ndarray
    v: jnp.ndarray


def step_shelf(domain, grid: Grid, state: ShelfState, cfg: ShelfCfg,
               dt: float, melt=None, u0=None, v0=None
               ) -> ShelfStepResult:
    """One shelf dynamics step: SSA velocities, upwind flux-form
    thickness advection, melt thinning (ice_shelf_advect)."""
    h = state.h_shelf
    mask = state.mask(cfg.min_thickness)
    h, mask = domain.fill_halos((h, mask))
    res = ssa_velocity_solve(cfg.ssa, grid, h, mask, u0=u0, v0=v0)
    u, v = domain.fill_halos((res.u, res.v))
    # face velocities (SSA solves at h points) and upwind thickness
    u_f = 0.5 * (u + ip1(u)) * grid.mask2dCu
    v_f = 0.5 * (v + jp1(v)) * grid.mask2dCv
    h_up_x = jnp.where(u_f > 0.0, h, ip1(h))
    h_up_y = jnp.where(v_f > 0.0, h, jp1(h))
    fx = u_f * h_up_x * grid.dyCu
    fy = v_f * h_up_y * grid.dxCv
    dh = -((fx - im1(fx)) + (fy - jm1(fy))) * grid.IareaT * dt
    h_new = h + dh * grid.mask2dT
    if melt is not None:
        h_new = h_new - (melt / cfg.thermo.rho_ice) * dt
    h_new = jnp.maximum(h_new, 0.0)
    return ShelfStepResult(state=ShelfState(h_shelf=h_new), u=u, v=v)


def shelf_surface_pressure(cfg: ShelfCfg, state: ShelfState):
    """Ocean surface pressure under the shelf [Pa]
    (MOM_ice_shelf.F90 adds rho_ice g h to p_surf)."""
    return cfg.thermo.rho_ice * cfg.g * state.h_shelf


def shelf_fluxes(cfg: ShelfCfg, state: ShelfState, T_top, S_top):
    """Basal melt fluxes for the ocean's surface flux structure:
    (heat [W m-2, negative cooling], freshwater [kg m-2 s-1]) masked
    to the shelf footprint."""
    mask = state.mask(cfg.min_thickness)
    _, p_b = shelf_draft(cfg.thermo, state.h_shelf)
    m = three_equation_melt(cfg.thermo, T_top, S_top, p_b,
                            shelf_mask=mask)
    return m.heat_flux, m.fw_flux, m.melt
