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
    # water column below which a cell counts as grounded [m]
    ground_min_col: float = 1e-3
    # front advance: ice flux into empty cells builds partial cover
    advance_front: bool = True
    # stress shielding: fraction of wind stress reaching the ocean
    # under the shelf (0 = fully shielded, the reference default)
    stress_frac: float = 0.0
    min_thickness: float = 1e-3   # [m] shelf presence threshold
    # --- vertically-integrated ice temperature evolution
    # (ice_shelf_temp, MOM_ice_shelf_dynamics.F90:3694): advects T·h
    # with the ice flow and exchanges heat at the surface (accumulation
    # at Tsurf) and base (melt at the local freezing point); the
    # temperature feeds the rheology via glen_a_arrhenius ---
    evolve_temp: bool = False
    t_surf: float = -20.0         # surface air temperature [degC]
    adot: float = 0.1 / (365.0 * 86400.0)   # surface accum [m s-1 ice]
    t_shelf_missing: float = -10.0          # T_SHELF_MISSING [degC]
    t_freeze_base: float = -1.9   # basal freezing temperature [degC]


import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShelfState:
    h_shelf: jnp.ndarray          # ice thickness [m] (njh, nih)
    # fraction of the cell covered by ice (the reference's
    # area_shelf_h / hmask==2 partial cells at the calving front,
    # MOM_ice_shelf_dynamics.F90:1754); None → full coverage wherever
    # h_shelf exceeds the presence threshold
    area_frac: Optional[jnp.ndarray] = None
    # bed elevation (depth below sea level, positive down) for the
    # grounding-line flotation test; None → deep ocean (all afloat)
    bed_elev: Optional[jnp.ndarray] = None
    # vertically averaged ice temperature [degC] (t_shelf,
    # MOM_ice_shelf_dynamics.F90:84); None → isothermal rheology
    t_shelf: Optional[jnp.ndarray] = None

    def mask(self, min_thickness: float = 1e-3):
        return (self.h_shelf > min_thickness).astype(self.h_shelf.dtype)

    def full_mask(self, min_thickness: float = 1e-3):
        """1 where the cell is fully ice-covered (hmask==1): only
        full cells export ice (partial cells accumulate until they
        fill — 'partly covered - no export')."""
        m = self.mask(min_thickness)
        if self.area_frac is None:
            return m
        return m * (self.area_frac >= 1.0 - 1e-9).astype(m.dtype)


def update_grounding(cfg: "ShelfCfg", state: ShelfState,
                     ocean_col_thick=None):
    """Flotation-mask update (update_OD_ffrac[_uncoupled],
    MOM_ice_shelf_dynamics.F90:780-812): a cell is grounded when the
    ice draft rho_i/rho_w · h exceeds the bed depth; with
    ``ocean_col_thick`` (coupled grounding) when the ocean column
    under the shelf has vanished.  Returns (od_av, ground_frac)."""
    rr = cfg.ssa.rho_ice / cfg.ssa.rho_sw
    if ocean_col_thick is not None:
        od = ocean_col_thick
    elif state.bed_elev is not None:
        od = state.bed_elev - rr * state.h_shelf
    else:
        return None, jnp.zeros_like(state.h_shelf)
    grounded = (od < cfg.ground_min_col).astype(state.h_shelf.dtype) \
        * state.mask(cfg.min_thickness)
    return jnp.maximum(od, 0.0), grounded


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
               dt: float, melt=None, u0=None, v0=None,
               ocean_col_thick=None) -> ShelfStepResult:
    """One shelf dynamics step (update_ice_shelf,
    MOM_ice_shelf_dynamics.F90:853): flotation-mask update, SSA
    velocities with (Coulomb) basal friction over grounded ice,
    positivity-preserving upwind thickness advection with no export
    from partial front cells, melt thinning, and calving-front
    advance into empty cells (shelf_advance_front analog)."""
    h = state.h_shelf
    mask = state.mask(cfg.min_thickness)
    area = state.area_frac if state.area_frac is not None else mask
    bed = state.bed_elev
    tsh = state.t_shelf
    fills = [h, mask, area] + ([bed] if bed is not None else []) \
        + ([tsh] if tsh is not None else [])
    out = domain.fill_halos(tuple(fills))
    h, mask, area = out[0], out[1], out[2]
    k = 3
    if bed is not None:
        bed = out[k]
        k += 1
    if tsh is not None:
        tsh = out[k]
    st = ShelfState(h_shelf=h, area_frac=area, bed_elev=bed,
                    t_shelf=tsh)

    # grounding line: flotation test each step (update_OD_ffrac)
    _, ground_frac = update_grounding(cfg, st, ocean_col_thick)

    # evolving temperature → Glen rate factor (calc_shelf_visc MODEL
    # path with A(T); glen_a_arrhenius)
    a2d = None
    if tsh is not None:
        from mom6_tpu.ice_shelf.dynamics import glen_a_arrhenius
        a2d = glen_a_arrhenius(tsh, a_ref=cfg.ssa.glen_a)

    res = ssa_velocity_solve(cfg.ssa, grid, h, mask, u0=u0, v0=v0,
                             ground_frac=ground_frac, bed_elev=bed,
                             a_glen_2d=a2d)
    u, v = domain.fill_halos((res.u, res.v))

    full = st.full_mask(cfg.min_thickness)
    # face velocities (SSA solves at h points); only full cells export
    # (hmask==2 'partly covered - no export')
    u_f = 0.5 * (u + ip1(u)) * grid.mask2dCu
    v_f = 0.5 * (v + jp1(v)) * grid.mask2dCv
    up_full_x = jnp.where(u_f > 0.0, full, ip1(full))
    up_full_y = jnp.where(v_f > 0.0, full, jp1(full))
    h_up_x = jnp.where(u_f > 0.0, h, ip1(h)) * up_full_x
    h_up_y = jnp.where(v_f > 0.0, h, jp1(h)) * up_full_y
    fx = u_f * h_up_x * grid.dyCu
    fy = v_f * h_up_y * grid.dxCv

    # positivity: scale each cell's OUTgoing fluxes so no more volume
    # leaves than the cell holds (flux-limited upwind; the reference
    # relies on its CFL limit, ice_shelf_advect)
    out_x = jnp.maximum(fx, 0.0) + jnp.maximum(-im1(fx), 0.0)
    out_y = jnp.maximum(fy, 0.0) + jnp.maximum(-jm1(fy), 0.0)
    avail = h * grid.areaT / dt
    lim = jnp.minimum(1.0, avail / jnp.maximum(out_x + out_y, _EPS))
    lim = domain.fill_halos(lim)
    # a face's limiter is its upwind cell's
    lim_x = jnp.where(u_f > 0.0, lim, ip1(lim))
    lim_y = jnp.where(v_f > 0.0, lim, jp1(lim))
    fx = fx * lim_x
    fy = fy * lim_y

    div = ((fx - im1(fx)) + (fy - jm1(fy))) * grid.IareaT * dt
    # full cells: plain flux-form update
    h_new = (h - div) * grid.mask2dT

    if cfg.advance_front:
        # empty/partial cells: inflow builds partial volume at the
        # reference thickness of the cells fluxing in
        # (shelf_advance_front, MOM_ice_shelf_dynamics.F90:1890+)
        fin_e = jnp.maximum(-fx, 0.0)          # from the east nbr
        fin_w = jnp.maximum(im1(fx), 0.0)
        fin_n = jnp.maximum(-fy, 0.0)
        fin_s = jnp.maximum(jm1(fy), 0.0)
        tot_in = (fin_e + fin_w) + (fin_n + fin_s)      # [m3/s·dt]
        href_num = (fin_e * ip1(h) + fin_w * im1(h)
                    + fin_n * jp1(h) + fin_s * jm1(h))
        h_ref = href_num / jnp.maximum(tot_in, _EPS)
        not_full = (1.0 - full) * grid.mask2dT
        # existing partial volume + inflow (cell-averaged thickness)
        vol = (area * h + tot_in * dt * grid.IareaT) * not_full
        # an existing partial cell keeps its own reference thickness;
        # a newly-touched empty cell takes the inflow-weighted one
        h_ref = jnp.where(area > 0.0, h, h_ref)
        h_ref = jnp.maximum(h_ref, cfg.min_thickness)
        new_frac = jnp.minimum(vol / h_ref, 1.0)
        # once filled, carry the whole volume as thickness (overflow
        # stays in-cell — conservative, spread on the next step)
        filled = (vol >= h_ref * (1.0 - 1e-9)).astype(h.dtype)
        h_part = jnp.where(filled > 0, vol,
                           jnp.where(new_frac > 0, h_ref, 0.0))
        h_new = jnp.where(not_full > 0, h_part, h_new)
        area_new = jnp.where(not_full > 0,
                             jnp.maximum(filled, new_frac),
                             jnp.ones_like(area) * (h_new
                                                    > cfg.min_thickness))
    else:
        area_new = (h_new > cfg.min_thickness).astype(h.dtype)

    if melt is not None:
        h_new = h_new - (melt / cfg.thermo.rho_ice) * dt
    h_new = jnp.maximum(h_new, 0.0)
    area_new = jnp.where(h_new > cfg.min_thickness, area_new, 0.0)

    t_new = None
    if tsh is not None and cfg.evolve_temp:
        # (hT)_t = -div(u hT) + (adot·Tsurf − mdot·Tfreeze)/ρ_i
        # with the SAME limited fluxes as the thickness update
        # (ice_shelf_temp, MOM_ice_shelf_dynamics.F90:3694-3775).
        # T is recovered against the purely ADVECTIVE thickness (same
        # fluxes, so T_new is a convex combination of upwind values);
        # the front-advance partial-cell bookkeeping redistributes
        # volume, not temperature.
        t_up_x = jnp.where(u_f > 0.0, tsh, ip1(tsh))
        t_up_y = jnp.where(v_f > 0.0, tsh, jp1(tsh))
        ftx = fx * t_up_x
        fty = fy * t_up_y
        th = tsh * h
        th = th - ((ftx - im1(ftx)) + (fty - jm1(fty))) \
            * grid.IareaT * dt
        melt_i = (melt / cfg.thermo.rho_ice) if melt is not None \
            else 0.0
        h_adv = jnp.maximum((h - div) * grid.mask2dT
                            - melt_i * dt, 0.0)
        t_adv = th / jnp.maximum(h_adv, cfg.min_thickness)
        # surface/basal heat exchange on the *average* temperature
        t_adv = t_adv + dt * (cfg.adot * cfg.t_surf
                              - melt_i * cfg.t_freeze_base) \
            / jnp.maximum(h_adv, cfg.min_thickness) * mask
        t_new = jnp.where((h_new > cfg.min_thickness)
                          & (h_adv > cfg.min_thickness),
                          t_adv, cfg.t_shelf_missing)
        # keep within physical bounds
        t_new = jnp.clip(t_new, -60.0, 0.0)
    elif tsh is not None:
        t_new = tsh

    return ShelfStepResult(
        state=ShelfState(h_shelf=h_new, area_frac=area_new,
                         bed_elev=state.bed_elev, t_shelf=t_new),
        u=u, v=v)


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
