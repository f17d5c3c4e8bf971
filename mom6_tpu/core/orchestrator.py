"""Phase sequencing: dynamics → tracer advection → diabatic → ALE.

The functional counterpart of ``step_MOM`` / ``step_MOM_tracer_dyn`` /
``step_MOM_thermo`` (/root/reference/src/core/MOM.F90:499,1396,1506):
runs one or more dynamics steps accumulating mass transports, advects
tracers (T/S and registered passives) with the accumulated transports,
applies column physics, and performs the ALE regrid/remap.  The
alternating x/y first-direction per step (MOM.F90:1371) threads
through ``x_first``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.forcing import MechForcing, Fluxes
from mom6_tpu.core.dynamics_split_rk2 import (SplitCfg, SplitDynState,
                                              step_dyn_split_rk2)
from mom6_tpu.core.dynamics_unsplit import UnsplitCfg, step_dyn_unsplit
from mom6_tpu.tracer.advect import TracerAdvectCfg, advect_tracers
from mom6_tpu.param.vertical.diabatic import DiabaticCfg, diabatic
from mom6_tpu.param.lateral.thickness_diffuse import (
    ThicknessDiffuseCfg, thickness_diffuse)
from mom6_tpu.param.lateral.interface_filter import (
    InterfaceFilterCfg, interface_filter)
from mom6_tpu.ale.ale_main import ALECfg, ale_regrid_remap
from mom6_tpu.parallel.domain import Domain

__all__ = ["OceanCfg", "step_ocean"]


@dataclasses.dataclass(frozen=True)
class OceanCfg:
    split: bool = True
    split_cfg: Optional[SplitCfg] = None
    unsplit_cfg: Optional[UnsplitCfg] = None
    tracer_adv: TracerAdvectCfg = TracerAdvectCfg()
    diabatic: DiabaticCfg = DiabaticCfg()
    thickness_diffuse: ThicknessDiffuseCfg = ThicknessDiffuseCfg()
    interface_filter: InterfaceFilterCfg = InterfaceFilterCfg()
    ale: Optional[ALECfg] = None         # None → layered (no ALE)
    thermo: bool = True
    adiabatic: bool = False
    # file-driven sponge: {"idamp": (nj,ni) [s-1], "T": (nk,nj,ni),
    # "S": ...} from SPONGE_DAMPING_FILE/SPONGE_STATE_FILE
    sponge_data: Optional[dict] = None


def step_ocean(domain: Domain, grid: Grid, vgrid: VerticalGrid,
               state: State, split_state, tracers: dict | None,
               forces: MechForcing, fluxes: Optional[Fluxes],
               dt: float, cfg: OceanCfg, eos=None,
               x_first: bool = True, tracer_registry=None, obc=None,
               do_thermo: bool = True, uhtr_accum=None,
               vhtr_accum=None, obc_reservoirs=None):
    """One full ocean step of length dt.

    ``do_thermo`` gates the tracer-advection/diabatic/ALE phases (the
    DT_THERM cadence of step_MOM, MOM.F90:801-1506): on skipped steps
    the transports accumulate into uhtr_accum/vhtr_accum and are
    consumed on the next thermo step.  Returns
    (state, split_state, tracers, diags); with obc_reservoirs, a
    5th element carries the updated OBC tracer reservoirs."""
    # thickness diffusion / interface filter act before the dynamics
    # (THICKNESSDIFFUSE, MOM.F90:1160-1186)
    if cfg.thickness_diffuse.khth > 0.0:
        h = domain.fill_halos(state.h, width=2)
        td = thickness_diffuse(grid, vgrid, h, dt, cfg.thickness_diffuse)
        state = state.replace(h=domain.fill_halos(td.h))
    if cfg.interface_filter.time_scale > 0.0:
        h = domain.fill_halos(state.h, width=2)
        hf = interface_filter(domain, grid, vgrid, h, dt,
                              cfg.interface_filter)
        state = state.replace(h=domain.fill_halos(hf))

    h_before = state.h

    if cfg.split:
        state, split_state, diags = step_dyn_split_rk2(
            domain, grid, vgrid, state, split_state, forces, dt,
            cfg.split_cfg, eos=eos, x_first=x_first, obc=obc)
    else:
        state, diags = step_dyn_unsplit(
            domain, grid, vgrid, state, forces, dt, cfg.unsplit_cfg,
            eos=eos)

    # accumulate transports across the thermo interval (uhtr, MOM.F90)
    uhtr = diags.uhtr if uhtr_accum is None else uhtr_accum + diags.uhtr
    vhtr = diags.vhtr if vhtr_accum is None else vhtr_accum + diags.vhtr
    diags = diags._replace(uhtr=uhtr, vhtr=vhtr)
    if not do_thermo:
        if obc_reservoirs is not None:
            return state, split_state, tracers, diags, obc_reservoirs
        return state, split_state, tracers, diags

    # --- tracer transport (T/S ride the same accumulated transports) ---
    if cfg.thermo and state.T is not None:
        adv = {"T": state.T, "S": state.S}
        if tracers:
            adv.update(tracers)
        adv = domain.fill_halos(adv, width=2)
        if obc is not None and obc_reservoirs is not None:
            adv = obc.apply_tracer_reservoirs(adv, obc_reservoirs)
        hb, uhtr, vhtr = domain.fill_halos(
            (h_before, diags.uhtr, diags.vhtr), width=2)
        adv, _ = advect_tracers(domain, grid, adv, hb, uhtr, vhtr,
                                cfg.tracer_adv, x_first=x_first)
        if obc is not None and obc_reservoirs is not None:
            obc_reservoirs = obc.update_tracer_reservoirs(
                obc_reservoirs, adv, state.u, state.v, dt)
        state = state.replace(T=adv.pop("T"), S=adv.pop("S"))
        tracers = adv if adv else tracers
    elif tracers:
        tracers = domain.fill_halos(tracers, width=2)
        if obc is not None and obc_reservoirs is not None:
            tracers = obc.apply_tracer_reservoirs(tracers,
                                                  obc_reservoirs)
        hb, uhtr, vhtr = domain.fill_halos(
            (h_before, diags.uhtr, diags.vhtr), width=2)
        tracers, _ = advect_tracers(domain, grid, tracers, hb, uhtr,
                                    vhtr, cfg.tracer_adv,
                                    x_first=x_first)
        if obc is not None and obc_reservoirs is not None:
            obc_reservoirs = obc.update_tracer_reservoirs(
                obc_reservoirs, tracers, state.u, state.v, dt)

    # --- thermodynamics / column physics ---
    if cfg.thermo and not cfg.adiabatic:
        state, tracers, _ = diabatic(state, fluxes, dt, cfg.diabatic,
                                     tracers, vgrid=vgrid, eos=eos,
                                     forces=forces, grid=grid)
    # sponge restoring toward file profiles (MOM_diabatic_driver
    # applies the [ALE] sponge at the end of the column physics);
    # profiles are damped level-by-level (same-nk profile grids)
    if cfg.sponge_data is not None and state.T is not None:
        from mom6_tpu.param.vertical.sponge import apply_sponge
        sd = cfg.sponge_data
        damped = apply_sponge({"T": state.T, "S": state.S}, state.h,
                              sd["idamp"], dt,
                              {"T": sd["T"], "S": sd["S"]})
        state = state.replace(T=damped["T"], S=damped["S"])
    # per-tracer column physics (call_tracer_column_fns,
    # MOM_tracer_flow_control.F90)
    if tracer_registry is not None and tracers:
        tracers = tracer_registry.apply_column_fns(tracers, state.h, dt)

    # --- ALE regrid/remap ---
    if cfg.ale is not None:
        state = state.replace(
            h=domain.fill_halos(state.h),
            u=domain.fill_halos(state.u), v=domain.fill_halos(state.v))
        if state.T is not None:
            state = state.replace(T=domain.fill_halos(state.T),
                                  S=domain.fill_halos(state.S))
        state, tracers, _ = ale_regrid_remap(grid, vgrid, state,
                                             cfg.ale, eos=eos,
                                             tracers=tracers)
        state = state.replace(h=domain.fill_halos(state.h))
        if cfg.split and split_state is not None:
            # keep the split auxiliaries on the new grid: remap the
            # simple way — refresh h_av to the new h (aux velocities
            # remap is a planned refinement, cf. ALE remap of dyn aux
            # vars MOM_dynamics_split_RK2.F90:1273)
            split_state = dataclasses.replace(split_state, h_av=state.h)

    if obc_reservoirs is not None:
        return state, split_state, tracers, diags, obc_reservoirs
    return state, split_state, tracers, diags
