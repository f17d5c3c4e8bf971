"""Coupled-model API surface.

Re-design of /root/reference/config_src/drivers/FMS_cap/
ocean_model_MOM.F90: the ``ocean_model_init`` / ``update_ocean_model``
/ ``ocean_model_end`` lifecycle a coupler (or the NUOPC/ESMF cap,
nuopc_cap/mom_cap.F90, which wraps the same calls) drives, plus
``extract_surface_state`` (MOM.F90:3686) exporting SST/SSS/u/v/SSH to
the coupler and the ice-ocean-boundary → forcing conversion
(MOM_surface_forcing_gfdl.F90 essence).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import Model, build_model
from mom6_tpu.core.forcing import MechForcing, Fluxes
from mom6_tpu.core.pressure_force import interface_heights
from mom6_tpu.parallel.stencil import im1, jm1

__all__ = ["IceOceanBoundary", "SurfaceState", "ocean_model_init",
           "update_ocean_model", "extract_surface_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IceOceanBoundary:
    """Fluxes the coupler hands the ocean (ice_ocean_boundary_type)."""
    u_flux: Optional[jnp.ndarray] = None     # zonal stress [Pa]
    v_flux: Optional[jnp.ndarray] = None
    t_flux: Optional[jnp.ndarray] = None     # sensible heat [W m-2]
    q_flux: Optional[jnp.ndarray] = None     # evaporation [kg m-2 s-1]
    sw_flux: Optional[jnp.ndarray] = None
    lw_flux: Optional[jnp.ndarray] = None
    lprec: Optional[jnp.ndarray] = None
    salt_flux: Optional[jnp.ndarray] = None
    p_surf: Optional[jnp.ndarray] = None
    # coupler_bc_type gas-flux tables (MOM_couplertype_infra.F90):
    # atmospheric partial pressures / winds / ice fraction for the
    # BGC gas exchange, keyed by the BGC registry's field names
    gas_fields: Optional[dict] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceState:
    """What the ocean exports to the coupler (surface type,
    MOM_variables.F90)."""
    sst: jnp.ndarray
    sss: jnp.ndarray
    u: jnp.ndarray          # surface currents at h points
    v: jnp.ndarray
    sea_lev: jnp.ndarray


def ocean_model_init(param_sources: list[str] | None = None,
                     text: str | None = None) -> Model:
    """Build the ocean component (ocean_model_init, :224)."""
    pf = ParamFile(*(param_sources or []), text=text)
    model = build_model(pf)
    pf.close(fatal_unused=False)
    return model


def _iob_to_forcing(iob: IceOceanBoundary, grid):
    taux = iob.u_flux
    tauy = iob.v_flux
    forces = MechForcing(taux=taux, tauy=tauy, p_surf=iob.p_surf)
    fluxes = Fluxes(sw=iob.sw_flux, lw=iob.lw_flux,
                    sensible=iob.t_flux, evap=iob.q_flux,
                    lprec=iob.lprec, salt_flux=iob.salt_flux,
                    gas_fields=iob.gas_fields)
    return forces, fluxes


def update_ocean_model(model: Model, iob: IceOceanBoundary,
                       state, split_state, tracers, dt_coupling: float,
                       n0: int = 0):
    """Advance the ocean by one coupling interval
    (update_ocean_model, :422).  Returns (state, split_state, tracers,
    SurfaceState)."""
    from mom6_tpu.core.orchestrator import step_ocean
    forces, fluxes = _iob_to_forcing(iob, model.grid)
    nsteps = max(1, int(round(dt_coupling / model.dt)))
    for n in range(nsteps):
        state, split_state, tracers, _ = step_ocean(
            model.domain, model.grid, model.vgrid, state, split_state,
            tracers, forces, fluxes, model.dt, model.ocean_cfg,
            eos=model.eos, x_first=((n0 + n) % 2 == 0),
            tracer_registry=model.tracer_registry, obc=model.obc)
    sfc = extract_surface_state(model, state)
    return state, split_state, tracers, sfc


def extract_surface_state(model: Model, state) -> SurfaceState:
    """SST/SSS/currents/sea level export (MOM.F90:3686)."""
    g, vg = model.grid, model.vgrid
    e = interface_heights(vg, state.h, g.bathyT)
    sst = state.T[0] if state.T is not None else jnp.zeros_like(e[0])
    sss = state.S[0] if state.S is not None else jnp.zeros_like(e[0])
    u_h = 0.5 * (state.u[0] + im1(state.u[0]))
    v_h = 0.5 * (state.v[0] + jm1(state.v[0]))
    return SurfaceState(sst=sst * g.mask2dT, sss=sss * g.mask2dT,
                        u=u_h * g.mask2dT, v=v_h * g.mask2dT,
                        sea_lev=e[0] * g.mask2dT)
