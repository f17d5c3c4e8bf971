"""Diabatic (column physics) driver — ALE path.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diabatic_driver.F90:1122 diabatic_ALE:
  set_diffusivity (background + shear + convection + double diffusion)
  → KPP boundary-layer mixing → applyBoundaryFluxesInOut (surface
  heat/salt forcing into the top layer) → implicit vertical diffusion
  of T/S and tracers (tracer_vertdiff_Eulerian) → tracer column
  physics.  (ePBL alternative, CVMix tidal, opacity/SW penetration and
  ALE sponges are planned follow-ons.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import Fluxes, MechForcing
from mom6_tpu.param.vertical.set_diffusivity import (DiffusivityCfg,
                                                     set_diffusivity)
from mom6_tpu.param.vertical.kpp import KPPCfg, kpp_coefficients
from mom6_tpu.param.vertical.bulk_mixed_layer import (BulkMixedLayerCfg,
                                                      bulk_mixed_layer)
from mom6_tpu.param.vertical.entrain_diffusive import (
    EntrainDiffusiveCfg, entrainment_diffusive)
from mom6_tpu.param.vertical.regularize_layers import (
    RegularizeLayersCfg, regularize_layers)
from mom6_tpu.param.vertical.diabatic_aux import FrazilCfg, make_frazil
from mom6_tpu.tracer.vertdiff import tracer_vertdiff
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["DiabaticCfg", "diabatic"]

_CP = 3991.86795711963      # J kg-1 K-1 (reference C_P default)


@dataclasses.dataclass(frozen=True)
class DiabaticCfg:
    diffusivity: DiffusivityCfg = DiffusivityCfg()
    use_kpp: bool = False          # USE_KPP
    kpp: KPPCfg = KPPCfg()
    rho0: float = 1035.0
    pen_sw_frac: float = 0.42   # non-penetrating SW fraction absorbed
                                # in the top layer (opacity is planned)
    # layered (isopycnal-mode) column physics,
    # MOM_diabatic_driver.F90:1648 layered_diabatic
    use_bml: bool = False          # BULKMIXEDLAYER
    bml: BulkMixedLayerCfg = BulkMixedLayerCfg()
    use_entrain_diffusive: bool = False
    entrain: EntrainDiffusiveCfg = EntrainDiffusiveCfg()
    use_regularize: bool = False   # REGULARIZE_SURFACE_LAYERS
    regularize: RegularizeLayersCfg = RegularizeLayersCfg()
    do_frazil: bool = False        # FRAZIL
    frazil: FrazilCfg = FrazilCfg()


def diabatic(state: State, fluxes: Optional[Fluxes], dt: float,
             cfg: DiabaticCfg, tracers: dict | None = None,
             vgrid=None, eos=None, forces: MechForcing | None = None,
             grid=None):
    """Apply surface fluxes + implicit vertical mixing to T/S/tracers.

    Returns (new_state, new_tracers, kd_int)."""
    h = state.h
    T, S = state.T, state.S
    dres = set_diffusivity(h, cfg.diffusivity, vgrid=vgrid,
                           u=state.u, v=state.v, T=T, S=S, eos=eos,
                           lat=grid.geoLatT if grid is not None else None)
    kd_int = dres.kd_int

    ustar = jnp.zeros_like(h[0])
    buoy_flux = jnp.zeros_like(h[0])
    if forces is not None and forces.taux is not None:
        tau_h = jnp.sqrt(
            (0.5 * (forces.taux + ip1(forces.taux))) ** 2
            + (0.5 * ((forces.tauy if forces.tauy is not None
                       else 0.0 * forces.taux)
                      + jp1(forces.tauy if forces.tauy is not None
                            else 0.0 * forces.taux))) ** 2)
        ustar = jnp.sqrt(tau_h / cfg.rho0)

    if cfg.use_kpp and vgrid is not None:
        kpp = kpp_coefficients(cfg.kpp, state.u, state.v, h, T, S, eos,
                               cfg.rho0, vgrid.g_Earth, ustar=ustar,
                               buoy_flux=buoy_flux)
        kd_int = kd_int + kpp.kd_int

    sfc_T = None
    sfc_S = None
    if fluxes is not None and T is not None:
        heat = jnp.zeros_like(h[0])
        for f in (fluxes.sw, fluxes.lw, fluxes.latent, fluxes.sensible):
            if f is not None:
                heat = heat + f
        sfc_T = heat / (cfg.rho0 * _CP)          # [degC m s-1]
        if fluxes.salt_flux is not None:
            sfc_S = fluxes.salt_flux * (1000.0 / cfg.rho0)

    if T is not None:
        T = tracer_vertdiff(T, h, kd_int, dt, sfc_flux=sfc_T)
        kd_S = kd_int if dres.kd_extra_S is None \
            else kd_int + dres.kd_extra_S
        S = tracer_vertdiff(S, h, kd_S, dt, sfc_flux=sfc_S)

    new_tracers = tracers
    if tracers is not None:
        new_tracers = {k: tracer_vertdiff(v, h, kd_int, dt)
                       for k, v in tracers.items()}

    # frazil formation: clamp sub-freezing water back to the freezing
    # point (make_frazil, MOM_diabatic_aux.F90:95); the heat deficit
    # is an ice-model flux — routing it to the coupler cap is a
    # planned refinement
    if cfg.do_frazil and T is not None:
        T, _frazil = make_frazil(cfg.frazil, h, T, S)

    # --- layered (isopycnal-mode) physics: thicknesses evolve ---
    if cfg.use_bml and T is not None and eos is not None:
        h, T, S, new_tracers, _ = bulk_mixed_layer(
            cfg.bml, h, T, S, eos, ustar, buoy_flux, dt,
            tracers=new_tracers)
    if cfg.use_entrain_diffusive:
        trs = dict(new_tracers) if new_tracers else {}
        if T is not None:
            trs = {"_T": T, "_S": S, **trs}
        h, trs, _ = entrainment_diffusive(cfg.entrain, h, kd_int, dt,
                                          trs or None)
        if trs:
            T = trs.pop("_T", T)
            S = trs.pop("_S", S)
            new_tracers = trs if new_tracers else new_tracers
    if cfg.use_regularize:
        trs = dict(new_tracers) if new_tracers else {}
        if T is not None:
            trs = {"_T": T, "_S": S, **trs}
        h, trs = regularize_layers(cfg.regularize, h, trs or None)
        if trs:
            T = trs.pop("_T", T)
            S = trs.pop("_S", S)
            new_tracers = trs if new_tracers else new_tracers

    return state.replace(h=h, T=T, S=S), new_tracers, kd_int
