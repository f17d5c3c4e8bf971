"""Diabatic (column physics) driver — ALE path.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diabatic_driver.F90:1122 diabatic_ALE:
  set_diffusivity (background + shear/kappa-shear + convection +
  double diffusion + tidal)
  → boundary-layer scheme (KPP or energetic PBL)
  → applyBoundaryFluxesInOut (surface heat/salt/mass forcing with
    opacity-profile shortwave penetration)
  → geothermal bottom heating
  → implicit vertical diffusion of T/S and tracers
    (tracer_vertdiff_Eulerian)
  → full convective adjustment / frazil
  → tracer column physics (driven by the orchestrator).
The layered (isopycnal-mode) path instead runs the bulk mixed layer,
diffusive entrainment and surface-layer regularization
(MOM_diabatic_driver.F90:1648 layered_diabatic).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import Fluxes, MechForcing
from mom6_tpu.param.vertical.set_diffusivity import (DiffusivityCfg,
                                                     set_diffusivity)
from mom6_tpu.param.vertical.kpp import KPPCfg, kpp_coefficients
from mom6_tpu.param.vertical.energetic_pbl import EPBLCfg, energetic_pbl
from mom6_tpu.param.vertical.opacity import OpacityCfg
from mom6_tpu.param.vertical.geothermal import (GeothermalCfg,
                                                geothermal_heating)
from mom6_tpu.param.vertical.full_convection import (FullConvectionCfg,
                                                     full_convection)
from mom6_tpu.param.vertical.bulk_mixed_layer import (BulkMixedLayerCfg,
                                                      bulk_mixed_layer)
from mom6_tpu.param.vertical.entrain_diffusive import (
    EntrainDiffusiveCfg, entrainment_diffusive)
from mom6_tpu.param.vertical.regularize_layers import (
    RegularizeLayersCfg, regularize_layers)
from mom6_tpu.param.vertical.diabatic_aux import (FrazilCfg, make_frazil,
                                                  apply_boundary_fluxes)
from mom6_tpu.tracer.vertdiff import tracer_vertdiff
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["DiabaticCfg", "diabatic"]

_CP = 3991.86795711963      # J kg-1 K-1 (reference C_P default)


@dataclasses.dataclass(frozen=True)
class DiabaticCfg:
    diffusivity: DiffusivityCfg = DiffusivityCfg()
    use_kpp: bool = False          # USE_KPP
    kpp: KPPCfg = KPPCfg()
    use_epbl: bool = False         # ENERGETICS_SFC_PBL
    epbl: EPBLCfg = EPBLCfg()
    rho0: float = 1035.0
    # GUST_CONST: unresolved background gustiness added to |tau| in
    # u* = sqrt((|tau|+gust)/rho0) (MOM_surface_forcing.F90:421-431)
    gust_const: float = 0.0
    # shortwave penetration (PEN_SW_NBANDS > 0 → opacity profile)
    use_opacity: bool = False
    opacity: OpacityCfg = OpacityCfg()
    pen_sw_frac: float = 0.42   # top-layer absorbed fraction fallback
    # DEPTH_LIMIT_FLUXES: scale surface fluxes away where the column
    # is shallower than this (extractFluxes1d H_limit_fluxes)
    depth_limit_fluxes: float = 0.0
    # USE_PSURF_IN_EOS: include the surface pressure in EOS /
    # freezing-point calculations (MOM.F90:2428, default true)
    use_psurf_in_eos: bool = True
    use_geothermal: bool = False   # GEOTHERMAL_FLUX > 0
    geothermal: GeothermalCfg = GeothermalCfg()
    use_full_conv: bool = False    # full convective adjustment
    full_conv: FullConvectionCfg = FullConvectionCfg()
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
    # surface-wave (Langmuir) enhancement of the boundary-layer mixing
    # (USE_WAVES; MOM_wave_interface.F90 -> KPP/ePBL enhancement)
    use_waves: bool = False
    waves: object = None           # WavesCfg


def _surface_buoyancy_flux(fluxes, T, S, eos, rho0, g):
    """Destabilizing-positive surface buoyancy flux [m2 s-3] from the
    net heat and salt fluxes (buoyancy_forcing of
    MOM_forcing_type.F90): B = (g/ρ0)(∂ρ/∂T·F_T + ∂ρ/∂S·F_S) with
    F_T = Q/(ρ0 Cp) [K m s-1], F_S the equivalent salt flux."""
    zero = jnp.zeros_like(T[0])
    heat = zero
    for f in (fluxes.sw, fluxes.lw, fluxes.latent, fluxes.sensible):
        if f is not None:
            heat = heat + f
    f_t = heat / (rho0 * _CP)
    f_s = zero
    if fluxes.salt_flux is not None:
        f_s = f_s + fluxes.salt_flux * (1000.0 / rho0)
    # freshwater dilution is a negative equivalent salt flux
    massin = zero
    for f in (fluxes.lprec, fluxes.fprec):
        if f is not None:
            massin = massin + f
    if fluxes.evap is not None:
        massin = massin - fluxes.evap
    f_s = f_s - S[0] * massin / rho0
    drdt, drds = eos.density_derivs(T[0], S[0], zero)
    # warming (f_t>0) with dρ/dT<0 → stabilizing (negative)
    return (g / rho0) * (drdt * f_t + drds * f_s)


@jax.named_scope("diabatic")
def diabatic(state: State, fluxes: Optional[Fluxes], dt: float,
             cfg: DiabaticCfg, tracers: dict | None = None,
             vgrid=None, eos=None, forces: MechForcing | None = None,
             grid=None, tidal_energy_2d=None, mld_prev=None):
    """Apply surface fluxes + implicit vertical mixing to T/S/tracers.

    Returns (new_state, new_tracers, dia) where ``dia`` is a dict of
    column diagnostics: ``kd_int`` (the assembled interface
    diffusivity), ``mld`` (boundary-layer / mixed-layer depth [m]
    when KPP or ePBL ran) and, with FRAZIL=True, ``frazil`` — the
    column heat deficit [J m-2] the ice model must extract as
    frazil-ice formation."""
    h = state.h
    T, S = state.T, state.S
    g = vgrid.g_Earth if vgrid is not None else 9.8
    ustar_sfc = None
    if cfg.diffusivity.ml_radiation and forces is not None \
            and grid is not None and vgrid is not None:
        from mom6_tpu.core.vert_friction import surface_ustar
        ustar_sfc = surface_ustar(grid, vgrid.Rho0, forces)
    dres = set_diffusivity(h, cfg.diffusivity, vgrid=vgrid,
                           u=state.u, v=state.v, T=T, S=S, eos=eos,
                           lat=grid.geoLatT if grid is not None else None,
                           tidal_energy_2d=tidal_energy_2d,
                           ustar=ustar_sfc, mld=mld_prev)
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
        ustar = jnp.sqrt((tau_h + cfg.gust_const) / cfg.rho0)
    if fluxes is not None and T is not None and eos is not None:
        buoy_flux = _surface_buoyancy_flux(fluxes, T, S, eos,
                                           cfg.rho0, g)

    lang_enh = None
    if cfg.use_waves and cfg.waves is not None:
        # Langmuir enhancement from the empirical Stokes drift: the
        # Li et al. (2016) factor scales the boundary-layer
        # diffusivity (proportional to the enhanced w_s/mstar)
        from mom6_tpu.param.waves.wave_interface import (
            stokes_profile, langmuir_number, langmuir_enhancement)
        u10 = 800.0 * ustar        # tau continuity across the surface
        st = stokes_profile(cfg.waves, h, u10=u10)
        la = langmuir_number(ustar, st.us0)
        lang_enh = langmuir_enhancement(la)

    mld = None
    if cfg.use_kpp and vgrid is not None:
        kpp = kpp_coefficients(cfg.kpp, state.u, state.v, h, T, S, eos,
                               cfg.rho0, vgrid.g_Earth, ustar=ustar,
                               buoy_flux=buoy_flux)
        kd_kpp = kpp.kd_int
        if lang_enh is not None:
            kd_kpp = kd_kpp * lang_enh[None]
        kd_int = kd_int + kd_kpp
        mld = kpp.bld
    elif cfg.use_epbl and vgrid is not None:
        absf = None
        if grid is not None:
            from mom6_tpu.parallel.stencil import im1, jm1
            fq = jnp.abs(grid.CoriolisBu)
            # h-point average of the four surrounding corner values
            absf = 0.25 * ((fq + im1(jm1(fq))) + (im1(fq) + jm1(fq)))
        ep = energetic_pbl(cfg.epbl, h, T, S, eos, cfg.rho0,
                           vgrid.g_Earth, dt, ustar=ustar,
                           buoy_flux=buoy_flux, absf=absf)
        kd_ep = ep.kd_int
        if lang_enh is not None:
            kd_ep = kd_ep * lang_enh[None]
        kd_int = kd_int + kd_ep
        mld = ep.mld

    # --- surface flux application (applyBoundaryFluxesInOut) ---
    if fluxes is not None and T is not None:
        bf = apply_boundary_fluxes(
            h, T, S, fluxes, dt, cfg.rho0, cp=_CP,
            opacity_cfg=cfg.opacity if cfg.use_opacity else None,
            pen_sw_frac=cfg.pen_sw_frac,
            angstrom=vgrid.angstrom if vgrid is not None else 1e-10,
            depth_limit_fluxes=cfg.depth_limit_fluxes)
        h, T, S = bf.h, bf.T, bf.S

    # --- geothermal bottom heating (MOM_geothermal.F90) ---
    if cfg.use_geothermal and T is not None:
        T = geothermal_heating(cfg.geothermal, T, h, dt)

    # --- implicit vertical diffusion of T/S and tracers ---
    if T is not None:
        T = tracer_vertdiff(T, h, kd_int, dt)
        kd_S = kd_int if dres.kd_extra_S is None \
            else kd_int + dres.kd_extra_S
        S = tracer_vertdiff(S, h, kd_S, dt)

    new_tracers = tracers
    if tracers is not None:
        new_tracers = {k: tracer_vertdiff(v, h, kd_int, dt)
                       for k, v in tracers.items()}

    # --- full convective adjustment (MOM_full_convection.F90) ---
    if cfg.use_full_conv and T is not None and eos is not None:
        T, S = full_convection(cfg.full_conv, T, S, h, eos)

    # frazil formation: clamp sub-freezing water back to the freezing
    # point (make_frazil, MOM_diabatic_aux.F90:95); the column heat
    # deficit is returned to the caller as the frazil ice-model flux
    frazil = None
    if cfg.do_frazil and T is not None:
        # USE_PSURF_IN_EOS: the surface load enters the freezing
        # point (sea-ice / ice-shelf depression of T_freeze)
        psurf = forces.p_surf if (cfg.use_psurf_in_eos
                                  and forces is not None) else None
        T, frazil = make_frazil(cfg.frazil, h, T, S,
                                angstrom=vgrid.angstrom
                                if vgrid is not None else 1e-10,
                                p_surf=psurf,
                                frazil_prev=state.frazil)

    # --- layered (isopycnal-mode) physics: thicknesses evolve ---
    if cfg.use_bml and T is not None and eos is not None:
        # cell-centered velocities and |f| for the bulk-Ri MKE release
        # and the TKE decay scale (mechanical_entrainment,
        # MOM_bulk_mixed_layer.F90:1530-1537,1789)
        u_h = v_h = absf = None
        if state.u is not None and cfg.bml.bulk_ri > 0.0:
            from mom6_tpu.parallel.stencil import im1, jm1
            u_h = 0.5 * (im1(state.u) + state.u)
            v_h = 0.5 * (jm1(state.v) + state.v)
        if grid is not None and cfg.bml.tke_decay > 0.0:
            from mom6_tpu.parallel.stencil import im1, jm1
            fq = jnp.abs(grid.CoriolisBu)
            absf = 0.25 * ((fq + im1(jm1(fq))) + (im1(fq) + jm1(fq)))
        h, T, S, new_tracers, _ = bulk_mixed_layer(
            cfg.bml, h, T, S, eos, ustar, buoy_flux, dt,
            tracers=new_tracers, u=u_h, v=v_h, absf=absf)
    if cfg.use_entrain_diffusive:
        trs = dict(new_tracers) if new_tracers else {}
        if T is not None:
            trs = {"_T": T, "_S": S, **trs}
        h, trs, _ = entrainment_diffusive(
            cfg.entrain, h, kd_int, dt, trs or None,
            gprime=vgrid.g_prime if vgrid is not None else None)
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

    dia = {"kd_int": kd_int}
    if mld is not None:
        dia["mld"] = mld
    if frazil is not None:
        dia["frazil"] = frazil
    if dres.kv_shear is not None:
        # shear-driven Kv for the NEXT dynamics step's vertvisc (the
        # visc%Kv_shear carry, MOM_vert_friction.F90:1892)
        dia["kv_shear"] = dres.kv_shear
    out = state.replace(h=h, T=T, S=S)
    if frazil is not None:
        # accumulated tv%frazil rides the prognostic state (and the
        # restarts) until the ice model extracts it
        out = out.replace(frazil=frazil)
    return out, new_tracers, dia
