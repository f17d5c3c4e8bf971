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
from mom6_tpu.core.dynamics_split_rk2 import (SplitCfg, SplitDiags,
                                              SplitDynState,
                                              step_dyn_split_rk2)
from mom6_tpu.core.dynamics_unsplit import UnsplitCfg, step_dyn_unsplit
from mom6_tpu.tracer.advect import TracerAdvectCfg, advect_tracers
from mom6_tpu.param.vertical.diabatic import DiabaticCfg, diabatic
from mom6_tpu.param.lateral.thickness_diffuse import (
    ThicknessDiffuseCfg, thickness_diffuse)
from mom6_tpu.param.lateral.interface_filter import (
    InterfaceFilterCfg, interface_filter)
from mom6_tpu.param.lateral.meke import MEKECfg, step_meke, meke_khth
from mom6_tpu.param.lateral.varmix import (VarMixCfg,
                                           calc_resolution_function,
                                           calc_eady_rate, visbeck_kh)
from mom6_tpu.param.lateral.mixed_layer_restrat import (
    MLRestratCfg, mixed_layer_restrat)
from mom6_tpu.tracer.hor_diff import TracerHorDiffCfg, tracer_hordiff
from mom6_tpu.tracer.neutral_diffusion import (NeutralDiffCfg,
                                               neutral_diffusion)
from mom6_tpu.ale.ale_main import ALECfg, ale_regrid_remap
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.stencil import ip1 as _ip1_, jp1 as _jp1_

__all__ = ["OceanCfg", "step_ocean"]


@dataclasses.dataclass(frozen=True)
class OceanCfg:
    split: bool = True
    # SPLIT_RK2B (MOM.F90:2198): prognose the filtered velocities and
    # reconstruct the instantaneous ones from a 2D increment
    split_rk2b: bool = False
    split_cfg: Optional[SplitCfg] = None
    unsplit_cfg: Optional[UnsplitCfg] = None
    tracer_adv: TracerAdvectCfg = TracerAdvectCfg()
    diabatic: DiabaticCfg = DiabaticCfg()
    thickness_diffuse: ThicknessDiffuseCfg = ThicknessDiffuseCfg()
    # THICKNESSDIFFUSE_FIRST (MOM.F90:1157): apply the GM thickness
    # diffusion (+ interface filter, MEKE step) before the dynamics
    # instead of the default after-dynamics placement (:1297)
    thickness_diffuse_first: bool = False
    interface_filter: InterfaceFilterCfg = InterfaceFilterCfg()
    ale: Optional[ALECfg] = None         # None → layered (no ALE)
    thermo: bool = True
    adiabatic: bool = False
    # file-driven sponge: {"idamp": (nj,ni) [s-1], "T": (nk,nj,ni),
    # "S": ...} from SPONGE_DAMPING_FILE/SPONGE_STATE_FILE
    sponge_data: Optional[dict] = None
    # --- MEKE → VarMix → KHTH coefficient chain (MOM_MEKE.F90,
    # MOM_lateral_mixing_coeffs.F90) ---
    use_meke: bool = False               # USE_MEKE
    meke: MEKECfg = MEKECfg()
    meke_khth_fac: float = 0.0           # MEKE_KHTH_FAC
    meke_khtr_fac: float = 0.0           # MEKE_KHTR_FAC
    use_varmix: bool = False             # USE_VARIABLE_MIXING
    varmix: VarMixCfg = VarMixCfg()
    resoln_scaled_khth: bool = False     # RESOLN_SCALED_KHTH
    resoln_scaled_kh: bool = False       # RESOLN_SCALED_KH (hor_visc)
    resoln_scaled_khtr: bool = False     # RESOLN_SCALED_KHTR
    # --- mixed-layer restratification (MOM_mixed_layer_restrat.F90) ---
    use_mle: bool = False                # MIXEDLAYER_RESTRAT
    mlrestrat: MLRestratCfg = MLRestratCfg()
    # --- lateral tracer diffusion (MOM_tracer_hor_diff.F90 /
    # MOM_neutral_diffusion.F90) ---
    hordiff: TracerHorDiffCfg = TracerHorDiffCfg()
    use_neutral: bool = False            # USE_NEUTRAL_DIFFUSION
    neutral: NeutralDiffCfg = NeutralDiffCfg()
    # near-boundary lateral diffusion within the KPP/ePBL BLD
    # (USE_HORIZONTAL_BOUNDARY_DIFFUSION, MOM_hor_bnd_diffusion.F90)
    use_hbd: bool = False
    hbd: "HorBndDiffCfg" = None
    # --- internal tide energy propagation (MOM_internal_tides.F90);
    # None -> the local-dissipation assumption in tidal mixing ---
    int_tides: Optional[object] = None   # InternalTidesCfg
    int_tide_utide: float = 0.0          # UTIDE barotropic rms [m s-1]
    int_tide_h2: float = 2500.0          # roughness variance [m2]
    # topographic reflection maps (REFL_ANGLE/PREF/DBL files;
    # MOM_internal_tides.F90:2804): (njh, nih) arrays or None
    int_tide_refl_angle: Optional[jnp.ndarray] = None
    int_tide_refl_pref: Optional[jnp.ndarray] = None
    int_tide_refl_dbl: Optional[jnp.ndarray] = None
    # BGC package implementing the BGCPackage protocol
    # (tracer/bgc_interface.py; MOM_generic_tracer/MARBL shape)
    bgc: Optional[object] = None
    # --- SPPT stochastic physics perturbations (MOM_stochastics) ---
    sppt: Optional[object] = None        # StochasticsCfg (None = off)
    sppt_seed: int = 12345
    stoch_eos: bool = False              # STOCH_EOS (pattern -> varT)
    # dynamics steps per thermo step (DT_THERM/DT): the ALE
    # grid-motion filter integrates over the thermo interval
    n_dyn_per_therm: int = 1
    # DIABATIC_FIRST (MOM.F90:1042): run the column physics + ALE on
    # the pre-dynamics state instead of after tracer advection
    diabatic_first: bool = False


def step_ocean(domain: Domain, grid: Grid, vgrid: VerticalGrid,
               state: State, split_state, tracers: dict | None,
               forces: MechForcing, fluxes: Optional[Fluxes],
               dt: float, cfg: OceanCfg, eos=None,
               x_first: bool = True, tracer_registry=None, obc=None,
               do_thermo: bool = True, uhtr_accum=None,
               vhtr_accum=None, obc_reservoirs=None, mld_prev=None,
               t=None, int_tide_en=None, sppt_pattern=None,
               thermo_only=False, kv_shear_prev=None):
    # ``thermo_only``: False = normal fused step; True = skip the
    # dynamics phase (PHASED_JIT phase 2: tracers + thermo/ALE);
    # "tracers" / "thermo" split phase 2 itself in two — the finer
    # 3-executable pipeline the OM4-class config needs to keep each
    # executable's temporaries under the HBM budget.
    """One full ocean step of length dt.

    ``do_thermo`` gates the tracer-advection/diabatic/ALE phases (the
    DT_THERM cadence of step_MOM, MOM.F90:801-1506): on skipped steps
    the transports accumulate into uhtr_accum/vhtr_accum and are
    consumed on the next thermo step.  Returns
    (state, split_state, tracers, diags); with obc_reservoirs, a
    5th element carries the updated OBC tracer reservoirs."""
    # --- thermodynamics / column physics + ALE, as one phase so the
    # DIABATIC_FIRST ordering (MOM.F90:1042: thermo on the
    # pre-dynamics state) can call it ahead of the dynamics ---
    def thermo_and_ale(state, split_state, tracers, int_tide_en,
                       sppt_pattern):
        extras = {}
        # --- thermodynamics / column physics ---
        if cfg.thermo and not cfg.adiabatic:
            tidal_e2d = None
            if cfg.int_tides is not None:
                # propagate the internal-tide energy field and hand its
                # wave-drag dissipation map to the tidal mixing scheme
                # (propagate_int_tide -> itidal_lowmode_loss chain)
                from mom6_tpu.param.lateral.internal_tides import (
                    step_internal_tides, init_en)
                from mom6_tpu.diagnostics.wave_speed import (
                    brunt_vaisala2, wave_speeds)
                hf = domain.fill_halos(state.h)
                tt = domain.fill_halos(state.T) \
                    if state.T is not None else None
                ss = domain.fill_halos(state.S) \
                    if state.S is not None else None
                n2i = brunt_vaisala2(vgrid, hf, tt, ss, eos)
                nb = jnp.sqrt(jnp.maximum(n2i[-1], 0.0))
                # proper modal eigen speeds (wave_speeds,
                # MOM_wave_speed.F90) for every propagated mode
                cn1 = wave_speeds(vgrid, hf, tt, ss, eos,
                                  n_mode=cfg.int_tides.n_mode)
                htot = jnp.sum(hf, axis=0)
                from mom6_tpu.param.vertical.tidal_mixing import \
                    internal_tide_input
                tke_in = internal_tide_input(
                    cfg.int_tide_utide,
                    jnp.sqrt(cfg.int_tide_h2), nb,
                    rho0=vgrid.Rho0,
                    kappa_itides=cfg.int_tides.kappa_itides)
                en = int_tide_en if int_tide_en is not None \
                    else init_en(cfg.int_tides, state.h.shape[1:])
                itr = step_internal_tides(
                    cfg.int_tides, domain, grid, en, cn1, dt, tke_in,
                    nb, htot, u_bt2=cfg.int_tide_utide ** 2,
                    h2_rough=cfg.int_tide_h2,
                    refl_angle=cfg.int_tide_refl_angle,
                    refl_pref=cfg.int_tide_refl_pref,
                    refl_dbl=cfg.int_tide_refl_dbl)
                int_tide_en = itr.En
                tidal_e2d = itr.itidal_loss
                extras["int_tide_en"] = int_tide_en
            # the pattern carry is a bare array for SPPT alone, or a
            # {"sppt", "skeb"} dict when SKEB is active too
            if isinstance(sppt_pattern, dict):
                sp_prev = sppt_pattern.get("sppt")
                sk_prev = sppt_pattern.get("skeb")
            else:
                sp_prev, sk_prev = sppt_pattern, None
            skeb_on = cfg.sppt is not None and cfg.sppt.do_skeb
            sppt_on = cfg.sppt is not None and state.T is not None \
                and (cfg.sppt.do_sppt or cfg.stoch_eos)
            if sppt_on:
                # SPPT (MOM_stochastics SPPT): an AR(1) smoothed random
                # pattern multiplies the column-physics tendencies
                from mom6_tpu.param.stochastic.stochastics import (
                    init_pattern, step_pattern, apply_sppt)
                step_i = jnp.asarray(
                    jnp.round((0.0 if t is None else t) / dt),
                    jnp.int32)
                pat = sp_prev if sp_prev is not None else \
                    init_pattern(domain, cfg.sppt, cfg.sppt_seed)
                pat = step_pattern(domain, cfg.sppt, pat, cfg.sppt_seed,
                                   step_i)
                sp_prev = pat
                if not skeb_on:
                    extras["sppt_pattern"] = pat
                sppt_on = cfg.sppt.do_sppt       # tendencies only if SPPT
                T_b, S_b = state.T, state.S
            state, tracers, dia = diabatic(state, fluxes, dt, cfg.diabatic,
                                           tracers, vgrid=vgrid, eos=eos,
                                           forces=forces, grid=grid,
                                           tidal_energy_2d=tidal_e2d)
            if sppt_on:
                state = state.replace(
                    T=T_b + apply_sppt(cfg.sppt, state.T - T_b, pat),
                    S=S_b + apply_sppt(cfg.sppt, state.S - S_b, pat))
            if skeb_on:
                # SKEB: non-divergent stochastic velocity increment
                # scaled by the smoothed local dissipation rate
                # (apply_skeb, MOM_stochastics.F90:265-390; the
                # reference applies it in step_MOM_thermo, MOM.F90:1613)
                from mom6_tpu.param.stochastic.stochastics import (
                    init_pattern, step_pattern, apply_skeb)
                step_i = jnp.asarray(
                    jnp.round((0.0 if t is None else t) / dt),
                    jnp.int32)
                skeb_seed = cfg.sppt_seed + 7919    # distinct stream
                skp = sk_prev if sk_prev is not None else \
                    init_pattern(domain, cfg.sppt, skeb_seed)
                skp = step_pattern(domain, cfg.sppt, skp, skeb_seed,
                                   step_i)
                uf, vf = domain.fill_vector_halos(state.u, state.v,
                                                  width=1)
                u2, v2 = apply_skeb(domain, grid, cfg.sppt, uf, vf,
                                    skp, dt)
                state = state.replace(u=domain.fill_halos(u2),
                                      v=domain.fill_halos(v2))
                extras["sppt_pattern"] = {"sppt": sp_prev,
                                          "skeb": skp}
            if "frazil" in dia:
                extras["frazil"] = dia["frazil"]
            if "mld" in dia:
                extras["mld"] = dia["mld"]
            if "kv_shear" in dia:
                extras["kv_shear"] = dia["kv_shear"]
        # sponge restoring toward file profiles (MOM_diabatic_driver
        # applies the [ALE] sponge at the end of the column physics);
        # profiles are damped level-by-level (same-nk profile grids)
        if cfg.sponge_data is not None:
            from mom6_tpu.param.vertical.sponge import (apply_sponge,
                                                        apply_eta_sponge)
            sd = cfg.sponge_data
            if sd.get("eta") is not None:
                # layered-mode interface restoring (MOM_sponge.F90);
                # applies in adiabatic/isopycnal runs with no T/S too
                h_sp = apply_eta_sponge(state.h, sd["idamp"], dt,
                                        sd["eta"])
                state = state.replace(h=h_sp)
            if state.T is not None and sd.get("T") is not None:
                damped = apply_sponge({"T": state.T, "S": state.S},
                                      state.h, sd["idamp"], dt,
                                      {"T": sd["T"], "S": sd["S"]},
                                      ref_h=sd.get("ref_h"))
                state = state.replace(T=damped["T"], S=damped["S"])
            if sd.get("uv"):
                # SPONGE_UV: damp the velocities toward rest with the
                # same rates (set_up_ALE_sponge_vel_field of
                # RGC_initialize_sponges; targets are zero)
                idu = 0.5 * (sd["idamp"] + _ip1_(sd["idamp"]))
                idv = 0.5 * (sd["idamp"] + _jp1_(sd["idamp"]))
                state = state.replace(
                    u=state.u / (1.0 + dt * idu)[None],
                    v=state.v / (1.0 + dt * idv)[None])
        # per-tracer column physics (call_tracer_column_fns,
        # MOM_tracer_flow_control.F90)
        if tracer_registry is not None and tracers:
            tracers = tracer_registry.apply_column_fns(
                tracers, state.h, dt, state=state, forces=forces, t=t)
            if cfg.bgc is not None:
                # MARBL_tracers_column_physics analog: the coupler
                # needs the traced time (file forcing), the fluxes
                # (salt-flux virtual fluxes), and shortwave (light)
                tracers = cfg.bgc.column_physics(
                    tracers, state.h, state.T, state.S, dt, t=t,
                    fluxes=fluxes,
                    sw=getattr(fluxes, "sw", None)
                    if fluxes is not None else None)

        # --- ALE regrid/remap ---
        if cfg.ale is not None:
            state = state.replace(
                h=domain.fill_halos(state.h),
                u=domain.fill_halos(state.u), v=domain.fill_halos(state.v))
            if state.T is not None:
                state = state.replace(T=domain.fill_halos(state.T),
                                      S=domain.fill_halos(state.S))
            aux_u = aux_v = None
            has_av = (cfg.split and split_state is not None
                      and hasattr(split_state, "u_av"))
            if has_av:
                aux_u = {"u_av": domain.fill_halos(split_state.u_av)}
                aux_v = {"v_av": domain.fill_halos(split_state.v_av)}
                if hasattr(split_state, "diffu"):
                    # the reference also remaps the stored viscous
                    # accelerations (MOM_dynamics_split_RK2.F90:1300)
                    aux_u["diffu"] = domain.fill_halos(split_state.diffu)
                    aux_v["diffv"] = domain.fill_halos(split_state.diffv)
            # ALE runs once per thermo step, so the grid-motion filter
            # integrates over the thermo interval, not the dynamics dt
            state, tracers, _, aux_u, aux_v = ale_regrid_remap(
                grid, vgrid, state, cfg.ale, eos=eos, tracers=tracers,
                aux_u=aux_u, aux_v=aux_v, dt=dt * cfg.n_dyn_per_therm)
            state = state.replace(h=domain.fill_halos(state.h))
            if has_av:
                # carry the split auxiliaries onto the new grid: remap the
                # time-mean velocities with the face-thickness rule and
                # refresh h_av (remap of dyn aux vars,
                # MOM_dynamics_split_RK2.F90:1273)
                repl = dict(
                    h_av=state.h,
                    u_av=domain.fill_halos(aux_u["u_av"]),
                    v_av=domain.fill_halos(aux_v["v_av"]))
                if "diffu" in aux_u:
                    repl["diffu"] = domain.fill_halos(aux_u["diffu"])
                    repl["diffv"] = domain.fill_halos(aux_v["diffv"])
                split_state = dataclasses.replace(split_state, **repl)


        return state, split_state, tracers, extras

    if thermo_only:
        # PHASED_JIT phase-2 entry: tracer transport + thermo/ALE
        # on pre-accumulated transports.  Keeping this in its own
        # executable halves the peak HBM footprint vs the fused
        # step at the OM4-class 1440x1088x25 design point, where
        # the single-program temporaries exhaust the chip.
        assert not cfg.diabatic_first and obc is None and do_thermo
        _z3 = jnp.zeros_like(state.h)
        diags = SplitDiags(
            uh=_z3, vh=_z3,
            uhtr=uhtr_accum if uhtr_accum is not None else _z3,
            vhtr=vhtr_accum if vhtr_accum is not None else _z3,
            truncs=jnp.zeros((), jnp.int32),
            eta_av=jnp.zeros_like(state.h[0]))
        _pre_extras = None
    else:
        if cfg.diabatic_first and do_thermo:
            state, split_state, tracers, _ex = thermo_and_ale(
                state, split_state, tracers, int_tide_en, sppt_pattern)
            _pre_extras = _ex
        else:
            _pre_extras = None

        # --- MEKE → VarMix → KHTH coefficient chain ---
        # the resolution function damps eddy parameterizations where the
        # deformation radius is resolved (calc_resolution_function,
        # MOM_lateral_mixing_coeffs.F90:214); MEKE feeds an eddy
        # diffusivity K_MEKE into KHTH (MOM_thickness_diffuse.F90:204)
        khth_2d = None
        res_fn = None
        rd_dx = None
        sn = None
        use_meke = cfg.use_meke and state.meke is not None
        if cfg.use_varmix:
            vm = calc_resolution_function(cfg.varmix, grid, vgrid,
                                          state.h, state.T, state.S, eos)
            res_fn = vm.res_fn
            rd_dx = vm.rd_dx
        need_sn = (cfg.use_varmix and cfg.varmix.khth_slope_cff > 0.0) \
            or (use_meke and (cfg.meke.geometric or cfg.meke.a_eady > 0.0))
        if need_sn:
            # Eady growth rate (calc_slope_functions) feeding the Visbeck
            # diffusivity and the MEKE length scales / GEOMETRIC closure
            hh = domain.fill_halos(state.h, width=1)
            tt = domain.fill_halos(state.T, width=1) \
                if state.T is not None else None
            ss = domain.fill_halos(state.S, width=1) \
                if state.S is not None else None
            sn = calc_eady_rate(cfg.varmix, grid, vgrid, hh, tt, ss, eos)
        if cfg.use_varmix and cfg.varmix.khth_slope_cff > 0.0:
            kh_vis = visbeck_kh(cfg.varmix, grid, sn)
            if kh_vis is not None:
                khth_2d = cfg.thickness_diffuse.khth + kh_vis
        if use_meke and cfg.meke_khth_fac > 0.0:
            base = khth_2d if khth_2d is not None \
                else cfg.thickness_diffuse.khth
            khth_2d = base + cfg.meke_khth_fac * meke_khth(
                cfg.meke, state.meke, sn=sn)
        # RESOLN_SCALED_KHTH damps the face coefficients with the
        # face-centered Res_fn (direct evaluation unless
        # INTERPOLATE_RES_FN; MOM_lateral_mixing_coeffs.F90:374-381)
        res_u = res_v = None
        if res_fn is not None and cfg.resoln_scaled_khth:
            res_u, res_v = vm.res_fn_u, vm.res_fn_v
            if khth_2d is None:
                khth_2d = cfg.thickness_diffuse.khth \
                    * jnp.ones_like(res_fn)

        # thickness diffusion / interface filter (THICKNESSDIFFUSE):
        # runs BEFORE the dynamics with THICKNESSDIFFUSE_FIRST
        # (MOM.F90:1157-1170), AFTER it otherwise (:1297-1307, the
        # reference default); layer transports are added into the
        # tracer-advection accumulators so T/S and passives ride the
        # GM/filter mass redistribution (the reference accumulates
        # uhD*dt into uhtr, MOM_thickness_diffuse.F90:602)
        def do_thickness_param(state):
            uh_param = vh_param = None
            if cfg.thickness_diffuse.khth > 0.0 or khth_2d is not None:
                h = domain.fill_halos(state.h, width=2)
                kh2 = domain.fill_halos(khth_2d, width=2) \
                    if khth_2d is not None else None
                gp_int = None
                if use_meke and state.T is not None and eos is not None:
                    # interface reduced gravities N²·Δz from the actual
                    # stratification, for the GM PE-release MEKE source
                    from mom6_tpu.diagnostics.wave_speed import \
                        brunt_vaisala2
                    tt, ss = domain.fill_halos((state.T, state.S),
                                               width=2)
                    n2 = brunt_vaisala2(vgrid, h, tt, ss, eos)
                    dz = 0.5 * (h[:-1] + h[1:])
                    zed = jnp.zeros_like(h[:1])
                    gp_int = jnp.concatenate([zed, n2 * dz, zed],
                                             axis=0)
                ru = rv = None
                if res_u is not None:
                    ru = domain.fill_halos(res_u, width=2, stagger="U")
                    rv = domain.fill_halos(res_v, width=2, stagger="V")
                td = thickness_diffuse(grid, vgrid, h, dt,
                                       cfg.thickness_diffuse,
                                       khth_2d=kh2,
                                       gprime_int=gp_int, res_u=ru,
                                       res_v=rv)
                state = state.replace(h=domain.fill_halos(td.h))
                uh_param, vh_param = dt * td.uhD, dt * td.vhD
                if use_meke:
                    # advance the prognostic eddy energy with the GM
                    # release as its source (step_forward_MEKE)
                    meke_e = domain.fill_halos(state.meke, width=1)
                    hsum = jnp.sum(h, axis=0) + 1e-30
                    u_bt = jnp.sum(0.5 * (h + _ip1_(h)) * state.u,
                                   axis=0) / hsum
                    v_bt = jnp.sum(0.5 * (h + _jp1_(h)) * state.v,
                                   axis=0) / hsum
                    meke_new = step_meke(cfg.meke, grid, meke_e, dt,
                                         gm_work=td.gm_work,
                                         rd_dx=rd_dx,
                                         sn=sn, u_bt=u_bt, v_bt=v_bt)
                    state = state.replace(
                        meke=domain.fill_halos(meke_new))
            elif use_meke:
                meke_e = domain.fill_halos(state.meke, width=1)
                meke_new = step_meke(cfg.meke, grid, meke_e, dt,
                                     rd_dx=rd_dx, sn=sn)
                state = state.replace(meke=domain.fill_halos(meke_new))
            if cfg.interface_filter.time_scale > 0.0:
                h = domain.fill_halos(state.h, width=2)
                hf, uhF, vhF = interface_filter(domain, grid, vgrid, h,
                                                dt, cfg.interface_filter)
                state = state.replace(h=domain.fill_halos(hf))
                uh_param = dt * uhF if uh_param is None \
                    else uh_param + dt * uhF
                vh_param = dt * vhF if vh_param is None \
                    else vh_param + dt * vhF
            return state, uh_param, vh_param

        if cfg.thickness_diffuse_first:
            state, uh_param, vh_param = do_thickness_param(state)
        else:
            uh_param = vh_param = None

        kh_scale = None
        if cfg.resoln_scaled_kh and res_fn is not None:
            kh_scale = domain.fill_halos(res_fn, width=2)
        kh_extra = None
        if use_meke and cfg.meke.viscosity_coeff_ku != 0.0:
            # MEKE-derived Laplacian viscosity Ku added inside
            # hor_visc (MEKE_VISCOSITY_COEFF_KU)
            from mom6_tpu.param.lateral.meke import (meke_ku,
                                                     meke_length_scales)
            lmix, _, _ = meke_length_scales(
                cfg.meke, grid, state.meke,
                jnp.maximum(grid.bathyT, cfg.meke.min_depth),
                rd_dx=rd_dx, sn=sn)
            kh_extra = domain.fill_halos(
                meke_ku(cfg.meke, state.meke, lmix=lmix), width=2)
        if cfg.split and cfg.split_rk2b:
            from mom6_tpu.core.dynamics_split_rk2b import step_dyn_split_rk2b
            state, split_state, diags = step_dyn_split_rk2b(
                domain, grid, vgrid, state, split_state, forces, dt,
                cfg.split_cfg, eos=eos, x_first=x_first, obc=obc, t=t,
                stoch_pattern=(sppt_pattern.get("sppt")
                               if isinstance(sppt_pattern, dict)
                               else sppt_pattern),
                kh_scale=kh_scale, kh_extra=kh_extra)
        elif cfg.split:
            kvs = None
            if kv_shear_prev is not None:
                # the diabatic phase wrote Kv_shear on the pre-ALE
                # grid; one-ring halo fill for the face averaging
                kvs = domain.fill_halos(kv_shear_prev, width=1)
            state, split_state, diags = step_dyn_split_rk2(
                domain, grid, vgrid, state, split_state, forces, dt,
                cfg.split_cfg, eos=eos, x_first=x_first, obc=obc, t=t,
                stoch_pattern=(sppt_pattern.get("sppt")
                               if isinstance(sppt_pattern, dict)
                               else sppt_pattern),
                kh_scale=kh_scale, kh_extra=kh_extra, kv_shear=kvs)
        else:
            state, diags = step_dyn_unsplit(
                domain, grid, vgrid, state, forces, dt, cfg.unsplit_cfg,
                eos=eos, t=t)

        if not cfg.thickness_diffuse_first:
            # the reference default: diffuse thickness right after the
            # dynamics, before the transports are consumed
            # (MOM.F90:1297-1307)
            state, uh_param, vh_param = do_thickness_param(state)

        # --- mixed-layer restratification (MOM_mixed_layer_restrat.F90):
        # submesoscale overturning transports applied to h after the
        # dynamics, riding into the tracer advection via uhtr (the
        # reference adds uhml into uhtr, mixedlayer_restrat :248) ---
        if cfg.use_mle and cfg.thermo and state.T is not None:
            hh, tt, ss = domain.fill_halos((state.h, state.T, state.S),
                                           width=1)
            mle = mixed_layer_restrat(cfg.mlrestrat, grid, vgrid, hh, dt,
                                      T=tt, S=ss, eos=eos, hml=mld_prev)
            state = state.replace(h=domain.fill_halos(mle.h))
            if uh_param is None:
                uh_param, vh_param = dt * mle.uhml, dt * mle.vhml
            else:
                uh_param = uh_param + dt * mle.uhml
                vh_param = vh_param + dt * mle.vhml

        # accumulate transports across the thermo interval (uhtr, MOM.F90)
        uhtr, vhtr = diags.uhtr, diags.vhtr
        if uh_param is not None:
            uhtr, vhtr = uhtr + uh_param, vhtr + vh_param
        if uhtr_accum is not None:
            uhtr, vhtr = uhtr_accum + uhtr, vhtr_accum + vhtr
        diags = diags._replace(uhtr=uhtr, vhtr=vhtr)
        if not do_thermo:
            if obc_reservoirs is not None:
                return state, split_state, tracers, diags, obc_reservoirs
            return state, split_state, tracers, diags

    # --- tracer transport (T/S ride the same accumulated transports) ---
    if thermo_only == "thermo":
        pass                       # phase 2b: tracers already moved
    elif cfg.thermo and state.T is not None:
        adv = {"T": state.T, "S": state.S}
        if tracers:
            adv.update(tracers)
        adv = domain.fill_halos(adv, width=2)
        if obc is not None and obc_reservoirs is not None:
            adv = obc.apply_tracer_reservoirs(adv, obc_reservoirs)
        he, uhtr, vhtr = domain.fill_halos(
            (state.h, diags.uhtr, diags.vhtr), width=2)
        if obc is not None:
            he, uhtr, vhtr = obc.keep_boundary(
                (state.h, diags.uhtr, diags.vhtr), (he, uhtr, vhtr))
        adv, _, adv_resid = advect_tracers(domain, grid, adv, he,
                                           uhtr, vhtr, cfg.tracer_adv,
                                           x_first=x_first)
        diags = diags._replace(adv_residual=adv_resid)
        if obc is not None and obc_reservoirs is not None:
            obc_reservoirs = obc.update_tracer_reservoirs(
                obc_reservoirs, adv, state.u, state.v, dt)
        # lateral tracer diffusion after advection (step_MOM_tracer_dyn
        # calls tracer_hordiff after advect_tracer, MOM.F90:1413;
        # epineutral Redi rotation when USE_NEUTRAL_DIFFUSION)
        if cfg.use_neutral and cfg.neutral.khtr > 0.0:
            adv, hh = domain.fill_halos((adv, state.h), width=2)
            adv = neutral_diffusion(domain, grid, vgrid, adv, hh,
                                    adv["T"], adv["S"], eos, dt,
                                    cfg.neutral)
        elif cfg.hordiff.khtr > 0.0 or (
                cfg.use_meke and state.meke is not None
                and cfg.meke_khtr_fac > 0.0) \
                or cfg.hordiff.khtr_slope_cff > 0.0:
            ktr2 = None
            tr_res_u = tr_res_v = None
            tr_add_u = tr_add_v = None
            if cfg.hordiff.khtr_slope_cff > 0.0:
                # KHTR_SLOPE_CFF: Visbeck addition cff·L²·SN at the
                # faces (MOM_tracer_hor_diff.F90:241)
                sn_tr = calc_eady_rate(cfg.varmix, grid, vgrid,
                                       domain.fill_halos(state.h),
                                       domain.fill_halos(state.T)
                                       if state.T is not None else None,
                                       domain.fill_halos(state.S)
                                       if state.S is not None else None,
                                       eos)
                sn_tr = domain.fill_halos(sn_tr, width=2)
                L2 = cfg.varmix.visbeck_l_scale ** 2 \
                    if cfg.varmix.visbeck_l_scale > 0.0 else grid.areaT
                cffL2sn = cfg.hordiff.khtr_slope_cff * L2 * sn_tr
                tr_add_u = 0.5 * (cffL2sn + _ip1_(cffL2sn))
                tr_add_v = 0.5 * (cffL2sn + _jp1_(cffL2sn))
            if cfg.resoln_scaled_khtr and cfg.use_varmix:
                # RESOLN_SCALED_KHTR: damp the tracer diffusivity
                # where the deformation radius is resolved via the
                # face-centered Res_fn (MOM_tracer_hor_diff.F90:439);
                # recomputed here so the PHASED_JIT tracer phase
                # stays self-contained
                # the reference averages the h-point Res_fn to faces
                # here (not the face-centered formula,
                # MOM_tracer_hor_diff.F90:245,261)
                vmr = calc_resolution_function(
                    cfg.varmix, grid, vgrid, state.h, state.T,
                    state.S, eos)
                rfh = domain.fill_halos(vmr.res_fn, width=2)
                tr_res_u = 0.5 * (rfh + _ip1_(rfh))
                tr_res_v = 0.5 * (rfh + _jp1_(rfh))
            if (cfg.use_meke and state.meke is not None
                    and cfg.meke_khtr_fac > 0.0):
                # MEKE_KHTR_FAC: KhTr gains a fraction of the
                # MEKE-derived diffusivity (tracer_hor_diff.F90:241)
                ktr2 = cfg.hordiff.khtr + cfg.meke_khtr_fac \
                    * meke_khth(cfg.meke, state.meke)
            if ktr2 is not None:
                ktr2 = domain.fill_halos(ktr2, width=1)
            adv, hh = domain.fill_halos((adv, state.h), width=1)
            rho_ml = None
            if cfg.hordiff.diffuse_ml_to_interior \
                    and cfg.hordiff.nkmb > 0 and eos is not None \
                    and "T" in adv:
                # coordinate density of the ML/buffer water for the
                # epipycnal pairing (tracer_epipycnal_ML_diff uses
                # tv%P_Ref coordinate densities, :845-855)
                rho_ml = eos.density(adv["T"][:cfg.hordiff.nkmb],
                                     adv["S"][:cfg.hordiff.nkmb],
                                     cfg.hordiff.p_ref)
            adv = tracer_hordiff(domain, grid, adv, hh, dt,
                                 cfg.hordiff, khtr_2d=ktr2,
                                 res_u=tr_res_u, res_v=tr_res_v,
                                 add_u=tr_add_u, add_v=tr_add_v,
                                 rho_ml=rho_ml, rlay=vgrid.Rlay)
        if cfg.use_hbd and mld_prev is not None:
            # near-boundary diffusion inside the boundary layer
            # (hor_bnd_diffusion, applied after tracer_hordiff as in
            # tracer_hor_diff's HBD call)
            from mom6_tpu.tracer.hor_bnd_diffusion import \
                hor_bnd_diffusion
            adv, hh, bldh = domain.fill_halos(
                (adv, state.h, mld_prev), width=1)
            adv = hor_bnd_diffusion(domain, grid, adv, hh, bldh, dt,
                                    cfg.hbd)
        state = state.replace(T=adv.pop("T"), S=adv.pop("S"))
        tracers = adv if adv else tracers
    elif tracers:
        tracers = domain.fill_halos(tracers, width=2)
        if obc is not None and obc_reservoirs is not None:
            tracers = obc.apply_tracer_reservoirs(tracers,
                                                  obc_reservoirs)
        he, uhtr, vhtr = domain.fill_halos(
            (state.h, diags.uhtr, diags.vhtr), width=2)
        if obc is not None:
            he, uhtr, vhtr = obc.keep_boundary(
                (state.h, diags.uhtr, diags.vhtr), (he, uhtr, vhtr))
        tracers, _, adv_resid = advect_tracers(domain, grid, tracers,
                                               he, uhtr, vhtr,
                                               cfg.tracer_adv,
                                               x_first=x_first)
        diags = diags._replace(adv_residual=adv_resid)
        if obc is not None and obc_reservoirs is not None:
            obc_reservoirs = obc.update_tracer_reservoirs(
                obc_reservoirs, tracers, state.u, state.v, dt)
        if cfg.hordiff.khtr > 0.0:
            tracers, hh = domain.fill_halos((tracers, state.h),
                                            width=1)
            tracers = tracer_hordiff(domain, grid, tracers, hh, dt,
                                     cfg.hordiff)

    if thermo_only == "tracers":
        # phase 2a ends here; thermo/ALE runs in its own executable
        if obc_reservoirs is not None:
            return state, split_state, tracers, diags, obc_reservoirs
        return state, split_state, tracers, diags

    if _pre_extras is not None:
        extras = _pre_extras
    else:
        state, split_state, tracers, extras = thermo_and_ale(
            state, split_state, tracers, int_tide_en, sppt_pattern)
    for _k, _v in extras.items():
        diags = diags._replace(**{_k: _v})

    if obc_reservoirs is not None:
        return state, split_state, tracers, diags, obc_reservoirs
    return state, split_state, tracers, diags
