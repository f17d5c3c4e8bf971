"""Split barotropic/baroclinic RK2 time stepping — the production
dynamics path.

Re-design of /root/reference/src/core/MOM_dynamics_split_RK2.F90:289
step_MOM_dyn_split_RK2:

  PREDICTOR:  PF(h) → pbce/eta_PF; CorAd on the previous time-mean
  velocities (u_av) and transports; bc_accel = CA+PF+diffu;
  visc_rem(dt_pred); btstep → per-layer barotropic anomaly accel;
  up = u + be*dt*(bc_accel + accel_bt); implicit vertical viscosity;
  continuity over the FULL dt with the predictor's mean barotropic
  transports (Newton-matched), yielding hp and the new u_av.

  CORRECTOR:  PF(hp); hor_visc(u_av); CorAd(u_av on h_av=(h+hp)/2);
  btstep → final accel/eta/transports; u ← u + dt*(bc_accel+accel_bt);
  vertical viscosity; continuity(u, h→h(n+1), uhbtav) giving the next
  u_av; accumulate uhtr.

The split state (u_av, v_av, h_av, uh, vh, eta, diffu) persists across
steps exactly as the reference's control structure + restart fields do
(register_restarts_dyn_split_RK2, :1181).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.barotropic import BarotropicCfg, btstep
from mom6_tpu.core.continuity_ppm import (ContinuityCfg, continuity_ppm,
                                          set_up_bt_cont)
from mom6_tpu.core.coriolis_adv import CoriolisCfg, coriolis_adv
from mom6_tpu.core.pressure_force import (PressureForceCfg, pressure_force,
                                          interface_heights)
from mom6_tpu.core.vert_friction import (VertViscCfg, vertvisc,
                                         vertvisc_coef, vertvisc_remnant,
                                         set_viscous_bbl, surface_ustar,
                                         vertvisc_limit_vel)
from mom6_tpu.param.lateral.hor_visc import HorViscCfg, horizontal_viscosity
from mom6_tpu.parallel.domain import Domain

__all__ = ["SplitCfg", "SplitDynState", "init_split_state",
           "step_dyn_split_rk2"]


@dataclasses.dataclass(frozen=True)
class SplitCfg:
    be: float = 0.6                  # BE predictor bootstrap weight
    begw: float = 0.0                # BEGW gravity-wave weight
    continuity: ContinuityCfg = ContinuityCfg()
    coriolis: CoriolisCfg = CoriolisCfg()
    pressure: PressureForceCfg = PressureForceCfg()
    vertvisc: VertViscCfg = VertViscCfg()
    horvisc: HorViscCfg = HorViscCfg()
    barotropic: BarotropicCfg = BarotropicCfg()
    # pure fn (eta, t) -> tidal + SAL geopotential height anomaly [m]
    # (calc_tidal_forcing; None → no tides)
    tides_fn: Any = None
    # STOCH_EOS: exp(a*pattern) multiplier on the Stanley varT
    stoch_eos_a: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplitDynState:
    """Auxiliary prognostic state of the split scheme (persists across
    steps and through restarts)."""
    u_av: jnp.ndarray
    v_av: jnp.ndarray
    h_av: jnp.ndarray
    uh: jnp.ndarray
    vh: jnp.ndarray
    eta: jnp.ndarray          # free surface [m]
    # along-isopycnal stress-tensor divergence from the previous
    # corrector: the reference computes horizontal_viscosity ONCE per
    # step (corrector, MOM_dynamics_split_RK2.F90:860) and the
    # predictor reuses the stored diffu(u[n-1]) (:554-559, a restart
    # pair, :1262-1264)
    diffu: jnp.ndarray
    diffv: jnp.ndarray


class SplitDiags(NamedTuple):
    uh: jnp.ndarray
    vh: jnp.ndarray
    uhtr: jnp.ndarray
    vhtr: jnp.ndarray
    truncs: jnp.ndarray
    eta_av: jnp.ndarray
    # column frazil heat deficit [J m-2] from the diabatic phase (an
    # ice-model flux; filled by the orchestrator when FRAZIL=True)
    frazil: Optional[jnp.ndarray] = None
    # boundary-layer / mixed-layer depth [m] from the diabatic phase
    # (KPP BLD or ePBL MLD; consumed by mixed-layer restrat next step)
    mld: Optional[jnp.ndarray] = None
    # internal-tide energy density (n_angle, njh, nih) [J m-2],
    # carried across steps when INTERNAL_TIDES is on
    int_tide_en: Optional[jnp.ndarray] = None
    # SPPT AR(1) pattern carried across steps when DO_SPPT is on
    sppt_pattern: Optional[jnp.ndarray] = None
    # largest un-swept tracer-advection face transport as a fraction
    # of its upwind cell volume (0 when every sweep completed; the
    # reference's domore loop runs until this clears,
    # MOM_tracer_advect.F90:329)
    adv_residual: Optional[jnp.ndarray] = None
    # shear-driven interface viscosity Prandtl_turb*kappa from the
    # diabatic phase, consumed by the NEXT dynamics step's vertvisc
    # (the visc%Kv_shear carry, MOM_vert_friction.F90:1892)
    kv_shear: Optional[jnp.ndarray] = None


def init_split_state(domain: Domain, grid: Grid, vgrid: VerticalGrid,
                     state: State, horvisc_cfg: HorViscCfg | None = None,
                     ) -> SplitDynState:
    """Bootstrap the split auxiliary state from the instantaneous state
    (first step / cold restart).

    When ``horvisc_cfg`` is given, diffu/diffv are seeded with one
    horizontal_viscosity evaluation of the initial velocities, like the
    reference's query_initialized fallback
    (MOM_dynamics_split_RK2.F90:1543-1548); otherwise zeros."""
    e = interface_heights(vgrid, state.h, grid.bathyT)
    z = jnp.zeros_like(state.h)
    if horvisc_cfg is not None:
        u = domain.fill_halos(state.u)
        v = domain.fill_halos(state.v)
        h = domain.fill_halos(state.h)
        dv0 = horizontal_viscosity(grid, u, v, h, horvisc_cfg)
        diffu, diffv = dv0.diffu, dv0.diffv
    else:
        diffu = diffv = z
    return SplitDynState(u_av=state.u, v_av=state.v, h_av=state.h,
                         uh=z, vh=z, eta=e[0], diffu=diffu, diffv=diffv)


def step_dyn_split_rk2(domain: Domain, grid: Grid, vgrid: VerticalGrid,
                       state: State, split: SplitDynState,
                       forces: MechForcing, dt: float, cfg: SplitCfg,
                       eos=None, x_first: bool = True, obc=None,
                       t=None, stoch_pattern=None, kh_scale=None,
                       kh_extra=None, kv_shear=None,
                       ) -> tuple[State, SplitDynState, SplitDiags]:
    if obc is not None:
        if domain.tripolar_n:
            raise ValueError("OBC segments on a tripolar domain are "
                             "not supported")

        def fill(f, **kw):
            return obc.extend(domain.fill_halos(f, **kw))
    else:
        fill = domain.fill_halos
    if domain.tripolar_n:
        # vector pairs need the fold's stagger shifts and sign flips
        def fill_uv(uu, vv, width=None):
            return domain.fill_vector_halos(uu, vv, width=width)

        def fill_face_scalars(fu, fv, width=None):
            # positive face scalars (visc_rem): staggered but unsigned
            return (domain.fill_halos(fu, width, stagger="U"),
                    domain.fill_halos(fv, width, stagger="V"))
    else:
        def fill_uv(uu, vv, width=None):
            return fill((uu, vv), width=width)

        fill_face_scalars = fill_uv
    rho0 = vgrid.Rho0
    T, S = state.T, state.S

    # transport-matched continuity dispatch: the fused Pallas kernel
    # when enabled+supported (TPU backend, full PPM, no OBC/porous),
    # else the jnp path
    def run_continuity(uu, vv, hh, uhbt, vhbt, vr_u, vr_v):
        import os as _os
        interp = _os.environ.get("MOM6_PALLAS_INTERPRET") == "1"
        if (cfg.continuity.use_pallas_fused and obc is None
                and grid.porous_DavgU is None
                and (interp or jax.default_backend() == "tpu")):
            from mom6_tpu.core.continuity_pallas import (
                continuity_ppm_pallas, pallas_continuity_supported)
            if pallas_continuity_supported(cfg.continuity, hh.shape):
                return continuity_ppm_pallas(
                    grid, vgrid, uu, vv, hh, dt, cfg.continuity,
                    uhbt, vhbt, vr_u, vr_v, x_first=x_first,
                    interpret=interp)
        return continuity_ppm(grid, vgrid, uu, vv, hh, dt,
                              cfg.continuity, uhbt=uhbt, vhbt=vhbt,
                              visc_rem_u=vr_u, visc_rem_v=vr_v,
                              x_first=x_first)

    # grouped passes (do_group_pass analog): one fused exchange per
    # width class instead of one message per field; falls back to
    # per-leaf fills for OBC extension or tripolar sign/stagger cases
    use_group = obc is None and not domain.tripolar_n

    if use_group:
        ((u, v), h, (u_av, v_av), h_av, eta) = domain.fill_halos_group(
            ((state.u, state.v), state.h, (split.u_av, split.v_av),
             split.h_av, split.eta))
        uh, vh = domain.fill_halos_group((split.uh, split.vh), width=2)
    else:
        u, v = fill_uv(state.u, state.v)
        h = fill(state.h)
        u_av, v_av = fill_uv(split.u_av, split.v_av)
        h_av = fill(split.h_av)
        uh, vh = fill_uv(split.uh, split.vh, width=2)
        eta = fill(split.eta)

    # tidal + SAL geopotential anomaly, once per dynamics step from
    # the mass-consistent eta (calc_tidal_forcing cadence)
    e_tidal = None
    if cfg.tides_fn is not None:
        e_tidal = cfg.tides_fn(eta, 0.0 if t is None else t)

    varT_mult = None
    if cfg.stoch_eos_a != 0.0 and stoch_pattern is not None:
        varT_mult = jnp.exp(cfg.stoch_eos_a * stoch_pattern)

    # depth-mean velocities for the GME backscatter stress
    gme_kw = {}
    if cfg.horvisc.use_gme:
        from mom6_tpu.parallel.stencil import ip1 as _ip1, jp1 as _jp1
        h_u = 0.5 * (h_av + _ip1(h_av))
        h_v = 0.5 * (h_av + _jp1(h_av))
        gme_kw = dict(
            u_bt=jnp.sum(h_u * u_av, axis=0)
            / (jnp.sum(h_u, axis=0) + 1e-30),
            v_bt=jnp.sum(h_v * v_av, axis=0)
            / (jnp.sum(h_v, axis=0) + 1e-30),
            htot=jnp.sum(h_av, axis=0))

    # ---- PREDICTOR ----
    # diffu(u[n-1]) from the previous corrector (the reference computes
    # horizontal_viscosity once per step; :554-559 reuses the stored
    # fields here)
    diffu, diffv = fill_uv(split.diffu, split.diffv)
    pf = pressure_force(grid, vgrid, h, T, S, eos, p_atm=forces.p_surf,
                        cfg=cfg.pressure, e_tidal=e_tidal,
                        varT_mult=varT_mult)
    pbce, eta_pf = pf.pbce, pf.eta_pf
    ca = coriolis_adv(grid, u_av, v_av, h_av, uh, vh, cfg.coriolis)
    u_bc_accel = (ca.CAu + pf.PFu) + diffu
    v_bc_accel = (ca.CAv + pf.PFv) + diffv

    dt_pred = dt * cfg.be
    # shear-driven Kv from the previous diabatic phase (PRANDTL_TURB
    # * kappa_shear; the visc%Kv_shear the reference adds to Kv_tot,
    # MOM_vert_friction.F90:1892-1900)
    kv_int = None
    if kv_shear is not None:
        kv_int = cfg.vertvisc.kv + kv_shear
    # BBL piston/thickness once per step from the pre-step state
    # (the reference's set_viscous_BBL cadence)
    bbl = set_viscous_bbl(grid, u, v, h, cfg.vertvisc, vgrid,
                          T=T, S=S, eos=eos)
    ustar = surface_ustar(grid, rho0, forces) \
        if cfg.vertvisc.visc_ml_mode else None
    coefs = vertvisc_coef(grid, u_av, v_av, h, kv_int=kv_int,
                          cfg=cfg.vertvisc, bbl=bbl, ustar=ustar)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt_pred)

    # eta mass-source correction: the discrepancy between the layered
    # free surface Σh − D and the barotropic eta, fed back as a
    # per-substep source (bt_mass_source, MOM_barotropic.F90:4318)
    eta_cor = grid.mask2dT * ((jnp.sum(h, axis=0) - grid.bathyT)
                              - eta)
    # nonlinear BT_cont face-area curves from the layered continuity
    # solver (set_up_BT_cont, MOM_continuity_PPM.F90:757), shared by
    # both btstep calls of this step
    bt_cont = None
    uhbt_in = vhbt_in = None
    # with OBC segments the curve's residual anchoring is inconsistent
    # with the Flather-overridden boundary velocities (the reference
    # routes OBC faces through a dedicated BT_OBC structure,
    # MOM_barotropic.F90:3189 apply_velocity_OBCs); fall back to the
    # linearized Datu·ubt transports there until BT_OBC lands
    if cfg.barotropic.use_bt_cont and obc is None:
        import os as _os
        _interp = _os.environ.get("MOM6_PALLAS_INTERPRET") == "1"
        if (cfg.continuity.use_pallas_fused
                and grid.porous_DavgU is None
                and (_interp or jax.default_backend() == "tpu")):
            from mom6_tpu.core.continuity_pallas import (
                set_up_bt_cont_pallas, pallas_continuity_supported)
            if pallas_continuity_supported(cfg.continuity, h.shape):
                bt_cont = set_up_bt_cont_pallas(
                    grid, vgrid, u, v, h, dt, cfg.continuity,
                    visc_rem_u, visc_rem_v, interpret=_interp)
        if bt_cont is None:
            bt_cont = set_up_bt_cont(grid, vgrid, u, v, h, dt,
                                     cfg.continuity, visc_rem_u,
                                     visc_rem_v)
        uhbt_in = jnp.sum(uh, axis=0)
        vhbt_in = jnp.sum(vh, axis=0)

    bt = btstep(domain, grid, vgrid, u, v, eta, h,
                u_bc_accel, v_bc_accel, pbce, u_av, v_av, dt,
                cfg.barotropic, visc_rem_u, visc_rem_v,
                forces.taux, forces.tauy, eta_pf=eta_pf, obc=obc,
                bt_cont=bt_cont, eta_cor=eta_cor,
                uhbt_in=uhbt_in, vhbt_in=vhbt_in)

    up = grid.mask2dCu * (u + dt_pred * (u_bc_accel + bt.accel_layer_u))
    vp = grid.mask2dCv * (v + dt_pred * (v_bc_accel + bt.accel_layer_v))

    coefs = vertvisc_coef(grid, up, vp, h, kv_int=kv_int,
                          cfg=cfg.vertvisc, bbl=bbl, ustar=ustar)
    up, vp = vertvisc(grid, up, vp, h, coefs, dt_pred,
                      forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt_pred)
    if use_group:
        ((up, vp), (visc_rem_u, visc_rem_v)) = domain.fill_halos_group(
            ((up, vp), (visc_rem_u, visc_rem_v)))
    else:
        up, vp = fill_uv(up, vp)
        visc_rem_u, visc_rem_v = fill_face_scalars(visc_rem_u,
                                                   visc_rem_v)

    res = run_continuity(up, vp, h, bt.uhbtav, bt.vhbtav,
                         visc_rem_u, visc_rem_v)
    if use_group:
        (hp, (uh, vh), (u_av, v_av)) = domain.fill_halos_group(
            (res.h, (res.uh, res.vh), (res.u_cor, res.v_cor)))
    else:
        hp = fill(res.h)
        uh, vh = fill_uv(res.uh, res.vh)
        u_av, v_av = fill_uv(res.u_cor, res.v_cor)
    h_av = 0.5 * (h + hp)

    # ---- CORRECTOR ----
    if cfg.begw != 0.0:
        hp_pf = (1.0 - cfg.begw) * h + cfg.begw * hp
    else:
        hp_pf = hp
    pf = pressure_force(grid, vgrid, hp_pf, T, S, eos,
                        p_atm=forces.p_surf, cfg=cfg.pressure,
                        e_tidal=e_tidal, varT_mult=varT_mult)
    pbce, eta_pf = pf.pbce, pf.eta_pf
    dv = horizontal_viscosity(grid, u_av, v_av, h_av, cfg.horvisc,
                              kh_scale=kh_scale, kh_extra=kh_extra,
                              obc=obc, **gme_kw)
    diffu, diffv = dv.diffu, dv.diffv
    ca = coriolis_adv(grid, u_av, v_av, h_av, uh, vh, cfg.coriolis)
    u_bc_accel = (ca.CAu + pf.PFu) + diffu
    v_bc_accel = (ca.CAv + pf.PFv) + diffv

    if cfg.barotropic.use_bt_cont:
        # the corrector anchors the curves to the predictor transports
        uhbt_in = jnp.sum(uh, axis=0)
        vhbt_in = jnp.sum(vh, axis=0)
    bt = btstep(domain, grid, vgrid, u, v, eta, h,
                u_bc_accel, v_bc_accel, pbce, u_av, v_av, dt,
                cfg.barotropic, visc_rem_u, visc_rem_v,
                forces.taux, forces.tauy, eta_pf=eta_pf, obc=obc,
                bt_cont=bt_cont, eta_cor=eta_cor,
                uhbt_in=uhbt_in, vhbt_in=vhbt_in)
    eta_new = bt.eta

    u_new = grid.mask2dCu * (u + dt * (u_bc_accel + bt.accel_layer_u))
    v_new = grid.mask2dCv * (v + dt * (v_bc_accel + bt.accel_layer_v))

    coefs = vertvisc_coef(grid, u_new, v_new, h, kv_int=kv_int,
                          cfg=cfg.vertvisc, bbl=bbl, ustar=ustar)
    u_new, v_new = vertvisc(grid, u_new, v_new, h, coefs, dt,
                            forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt)
    u_new, v_new, truncs = vertvisc_limit_vel(grid, u_new, v_new, dt,
                                              cfg.vertvisc)
    if obc is not None:
        # Orlanski radiation of the baroclinic velocities at open faces
        u_new = obc.radiate_u(u_new, u, dt=dt)
        v_new = obc.radiate_v(v_new, v, dt=dt)
    if use_group:
        ((u_new, v_new), (visc_rem_u, visc_rem_v)) = \
            domain.fill_halos_group(((u_new, v_new),
                                     (visc_rem_u, visc_rem_v)))
    else:
        u_new, v_new = fill_uv(u_new, v_new)
        visc_rem_u, visc_rem_v = fill_face_scalars(visc_rem_u,
                                                   visc_rem_v)

    res = run_continuity(u_new, v_new, h, bt.uhbtav, bt.vhbtav,
                         visc_rem_u, visc_rem_v)
    if use_group:
        (h_new, (uh, vh), (u_av, v_av)) = domain.fill_halos_group(
            (res.h, (res.uh, res.vh), (res.u_cor, res.v_cor)))
    else:
        h_new = fill(res.h)
        uh, vh = fill_uv(res.uh, res.vh)
        u_av, v_av = fill_uv(res.u_cor, res.v_cor)
    h_av_new = 0.5 * (h + h_new)

    new_state = state.replace(u=u_new, v=v_new, h=h_new)
    new_split = SplitDynState(u_av=u_av, v_av=v_av, h_av=h_av_new,
                              uh=uh, vh=vh, eta=eta_new,
                              diffu=diffu, diffv=diffv)
    diags = SplitDiags(uh=uh, vh=vh, uhtr=dt * uh, vhtr=dt * vh,
                       truncs=truncs, eta_av=bt.eta_av)
    return new_state, new_split, diags
