"""Split RK2b time stepping — the restart-lean variant of the split
scheme.

Re-design of /root/reference/src/core/MOM_dynamics_split_RK2b.F90:279
step_MOM_dyn_split_RK2b.  Differences from RK2 (dynamics_split_rk2.py):

  * The PROGNOSTIC velocities are the time-filtered (barotropic-mean)
    velocities u_av/v_av — they live in ``State.u/v`` here.  The
    instantaneous velocities are reconstructed on the fly as
        u_inst = u_av - du_av_inst * visc_rem_u          (:642)
    from a single persistent 2D barotropic increment ``du_av_inst``
    (the Newton transport correction returned by the final continuity
    call, :981 du_cor).  This removes all 3D auxiliary velocity state:
    across an ALE regrid only u_av (the model velocity) needs
    remapping, and restarts carry one 2D pair instead of 3D u+u_av.

  * The predictor-stage Coriolis/KE terms use transports freshly
    diagnosed from continuity(u_av, v_av, h) at the step head (:488)
    rather than the previous corrector's uh/vh, so uh/vh do not
    persist either.

The sequencing below mirrors the reference: head continuity → PF(h) →
CorAd/hor_visc on u_av → visc_rem(dt) → reconstruct u_inst →
continuity(u_inst) for BT_cont anchoring → btstep → predictor
momentum/viscosity/continuity on dt_pred → corrector PF/CorAd/btstep →
full-dt momentum/viscosity → final continuity matching uhbtav which
yields both the new u_av and the new du_av_inst.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.barotropic import btstep
from mom6_tpu.core.continuity_ppm import continuity_ppm, set_up_bt_cont
from mom6_tpu.core.coriolis_adv import coriolis_adv
from mom6_tpu.core.pressure_force import pressure_force, interface_heights
from mom6_tpu.core.vert_friction import (vertvisc, vertvisc_coef,
                                         vertvisc_remnant, set_viscous_bbl,
                                         surface_ustar, vertvisc_limit_vel)
from mom6_tpu.core.dynamics_split_rk2 import SplitCfg, SplitDiags
from mom6_tpu.param.lateral.hor_visc import horizontal_viscosity
from mom6_tpu.parallel.domain import Domain

__all__ = ["SplitBDynState", "init_split_b_state", "step_dyn_split_rk2b"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplitBDynState:
    """Persistent auxiliary state of the RK2b scheme: the 2D
    filtered-minus-instantaneous barotropic velocity increments
    (register_restart_pair of du_av_inst/dv_av_inst, RK2b:1185) and
    the barotropic free surface."""
    du_av_inst: jnp.ndarray   # (nj, ni) at u faces
    dv_av_inst: jnp.ndarray   # (nj, ni) at v faces
    eta: jnp.ndarray          # free surface [m]


def init_split_b_state(domain: Domain, grid: Grid, vgrid: VerticalGrid,
                       state: State) -> SplitBDynState:
    """Cold-start auxiliary state: zero increments (u_inst == u_av)
    and the mass-consistent free surface."""
    e = interface_heights(vgrid, state.h, grid.bathyT)
    z2 = jnp.zeros_like(state.h[0])
    return SplitBDynState(du_av_inst=z2, dv_av_inst=z2, eta=e[0])


def step_dyn_split_rk2b(domain: Domain, grid: Grid, vgrid: VerticalGrid,
                        state: State, split: SplitBDynState,
                        forces: MechForcing, dt: float, cfg: SplitCfg,
                        eos=None, x_first: bool = True, obc=None,
                        t=None, stoch_pattern=None, kh_scale=None,
                       kh_extra=None,
                        ) -> tuple[State, SplitBDynState, SplitDiags]:
    """One RK2b dynamics step.  ``state.u/v`` are the filtered
    velocities (the reference's u_av); returns them updated along with
    the new increments/eta and the step's transports."""
    if obc is not None:
        if domain.tripolar_n:
            raise ValueError("OBC segments on a tripolar domain are "
                             "not supported")

        def fill(f, **kw):
            return obc.extend(domain.fill_halos(f, **kw))
    else:
        fill = domain.fill_halos
    if domain.tripolar_n:
        def fill_uv(uu, vv, width=None):
            return domain.fill_vector_halos(uu, vv, width=width)

        def fill_face_scalars(fu, fv, width=None):
            return (domain.fill_halos(fu, width, stagger="U"),
                    domain.fill_halos(fv, width, stagger="V"))
    else:
        def fill_uv(uu, vv, width=None):
            return fill((uu, vv), width=width)

        fill_face_scalars = fill_uv
    rho0 = vgrid.Rho0
    T, S = state.T, state.S

    u_av, v_av = fill_uv(state.u, state.v)
    h = fill(state.h)
    eta = fill(split.eta)
    du_i = domain.fill_halos(split.du_av_inst, stagger="U") \
        if domain.tripolar_n else fill(split.du_av_inst)
    dv_i = domain.fill_halos(split.dv_av_inst, stagger="V") \
        if domain.tripolar_n else fill(split.dv_av_inst)

    e_tidal = None
    if cfg.tides_fn is not None:
        e_tidal = cfg.tides_fn(eta, 0.0 if t is None else t)
    varT_mult = None
    if cfg.stoch_eos_a != 0.0 and stoch_pattern is not None:
        varT_mult = jnp.exp(cfg.stoch_eos_a * stoch_pattern)

    # head continuity: transports/thicknesses for the predictor's
    # Coriolis terms (RK2b:488)
    res0 = continuity_ppm(grid, vgrid, u_av, v_av, h, dt, cfg.continuity,
                          x_first=x_first)
    hp0 = fill(res0.h)
    uh, vh = fill_uv(res0.uh, res0.vh, width=2)
    h_av = 0.5 * (h + hp0)

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
    pf = pressure_force(grid, vgrid, h, T, S, eos, p_atm=forces.p_surf,
                        cfg=cfg.pressure, e_tidal=e_tidal,
                        varT_mult=varT_mult)
    pbce, eta_pf = pf.pbce, pf.eta_pf
    dv_visc = horizontal_viscosity(grid, u_av, v_av, h_av, cfg.horvisc,
                                   kh_scale=kh_scale, kh_extra=kh_extra,
                                   obc=obc, **gme_kw)
    ca = coriolis_adv(grid, u_av, v_av, h_av, uh, vh, cfg.coriolis)
    u_bc_accel = (ca.CAu + pf.PFu) + dv_visc.diffu
    v_bc_accel = (ca.CAv + pf.PFv) + dv_visc.diffv

    # BBL properties and full-dt viscous remnant for the
    # instantaneous-velocity reconstruction (RK2b:598-642)
    bbl = set_viscous_bbl(grid, u_av, v_av, h, cfg.vertvisc,
                          vgrid, T=T, S=S, eos=eos)
    ustar = surface_ustar(grid, rho0, forces) \
        if cfg.vertvisc.visc_ml_mode else None
    coefs = vertvisc_coef(grid, u_av, v_av, h, cfg=cfg.vertvisc, bbl=bbl,
                          ustar=ustar)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt)
    visc_rem_u, visc_rem_v = fill_face_scalars(visc_rem_u, visc_rem_v)

    u_inst = grid.mask2dCu * (u_av - du_i[None] * visc_rem_u)
    v_inst = grid.mask2dCv * (v_av - dv_i[None] * visc_rem_v)
    u_inst, v_inst = fill_uv(u_inst, v_inst)

    # eta mass-source correction (bt_mass_source, RK2b:628)
    eta_cor = grid.mask2dT * ((jnp.sum(h, axis=0) - grid.bathyT) - eta)

    bt_cont = None
    uhbt_in = vhbt_in = None
    if cfg.barotropic.use_bt_cont and obc is None:
        bt_cont = set_up_bt_cont(grid, vgrid, u_inst, v_inst, h, dt,
                                 cfg.continuity, visc_rem_u, visc_rem_v)
        # anchor transports from continuity(u_inst) (RK2b:652)
        res_in = continuity_ppm(grid, vgrid, u_inst, v_inst, h, dt,
                                cfg.continuity, x_first=x_first)
        uhbt_in = jnp.sum(res_in.uh, axis=0)
        vhbt_in = jnp.sum(res_in.vh, axis=0)

    bt = btstep(domain, grid, vgrid, u_inst, v_inst, eta, h,
                u_bc_accel, v_bc_accel, pbce, u_av, v_av, dt,
                cfg.barotropic, visc_rem_u, visc_rem_v,
                forces.taux, forces.tauy, eta_pf=eta_pf, obc=obc,
                bt_cont=bt_cont, eta_cor=eta_cor,
                uhbt_in=uhbt_in, vhbt_in=vhbt_in)

    dt_pred = dt * cfg.be
    up = grid.mask2dCu * (u_inst
                          + dt_pred * (u_bc_accel + bt.accel_layer_u))
    vp = grid.mask2dCv * (v_inst
                          + dt_pred * (v_bc_accel + bt.accel_layer_v))

    coefs = vertvisc_coef(grid, up, vp, h, cfg=cfg.vertvisc, bbl=bbl,
                          ustar=ustar)
    up, vp = vertvisc(grid, up, vp, h, coefs, dt_pred,
                      forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt_pred)
    up, vp = fill_uv(up, vp)
    visc_rem_u, visc_rem_v = fill_face_scalars(visc_rem_u, visc_rem_v)

    res = continuity_ppm(grid, vgrid, up, vp, h, dt, cfg.continuity,
                         uhbt=bt.uhbtav, vhbt=bt.vhbtav,
                         visc_rem_u=visc_rem_u, visc_rem_v=visc_rem_v,
                         x_first=x_first)
    hp = fill(res.h)
    uh, vh = fill_uv(res.uh, res.vh)
    u_av_p, v_av_p = fill_uv(res.u_cor, res.v_cor)
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
    dv_visc = horizontal_viscosity(grid, u_av_p, v_av_p, h_av,
                                   cfg.horvisc, kh_scale=kh_scale, kh_extra=kh_extra,
                                   obc=obc, **gme_kw)
    ca = coriolis_adv(grid, u_av_p, v_av_p, h_av, uh, vh, cfg.coriolis)
    u_bc_accel = (ca.CAu + pf.PFu) + dv_visc.diffu
    v_bc_accel = (ca.CAv + pf.PFv) + dv_visc.diffv

    if cfg.barotropic.use_bt_cont:
        uhbt_in = jnp.sum(uh, axis=0)
        vhbt_in = jnp.sum(vh, axis=0)
    bt = btstep(domain, grid, vgrid, u_inst, v_inst, eta, h,
                u_bc_accel, v_bc_accel, pbce, u_av_p, v_av_p, dt,
                cfg.barotropic, visc_rem_u, visc_rem_v,
                forces.taux, forces.tauy, eta_pf=eta_pf, obc=obc,
                bt_cont=bt_cont, eta_cor=eta_cor,
                uhbt_in=uhbt_in, vhbt_in=vhbt_in)
    eta_new = bt.eta

    u_new = grid.mask2dCu * (u_inst
                             + dt * (u_bc_accel + bt.accel_layer_u))
    v_new = grid.mask2dCv * (v_inst
                             + dt * (v_bc_accel + bt.accel_layer_v))

    coefs = vertvisc_coef(grid, u_new, v_new, h, cfg=cfg.vertvisc,
                          bbl=bbl, ustar=ustar)
    u_new, v_new = vertvisc(grid, u_new, v_new, h, coefs, dt,
                            forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    visc_rem_u, visc_rem_v = vertvisc_remnant(grid, coefs, dt)
    u_new, v_new, truncs = vertvisc_limit_vel(grid, u_new, v_new, dt,
                                              cfg.vertvisc)
    u_new, v_new = fill_uv(u_new, v_new)
    visc_rem_u, visc_rem_v = fill_face_scalars(visc_rem_u, visc_rem_v)

    # final continuity: h(n+1), transports, the new filtered
    # velocities AND the new filtered-vs-instantaneous increments
    # (RK2b:979-981, du_cor/dv_cor outputs)
    res = continuity_ppm(grid, vgrid, u_new, v_new, h, dt,
                         cfg.continuity,
                         uhbt=bt.uhbtav, vhbt=bt.vhbtav,
                         visc_rem_u=visc_rem_u, visc_rem_v=visc_rem_v,
                         x_first=x_first)
    h_new = fill(res.h)
    uh, vh = fill_uv(res.uh, res.vh)
    u_av_new, v_av_new = res.u_cor, res.v_cor
    if obc is not None:
        # Orlanski radiation of the filtered velocities at open faces
        u_av_new = obc.radiate_u(u_av_new, u_av, dt=dt)
        v_av_new = obc.radiate_v(v_av_new, v_av, dt=dt)
    u_av_new, v_av_new = fill_uv(u_av_new, v_av_new)

    new_state = state.replace(u=u_av_new, v=v_av_new, h=h_new)
    new_split = SplitBDynState(du_av_inst=res.du_cor,
                               dv_av_inst=res.dv_cor, eta=eta_new)
    diags = SplitDiags(uh=uh, vh=vh, uhtr=dt * uh, vhtr=dt * vh,
                       truncs=truncs, eta_av=bt.eta_av)
    return new_state, new_split, diags
