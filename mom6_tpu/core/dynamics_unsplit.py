"""Unsplit time stepping of the baroclinic dynamics.

Re-design of /root/reference/src/core/MOM_dynamics_unsplit.F90:258
(3-stage quasi-3rd-order Matsuno-like scheme; the reference's tc1.a
path) and MOM_dynamics_unsplit_RK2.F90 (2-stage; tc1.b).  No
barotropic/baroclinic splitting: the free surface is resolved by the
(short) dynamic time step.

Stage structure of the RK3 scheme (dt_pred = dt/3):
  1. hp = h advanced dt/2 with (u,v); accelerations on h_av=(h+hp)/2;
     up = u + (dt/3)(PF+CA); implicit vertical viscosity on up.
  2. h_av advanced another dt/2 with (up,vp); accelerations on the
     mid thickness; upp = u + (dt/2)(PF+CA); vertical viscosity.
  3. h advanced to n+1 from hp with (upp,vpp); final accelerations on
     (h(n+1)+hp)/2; u(n+1) = u + dt(PF+CA); vertical viscosity.

Halo refreshes (Domain.fill_halos) sit exactly where the reference
places pass_var/pass_vector calls.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.continuity_ppm import (ContinuityCfg, continuity_ppm)
from mom6_tpu.core.coriolis_adv import CoriolisCfg, coriolis_adv
from mom6_tpu.core.pressure_force import (PressureForceCfg, pressure_force)
from mom6_tpu.core.vert_friction import (VertViscCfg, vertvisc, vertvisc_coef,
                                         surface_ustar,
                                         set_viscous_bbl,
                                         vertvisc_limit_vel)
from mom6_tpu.param.lateral.hor_visc import HorViscCfg, horizontal_viscosity
from mom6_tpu.parallel.domain import Domain

__all__ = ["UnsplitCfg", "step_dyn_unsplit", "DynDiags"]


@dataclasses.dataclass(frozen=True)
class UnsplitCfg:
    continuity: ContinuityCfg = ContinuityCfg()
    coriolis: CoriolisCfg = CoriolisCfg()
    pressure: PressureForceCfg = PressureForceCfg()
    vertvisc: VertViscCfg = VertViscCfg()
    horvisc: HorViscCfg = HorViscCfg()
    scheme: str = "RK3"            # RK3 (Matsuno-like) or RK2
    # pure fn (eta, t) -> tidal + SAL geopotential anomaly [m]
    tides_fn: object = None


class DynDiags(NamedTuple):
    uh: jnp.ndarray
    vh: jnp.ndarray
    uhtr: jnp.ndarray     # accumulated transports for tracer advection
    vhtr: jnp.ndarray
    truncs: jnp.ndarray
    # column frazil heat deficit [J m-2] from the diabatic phase (an
    # ice-model flux; filled by the orchestrator when FRAZIL=True)
    frazil: Optional[jnp.ndarray] = None
    # boundary-layer / mixed-layer depth [m] from the diabatic phase
    # (KPP BLD or ePBL MLD; consumed by mixed-layer restrat next step)
    mld: Optional[jnp.ndarray] = None
    # largest un-swept tracer-advection face CFL (see SplitDiags)
    adv_residual: Optional[jnp.ndarray] = None
    # internal-tide energy density (n_angle, njh, nih) [J m-2],
    # carried across steps when INTERNAL_TIDES is on
    int_tide_en: Optional[jnp.ndarray] = None
    # SPPT AR(1) pattern carried across steps when DO_SPPT is on
    sppt_pattern: Optional[jnp.ndarray] = None
    # shear-driven Kv carry (see SplitDiags.kv_shear); the unsplit
    # core does not consume it, but the orchestrator threads it so
    # the diabatic->next-step plumbing is core-agnostic
    kv_shear: Optional[jnp.ndarray] = None


def step_dyn_unsplit(domain: Domain, grid: Grid, vgrid: VerticalGrid,
                     state: State, forces: MechForcing, dt: float,
                     cfg: UnsplitCfg, eos=None,
                     t=None) -> tuple[State, DynDiags]:
    u, v, h, T, S = state.u, state.v, state.h, state.T, state.S
    fill = domain.fill_halos
    if domain.tripolar_n:
        def fill_uv(uu, vv, width=None):
            return domain.fill_vector_halos(uu, vv, width=width)
    else:
        def fill_uv(uu, vv, width=None):
            return fill((uu, vv), width=width)
    rho0 = vgrid.Rho0

    e_tidal = None
    if cfg.tides_fn is not None:
        eta0 = jnp.sum(h, axis=0) - grid.bathyT
        e_tidal = cfg.tides_fn(eta0, 0.0 if t is None else t)

    def accel(uu, vv, h_av, uh, vh):
        ca = coriolis_adv(grid, uu, vv, h_av, uh, vh, cfg.coriolis)
        pf = pressure_force(grid, vgrid, h_av, T, S, eos,
                            p_atm=forces.p_surf, cfg=cfg.pressure,
                            e_tidal=e_tidal)
        return ca.CAu + pf.PFu, ca.CAv + pf.PFv

    u, v = fill_uv(u, v)
    h = fill(h)
    if T is not None:
        T, S = fill((T, S))

    dv = horizontal_viscosity(grid, u, v, h, cfg.horvisc)

    # --- stage 1 ---
    res1 = continuity_ppm(grid, vgrid, u, v, h, 0.5 * dt, cfg.continuity)
    hp = fill(res1.h)
    uh, vh = fill_uv(res1.uh, res1.vh)
    h_av = 0.5 * (h + hp)
    u = (u + dt * dv.diffu * grid.mask2dCu)
    v = (v + dt * dv.diffv * grid.mask2dCv)
    u, v = fill_uv(u, v)
    uhtr = 0.5 * dt * uh
    vhtr = 0.5 * dt * vh

    dt_pred = dt / 3.0 if cfg.scheme == "RK3" else 0.5 * dt
    CAu, CAv = accel(u, v, h_av, uh, vh)
    up = grid.mask2dCu * (u + dt_pred * CAu)
    vp = grid.mask2dCv * (v + dt_pred * CAv)

    bbl = set_viscous_bbl(grid, u, v, h, cfg.vertvisc, vgrid)
    ustar = surface_ustar(grid, rho0, forces) \
        if cfg.vertvisc.visc_ml_mode else None
    coefs = vertvisc_coef(grid, up, vp, h_av, cfg=cfg.vertvisc, bbl=bbl,
                          ustar=ustar)
    up, vp = vertvisc(grid, up, vp, h_av, coefs, dt_pred,
                      forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    up, vp = fill_uv(up, vp)

    if cfg.scheme == "RK3":
        # --- stage 2 ---
        res2 = continuity_ppm(grid, vgrid, up, vp, hp, 0.5 * dt,
                              cfg.continuity)
        h_av2 = fill(res2.h)
        uh, vh = fill_uv(res2.uh, res2.vh)
        h_av = 0.5 * (hp + h_av2)
        CAu, CAv = accel(up, vp, h_av, uh, vh)
        upp = grid.mask2dCu * (u + 0.5 * dt * CAu)
        vpp = grid.mask2dCv * (v + 0.5 * dt * CAv)
        coefs = vertvisc_coef(grid, upp, vpp, hp, cfg=cfg.vertvisc, bbl=bbl,
                          ustar=ustar)
        upp, vpp = vertvisc(grid, upp, vpp, hp, coefs, 0.5 * dt,
                            forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
        upp, vpp = fill_uv(upp, vpp)
    else:
        upp, vpp = up, vp

    # --- final stage ---
    res3 = continuity_ppm(grid, vgrid, upp, vpp, hp, 0.5 * dt,
                          cfg.continuity)
    h_new = fill(res3.h)
    uh, vh = fill_uv(res3.uh, res3.vh)
    uhtr = uhtr + 0.5 * dt * uh
    vhtr = vhtr + 0.5 * dt * vh
    h_av = 0.5 * (h_new + hp)

    CAu, CAv = accel(upp, vpp, h_av, uh, vh)
    u_new = grid.mask2dCu * (u + dt * CAu)
    v_new = grid.mask2dCv * (v + dt * CAv)
    coefs = vertvisc_coef(grid, u_new, v_new, h_av, cfg=cfg.vertvisc, bbl=bbl,
                          ustar=ustar)
    u_new, v_new = vertvisc(grid, u_new, v_new, h_av, coefs, dt,
                            forces.taux, forces.tauy, rho0,
                      direct_stress=cfg.vertvisc.direct_stress,
                      hmix_stress=cfg.vertvisc.hmix_stress)
    u_new, v_new, truncs = vertvisc_limit_vel(grid, u_new, v_new, dt,
                                              cfg.vertvisc)
    u_new, v_new = fill_uv(u_new, v_new)

    new_state = state.replace(u=u_new, v=v_new, h=h_new)
    return new_state, DynDiags(uh=uh, vh=vh, uhtr=uhtr, vhtr=vhtr,
                               truncs=truncs)
