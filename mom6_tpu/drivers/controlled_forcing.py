"""Integral-feedback controlled forcing.

Re-design of /root/reference/src/user/MOM_controlled_forcing.F90
(apply_ctrl_forcing :96, the CTRL_FORCE_INTEGRATED path): slowly
evolving ``heat_0`` / ``precip_0`` corrective fluxes driven by the
surface temperature and salinity anomalies, with a diffusive
smoothing of the correction fields:

    d(heat_0)/dt   = rate·(−λ_T·SST' + ∇·(L²∇heat_0))
    d(precip_0)/dt = rate·(+λ_S·SSS'/S̄ + ∇·(L²∇precip_0))

The corrections are added to the surface heat flux and precipitation
each thermo step.  The seasonal-cycle (num_cycle) machinery of the
reference is calendar bookkeeping around the same controller and is
not reproduced; CTRL_FORCE_NUM_CYCLE > 0 raises.

TPU framing: the controller state is a pair of 2D fields carried in
the step's forcing accumulator pytree; the update is a pure function
of (state fields, anomalies) evaluated inside jit — the 5-point
Laplacian is a stencil XLA fuses with the flux assembly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1, ip1, jp1

__all__ = ["CtrlForcingCfg", "apply_ctrl_forcing",
           "init_ctrl_state"]


@dataclasses.dataclass(frozen=True)
class CtrlForcingCfg:
    heat_int_rate: float = 0.0    # CTRL_FORCE_HEAT_INT_RATE [s-1]
    prec_int_rate: float = 0.0    # CTRL_FORCE_PREC_INT_RATE [s-1]
    smooth_len: float = 0.0       # CTRL_FORCE_SMOOTH_LENGTH [m]
    lam_heat: float = 0.0         # CTRL_FORCE_LAMDA_HEAT [W m-2 K-1]
    lam_prec: float = 0.0         # CTRL_FORCE_LAMDA_PREC [kg m-2 s-1]


def init_ctrl_state(shape2d):
    """Zero heat_0/precip_0 controller fields."""
    return {"heat_0": jnp.zeros(shape2d),
            "precip_0": jnp.zeros(shape2d)}


def _smooth_div(grid, f, len2):
    """∇·(L²∇f) with the reference's metric factors
    (apply_ctrl_forcing :151-160)."""
    coef_x = len2 * grid.dyCu * grid.IdxCu
    fx = coef_x * (f - ip1(f))
    coef_y = len2 * grid.dxCv * grid.IdyCv
    fy = coef_y * (f - jp1(f))
    return grid.IareaT * ((im1(fx) - fx) + (jm1(fy) - fy))


def apply_ctrl_forcing(cfg: CtrlForcingCfg, grid, ctrl, sst_anom,
                       sss_anom, sss_mean, dt):
    """One controller update; returns (new_ctrl, virt_heat [W m-2],
    virt_precip [kg m-2 s-1])."""
    len2 = cfg.smooth_len ** 2
    h0, p0 = ctrl["heat_0"], ctrl["precip_0"]
    h0 = h0 + (dt * cfg.heat_int_rate) * (
        -cfg.lam_heat * grid.mask2dT * sst_anom
        + _smooth_div(grid, h0, len2))
    p0 = p0 + (dt * cfg.prec_int_rate) * (
        cfg.lam_prec * grid.mask2dT
        * (sss_anom / jnp.maximum(sss_mean, 1e-12))
        + _smooth_div(grid, p0, len2))
    return {"heat_0": h0, "precip_0": p0}, h0, p0
