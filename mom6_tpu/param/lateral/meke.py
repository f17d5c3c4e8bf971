"""Mesoscale Eddy Kinetic Energy (MEKE) budget.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_MEKE.F90: a prognostic 2D budget of parameterized sub-grid eddy
energy,

  dE/dt = γ_src·(GM work + frictional work) − γ_damp·λ·E
          + ∇·(K_E ∇E)

whose equilibrium feeds an eddy diffusivity
K_MEKE = γ_K · √(2 E) · L_mix used to scale KHTH/KH (MEKE_KH).
Bottom-drag damping λ = c_drag·√(2E+U_bt²)/H_bot.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["MEKECfg", "step_meke", "meke_khth"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class MEKECfg:
    frcoeff: float = 0.1        # MEKE_FRCOEFF: fraction of friction work
    gmcoeff: float = 0.1        # MEKE_GMCOEFF: fraction of GM work
    cdrag: float = 0.003        # MEKE_CDRAG
    cb: float = 25.0            # MEKE_CB drag enhancement
    khmeke_fac: float = 1.0     # diffusion of MEKE itself uses K_MEKE
    ks_coeff: float = 1.0       # MEKE_KHCOEFF → K from E
    lmix: float = 1e4           # mixing length [m] (Rd-based later)
    min_depth: float = 10.0


def step_meke(cfg: MEKECfg, grid: Grid, meke_e, dt,
              gm_work=None, fric_work=None, depth_tot=None):
    """Advance E [m2 s-2] one step; returns new E.

    gm_work/fric_work: column-integrated energy conversion rates
    [W m-2]/rho0 → [m3 s-3]; depth_tot: water column depth [m]."""
    e = jnp.maximum(meke_e, 0.0)
    src = jnp.zeros_like(e)
    if gm_work is not None:
        src = src + cfg.gmcoeff * gm_work
    if fric_work is not None:
        src = src + cfg.frcoeff * fric_work
    depth = depth_tot if depth_tot is not None \
        else jnp.maximum(grid.bathyT, cfg.min_depth)
    src = src / jnp.maximum(depth, cfg.min_depth)

    # bottom drag damping rate λ
    ub = jnp.sqrt(2.0 * e + cfg.cb * cfg.cdrag ** 2)
    lam = cfg.cdrag * ub / jnp.maximum(depth, cfg.min_depth)

    # lateral diffusion of E with K_MEKE
    ke = meke_khth(cfg, e)
    def lap(f):
        fx = (ip1(f) - f) * grid.mask2dCu * grid.dyCu * grid.IdxCu
        fy = (jp1(f) - f) * grid.mask2dCv * grid.dxCv * grid.IdyCv
        return ((fx - im1(fx)) + (fy - jm1(fy))) * grid.IareaT
    diff = cfg.khmeke_fac * lap(ke * e)

    # semi-implicit damping for stability
    e_new = (e + dt * (src + diff)) / (1.0 + dt * lam)
    return jnp.maximum(e_new, 0.0) * grid.mask2dT


def meke_khth(cfg: MEKECfg, meke_e):
    """Eddy diffusivity from the MEKE field [m2 s-1]."""
    return cfg.ks_coeff * jnp.sqrt(2.0 * jnp.maximum(meke_e, 0.0)) \
        * cfg.lmix
