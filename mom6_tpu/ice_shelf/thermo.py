"""Ice-shelf basal melt thermodynamics (the three-equation model).

Re-design of /root/reference/src/ice_shelf/MOM_ice_shelf.F90
shelf_calc_flux (the Holland & Jenkins 1999 three-equation
formulation):

  freezing point:  T_b = λ₁ S_b + λ₂ + λ₃ p_b
  heat balance:    ρ_w c_w γ_T (T_w − T_b) = m L_f (+ ice conduction)
  salt balance:    ρ_w γ_S (S_w − S_b) = m S_b

Eliminating T_b gives a quadratic in S_b solved in closed form per
column (branch-free over the shelf mask); outputs the melt rate m
[kg m-2 s-1] and the heat/freshwater fluxes to the ocean.  The SSA
ice-sheet dynamics (MOM_ice_shelf_dynamics.F90) lives in
mom6_tpu/ice_shelf/dynamics.py; the shelf geometry (thickness →
pressure draft) is carried here.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["IceShelfCfg", "three_equation_melt", "shelf_draft"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class IceShelfCfg:
    lambda1: float = -0.0573      # dTf/dS [degC ppt-1]
    lambda2: float = 0.0832       # Tf offset [degC]
    lambda3: float = -7.53e-8     # dTf/dp [degC Pa-1]
    gamma_t: float = 1e-4         # thermal exchange velocity [m s-1]
    gamma_s: float = 5.05e-7      # haline exchange velocity [m s-1]
    rho_ice: float = 918.0
    latent_heat: float = 3.34e5   # L_f [J kg-1]
    cp_w: float = 3974.0          # seawater heat capacity [J kg-1 K-1]
    rho0: float = 1035.0
    utide: float = 0.0            # background tidal rms for drag-based
                                  # exchange velocities (planned)


class MeltResult(NamedTuple):
    melt: jnp.ndarray          # melt rate [kg m-2 s-1] (+ = melting)
    t_b: jnp.ndarray           # boundary-layer temperature [degC]
    s_b: jnp.ndarray           # boundary-layer salinity [ppt]
    heat_flux: jnp.ndarray     # into the ocean [W m-2] (negative=cooling)
    fw_flux: jnp.ndarray       # freshwater into ocean [kg m-2 s-1]


def shelf_draft(cfg: IceShelfCfg, h_shelf):
    """Ice draft [m] and basal pressure [Pa] from shelf thickness."""
    draft = (cfg.rho_ice / cfg.rho0) * h_shelf
    p_base = cfg.rho_ice * 9.8 * h_shelf
    return draft, p_base


def three_equation_melt(cfg: IceShelfCfg, t_w, s_w, p_b,
                        shelf_mask=None) -> MeltResult:
    """Solve the three-equation system.

    t_w/s_w: ocean mixed-layer temperature/salinity under the shelf;
    p_b: pressure at the ice base [Pa]."""
    gt, gs = cfg.gamma_t, cfg.gamma_s
    l1, l2, l3 = cfg.lambda1, cfg.lambda2, cfg.lambda3
    c_w, Lf = cfg.cp_w, cfg.latent_heat

    # melt m' [m s-1 of seawater-equivalent]: from the two balances,
    #   m' = γ_S (S_w − S_b)/S_b
    #   c_w γ_T (T_w − (λ1 S_b + λ2 + λ3 p)) = m' L_f.
    # Substituting and multiplying by S_b gives a S_b² + b S_b + c = 0:
    #   a = −c_w γ_T λ1  (> 0 since λ1 < 0)
    #   b = c_w γ_T (T_w − λ2 − λ3 p) + γ_S L_f
    #   c = −γ_S L_f S_w (< 0)
    # → the roots straddle zero; the physical one is the + branch.
    a = -gt * c_w * l1
    b = gt * c_w * (t_w - l2 - l3 * p_b) + gs * Lf
    c = -gs * Lf * s_w
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    s_b = (-b + jnp.sqrt(disc)) / (2.0 * jnp.where(
        jnp.abs(a) > _EPS, a, _EPS))
    s_b = jnp.where(jnp.abs(a) > _EPS, s_b,
                    -c / jnp.where(jnp.abs(b) > _EPS, b, _EPS))
    s_b = jnp.clip(s_b, 1e-3, 2.0 * jnp.maximum(s_w, 1.0))
    t_b = l1 * s_b + l2 + l3 * p_b

    m_prime = gs * (s_w - s_b) / jnp.maximum(s_b, _EPS)   # [m s-1]
    melt = cfg.rho0 * m_prime                             # [kg m-2 s-1]
    heat = -cfg.rho0 * c_w * gt * (t_w - t_b)             # ocean loses
    fw = melt
    if shelf_mask is not None:
        melt = melt * shelf_mask
        heat = heat * shelf_mask
        fw = fw * shelf_mask
        t_b = jnp.where(shelf_mask > 0, t_b, t_w)
        s_b = jnp.where(shelf_mask > 0, s_b, s_w)
    return MeltResult(melt=melt, t_b=t_b, s_b=s_b, heat_flux=heat,
                      fw_flux=fw)
