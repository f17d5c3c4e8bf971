"""Convective and double-diffusive mixing.

Re-designs of /root/reference/src/parameterizations/vertical/
MOM_CVMix_conv.F90 (enhanced diffusivity where the column is statically
unstable, CVMix convection) and MOM_CVMix_ddiff.F90 (salt-fingering /
diffusive-convection regimes from the density ratio, Large et al. 1994
§4c).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["ConvectionCfg", "convection_coeffs",
           "DoubleDiffusionCfg", "ddiff_coeffs"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class ConvectionCfg:
    kd_conv: float = 1.0          # KD_CONV convective diffusivity [m2 s-1]
    bv_sqr_conv: float = 0.0      # N² threshold (≤ this → convecting)


def convection_coeffs(cfg: ConvectionCfg, n2):
    """Kd at interior interfaces: kd_conv where N² below threshold."""
    return jnp.where(n2 <= cfg.bv_sqr_conv, cfg.kd_conv, 0.0)


@dataclasses.dataclass(frozen=True)
class DoubleDiffusionCfg:
    max_salt_kd: float = 1e-4     # max salt-fingering Kd [m2 s-1]
    r_rho0: float = 1.9           # salt-finger cutoff density ratio
    mol_diff: float = 1.5e-6      # molecular diffusivity [m2 s-1]


def ddiff_coeffs(cfg: DoubleDiffusionCfg, T, S, p_int, eos):
    """(kd_T, kd_S) at interior interfaces from the density ratio
    R_rho = alpha dT/dz / (beta dS/dz) (Large et al. 1994)."""
    T_i = 0.5 * (T[:-1] + T[1:])
    S_i = 0.5 * (S[:-1] + S[1:])
    dRdT, dRdS = eos.density_derivs(T_i, S_i, p_int)
    aTz = -dRdT * (T[:-1] - T[1:])     # alpha * dT (upward positive)
    bSz = dRdS * (S[:-1] - S[1:])
    r_rho = aTz / jnp.where(jnp.abs(bSz) > _EPS, bSz, _EPS)

    # salt fingering: warm salty over cool fresh (aTz>0, bSz>0, 1<R<R0)
    finger = (aTz > 0) & (bSz > 0) & (r_rho > 1.0) & (r_rho < cfg.r_rho0)
    fac = jnp.clip(1.0 - (r_rho - 1.0) / (cfg.r_rho0 - 1.0), 0.0, 1.0)
    kd_s_f = cfg.max_salt_kd * fac ** 3
    kd_t_f = 0.7 * kd_s_f

    # diffusive convection: cool fresh over warm salty (0 < R < 1)
    dc = (aTz < 0) & (bSz < 0) & (r_rho > 0.0) & (r_rho < 1.0)
    kd_t_d = cfg.mol_diff * 0.909 * jnp.exp(
        4.6 * jnp.exp(-0.54 * (1.0 / jnp.maximum(r_rho, _EPS) - 1.0)))
    fac_s = jnp.where(r_rho >= 0.5,
                      (1.85 - 0.85 / jnp.maximum(r_rho, _EPS)) * r_rho,
                      0.15 * r_rho)
    kd_s_d = kd_t_d * fac_s

    kd_T = jnp.where(finger, kd_t_f, 0.0) + jnp.where(dc, kd_t_d, 0.0)
    kd_S = jnp.where(finger, kd_s_f, 0.0) + jnp.where(dc, kd_s_d, 0.0)
    return kd_T, kd_S
