"""Shear-driven vertical mixing.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_CVMix_shear.F90 (wrapping CVMix's LMD94/PP81 schemes): gradient
Richardson-number-dependent interior diffusivities,

  LMD94 (Large et al. 1994):  Kd = Kd0 * (1 − min(Ri/Ri0, 1)²)³,  Ri>0
  PP81  (Pacanowski & Philander 1981):  ν = ν0/(1+a Ri)^n,
                                        Kd = ν/(1+a Ri)

with Ri from the resolved shear and N².  (The iterated
Jackson-Hallberg-Legg kappa-shear solver of MOM_kappa_shear.F90 is a
planned follow-on sharing this interface.)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1

__all__ = ["ShearMixingCfg", "shear_mixing_coeffs", "richardson_number"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class ShearMixingCfg:
    scheme: str = "LMD94"         # LMD94 | PP81 | NONE
    nu_zero: float = 5e-3         # NU_ZERO: max interior shear diff [m2 s-1]
    ri_zero: float = 0.8          # RI_ZERO: LMD94 cutoff Ri
    kpp_exp: float = 3.0          # KPP_EXP
    pp_alpha: float = 5.0         # PP81 alpha
    pp_exp: float = 2.0           # PP81 exponent n


def richardson_number(u, v, h, n2):
    """Gradient Ri at interior interfaces from h-point-averaged shear."""
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))
    dz = 0.5 * (h[:-1] + h[1:]) + _EPS
    du = (u_h[1:] - u_h[:-1]) / dz
    dv = (v_h[1:] - v_h[:-1]) / dz
    s2 = du * du + dv * dv
    return n2 / jnp.maximum(s2, _EPS)


def shear_mixing_coeffs(cfg: ShearMixingCfg, u, v, h, n2):
    """Kd at interior interfaces (nk-1, ...) from the Ri closure."""
    if cfg.scheme.upper() == "NONE":
        return jnp.zeros_like(h[1:])
    ri = richardson_number(u, v, h, n2)
    if cfg.scheme.upper() == "LMD94":
        frac = jnp.clip(ri / cfg.ri_zero, 0.0, 1.0)
        kd = cfg.nu_zero * (1.0 - frac * frac) ** cfg.kpp_exp
        return jnp.where(ri < 0.0, cfg.nu_zero, kd)
    if cfg.scheme.upper() == "PP81":
        denom = (1.0 + cfg.pp_alpha * jnp.maximum(ri, 0.0))
        nu = cfg.nu_zero / denom ** cfg.pp_exp
        return nu / denom
    raise ValueError(f"Unknown shear mixing scheme '{cfg.scheme}'")
