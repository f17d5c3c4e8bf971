"""Shear-driven mixing via a TKE/kappa equilibrium iteration.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_kappa_shear.F90 (Jackson, Hallberg & Legg 2008): the coupled
steady-state equations for turbulent kinetic energy Q and diffusivity
κ at interfaces,

  production  P = κ S²,  buoyancy sink B = κ N²,
  dissipation ε = Q^{3/2}/l_d with l_d from the JHL length scale,
  κ = c·l²·√Q with the stability function,

solved by a fixed-count damped Picard iteration per column (the
reference integrates an unsteady pair to steady state; the fixed-point
of the same balance is iterated here, branch-free over all columns).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mom6_tpu.param.vertical.shear_mixing import richardson_number

__all__ = ["KappaShearCfg", "kappa_shear_coeffs"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class KappaShearCfg:
    rino_crit: float = 0.25       # RINO_CRIT critical Ri
    shearmix_rate: float = 0.089  # SHEARMIX_RATE nondim rate
    max_rino_it: int = 10         # MAX_RINO_IT iteration count
    kappa_0: float = 1e-7         # seed/background kappa [m2 s-1]
    kd_max: float = 0.1
    tke_bg: float = 1e-10


def kappa_shear_coeffs(cfg: KappaShearCfg, u, v, h, n2):
    """κ at interior interfaces (nk-1, ...) from the JHL balance."""
    from mom6_tpu.parallel.stencil import im1, jm1
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))
    dz = 0.5 * (h[:-1] + h[1:]) + _EPS
    du = (u_h[1:] - u_h[:-1]) / dz
    dv = (v_h[1:] - v_h[:-1]) / dz
    s2 = du * du + dv * dv
    n2p = jnp.maximum(n2, 0.0)

    # distance from boundaries sets the JHL length scale l = κ0-style
    z_int = jnp.cumsum(h, axis=0)[:-1]
    htot = jnp.sum(h, axis=0)[None]
    l_b = z_int * (htot - z_int) / jnp.maximum(htot, _EPS)  # parabolic

    # supercriticality factor: mixing only where Ri < Ri_crit
    ri = n2p / jnp.maximum(s2, _EPS)
    f_ri = jnp.clip(1.0 - ri / cfg.rino_crit, 0.0, 1.0)

    kappa = jnp.full_like(s2, cfg.kappa_0)
    for _ in range(cfg.max_rino_it):
        # TKE balance: P − B = ε → Q = (l_d (κS² − κN²))^{2/3}
        prod = kappa * jnp.maximum(s2 - n2p, 0.0)
        q = jnp.maximum((l_b * prod) ** (2.0 / 3.0), cfg.tke_bg)
        kappa_new = cfg.shearmix_rate * l_b * jnp.sqrt(q) * f_ri
        kappa = 0.5 * (kappa + jnp.minimum(kappa_new, cfg.kd_max))
    return jnp.minimum(kappa * f_ri, cfg.kd_max)
