"""Shear-driven mixing: the Jackson-Hallberg-Legg (2008) scheme.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_kappa_shear.F90 (Calculate_kappa_shear :115, find_kappa_tke
:1300): the coupled steady-state equations for turbulent kinetic
energy Q and diffusivity κ at interfaces,

  TKE:    d/dz[(κ̄+κ₀) dQ/dz] + κ(S² − N²) + κ₀S²
              = (Q − q₀)·sqrt(c_N²N² + c_S²S²)
  kappa:  d²κ/dz² + K_src − κ/L_d² = 0,
          K_src = 2Λ√S²·(Ri_c S² − N²)/(Ri_c S² + C_f N²)  (Ri < Ri_c)
          1/L_d² = (N²/λ² + f²)/Q + 1/L_bdry²,
          L_bdry the doubled harmonic-mean distance to the boundaries

solved per column.  Where the reference drives the unsteady pair to
steady state with a Newton solver over a hexadiagonal system, this
build alternates the two LINEAR tridiagonal subproblems (block
Gauss-Seidel) a fixed number of times — the same fixed point, with
static control flow and lax.scan Thomas solves shared across every
column of the domain at once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["KappaShearCfg", "kappa_shear_coeffs"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class KappaShearCfg:
    rino_crit: float = 0.25       # RINO_CRIT
    # thickness floor standing in for the reference's massless-layer
    # elimination (kappa_shear_column merges layers thinner than
    # dz_massless before solving); keeps S², Idz and the Thomas
    # pivots finite when ALE layers vanish
    dz_min: float = 0.01          # [m]
    shearmix_rate: float = 0.089  # SHEARMIX_RATE (Lambda)
    fri_curvature: float = -0.97  # FRI_CURVATURE
    c_n: float = 0.24             # TKE_N_DECAY_CONST
    c_s: float = 0.14             # TKE_SHEAR_DECAY_CONST
    lam: float = 0.82             # KAPPA_SHEAR_LAMBDA
    # outer Gauss-Seidel sweeps (MAX_RINO_IT).  The damped alternation
    # converges geometrically (~x4 per 2 sweeps); 24 sweeps land
    # within 1e-6 relative of the fixed point across a stratification/
    # shear/rotation sweep (tests/test_kappa_convergence.py), the
    # tolerance class of the reference's Newton-to-convergence solve
    # (MOM_kappa_shear.F90:1300).
    max_rino_it: int = 24
    kappa_0: float = 1e-7         # KD_SMOOTH seed/background [m2 s-1]
    kd_max: float = 1.0           # KAPPA_SHEAR_MAX [m2 s-1]
    tke_bg: float = 0.0           # TKE_BACKGROUND [m2 s-2]
    tke_min: float = 1e-12


def _thomas(lo, dg, up, rhs):
    def fwd(carry, row):
        cp, dp_ = carry
        l, d, u_, b = row
        inv = 1.0 / (d - l * cp)
        return (u_ * inv, (b - l * dp_) * inv), (u_ * inv,
                                                 (b - l * dp_) * inv)

    z = jnp.zeros_like(rhs[0])
    _, (cps, dps) = jax.lax.scan(fwd, (z, z), (lo, dg, up, rhs))

    def bwd(carry, row):
        cp, dp_ = row
        x = dp_ - cp * carry
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return xs


def kappa_shear_coeffs(cfg: KappaShearCfg, u, v, h, n2, f2=None):
    """κ at interior interfaces (nk-1, ...) from the JHL steady
    balance.  u/v at faces; h layer thicknesses; n2 at interior
    interfaces; f2 optional squared Coriolis at h points."""
    from mom6_tpu.parallel.stencil import im1, jm1
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))
    hf = jnp.maximum(h, cfg.dz_min)
    dzi = 0.5 * (hf[:-1] + hf[1:])            # around interfaces
    du = (u_h[1:] - u_h[:-1]) / dzi
    dv = (v_h[1:] - v_h[:-1]) / dzi
    s2 = du * du + dv * dv
    n2p = jnp.maximum(n2, 0.0)
    if f2 is None:
        f2 = jnp.zeros_like(s2[0])

    # kappa source where Ri < Ri_crit (find_kappa_tke :1389)
    ric = cfg.rino_crit
    k_src = jnp.where(
        n2p < ric * s2,
        (2.0 * cfg.shearmix_rate * jnp.sqrt(s2))
        * ((ric * s2 - n2p)
           / jnp.maximum(ric * s2 + cfg.fri_curvature * n2p, _EPS)),
        0.0)
    tke_decay = jnp.sqrt(cfg.c_n ** 2 * n2p + cfg.c_s ** 2 * s2) \
        + _EPS

    # boundary length scale: 1/L² = (zt+zb)²/(zt zb)²  (:797)
    z_t = jnp.cumsum(hf, axis=0)[:-1] + _EPS  # depth of interfaces
    htot = jnp.sum(hf, axis=0)[None]
    z_b = jnp.maximum(htot - z_t, _EPS)
    i_l2_bdry = ((z_t + z_b) ** 2) / ((z_t * z_b) ** 2)

    # layer couplings between adjacent interior interfaces (layers
    # 2..nk-1; the half-layers beyond the end interfaces carry the
    # no-flux condition)
    h_mid = hf[1:-1]                          # (nk-2, ...)
    idz = 1.0 / h_mid
    ilam2 = 1.0 / cfg.lam ** 2
    q0 = cfg.tke_bg

    kappa = jnp.full_like(s2, cfg.kappa_0)
    # cold-start TKE from the mixing-length estimate Q ~ (lambda L S)²
    # so the first kappa solve sees a physical decay length (the
    # reference warm-starts from the previous step's kappa/K_Q)
    q = jnp.maximum(cfg.lam ** 2 * s2 / i_l2_bdry, cfg.tke_min)
    zrow = jnp.zeros_like(s2[:1])
    lo_k = jnp.concatenate([zrow, -idz], axis=0)
    up_k = jnp.concatenate([-idz, zrow], axis=0)

    def sweep(_, carry):
        kappa, q = carry
        # --- kappa tridiagonal given Q ---
        i_ld2 = (n2p * ilam2 + f2[None]) / q + i_l2_bdry
        dg_k = dzi * i_ld2 - lo_k - up_k
        kappa_new = jnp.clip(_thomas(lo_k, dg_k, up_k, dzi * k_src),
                             0.0, cfg.kd_max)
        # damped update: the undamped Q↔kappa alternation can
        # oscillate where the TKE feedback is strong (the reference's
        # Newton solver treats the coupling implicitly)
        kappa = 0.5 * (kappa + kappa_new)

        # --- TKE tridiagonal given kappa ---
        aq = (0.5 * (kappa[:-1] + kappa[1:]) + cfg.kappa_0) * idz
        lo = jnp.concatenate([zrow, -aq], axis=0)
        up = jnp.concatenate([-aq, zrow], axis=0)
        dg = dzi * tke_decay - lo - up
        rhs = dzi * (kappa * (s2 - n2p) + cfg.kappa_0 * s2
                     + q0 * tke_decay)
        q = jnp.maximum(_thomas(lo, dg, up, rhs), cfg.tke_min)
        return kappa, q

    kappa, q = jax.lax.fori_loop(0, cfg.max_rino_it, sweep, (kappa, q))
    # diffusivities below kappa_trunc = 0.01*kappa_0 round to zero
    # (the reference's KAPPA_TRUNCATE default)
    kappa = jnp.where(kappa < 0.01 * cfg.kappa_0, 0.0, kappa)
    return jnp.clip(kappa, 0.0, cfg.kd_max)
