"""K-profile parameterization (KPP) surface boundary layer mixing.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_CVMix_KPP.F90 (wrapping CVMix KPP, Large, McWilliams & Doney 1994)
at CVMix fidelity:

* Monin-Obukhov stability functions φ_m/φ_s with the stable (1+5ζ),
  unstable ((1−16ζ)^{-1/4} / (1−16ζ)^{-1/2}) and convective-limit
  ((a−cζ)^{-1/3}) branches of LMD94 appendix B, giving the turbulent
  velocity scales w_m = κu*/φ_m(ζ), w_s = κu*/φ_s(ζ);
* the surface-layer cap: in unstable forcing w is evaluated at
  σ = min(σ, ε) with ε = 0.1 (LMD94 eq. 13);
* bulk Richardson number Ri_b(d) = d·(B_r − B(d)) /
  (|V_r − V(d)|² + V_t²(d)) with the LMD94 eq. 23 unresolved
  turbulent shear V_t²(d) = C_v·(−β_T)^{1/2}/(Ri_c κ²)·d·N·w_s
  (KPP_compute_BLD, MOM_CVMix_KPP.F90:964);
* boundary-layer depth by LINEAR INTERPOLATION of Ri_b to the
  Ri_crit crossing between layer centers (CVMix_kpp_compute_OBL_depth),
  not the first whole cell past the criterion;
* cubic shape function G(σ) = σ(1−σ)² ("SimpleShapes" matching, the
  MOM6 default MATCH_TECHNIQUE) and the nonlocal transport shape
  C_s·G(σ) under destabilizing forcing (:1628).

Everything is branch-free column math over the full (njh, nih) block;
branches of the stability functions are where-chains.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1

__all__ = ["KPPCfg", "kpp_coefficients", "KPPResult"]

_EPS = 1e-14
_VON_KARMAN = 0.4

# LMD94 appendix B constants
_ZETA_M = -0.2        # transition to the convective branch for momentum
_ZETA_S = -1.0        # ... for scalars
_A_M = 1.26
_C_M = 8.38
_A_S = -28.86
_C_S = 98.96
_SURF_EPS = 0.1       # surface-layer fraction ε


@dataclasses.dataclass(frozen=True)
class KPPCfg:
    ri_crit: float = 0.3          # RI_CRIT bulk Richardson criterion
    min_bld: float = 1.0          # minimum boundary layer depth [m]
    cv: float = 1.7               # C_v unresolved-shear coefficient
                                  # (CVMix default ~1.5-2.1)
    beta_t: float = -0.2          # entrainment ratio β_T (LMD94)
    min_vt2: float = 1e-10        # V_t² floor [m2 s-2]
    enhance_entrain: float = 1.0
    nonlocal_transport: bool = True   # NLT (CS = 6.32 G(σ))
    kv_prandtl: float = 1.0       # Kv = Pr·Kd within the BL


class KPPResult(NamedTuple):
    kd_int: jnp.ndarray       # (nk+1, ...) boundary-layer diffusivity
    kv_int: jnp.ndarray
    bld: jnp.ndarray          # (...,) boundary layer depth [m]
    nonlocal_shape: jnp.ndarray   # (nk+1, ...) nonlocal transport shape


def _phi_m(zeta):
    stable = 1.0 + 5.0 * zeta
    x = jnp.maximum(1.0 - 16.0 * zeta, 1e-12)
    unstable = x ** -0.25
    conv = (_A_M - _C_M * zeta) ** (-1.0 / 3.0)
    return jnp.where(zeta >= 0.0, stable,
                     jnp.where(zeta >= _ZETA_M, unstable, conv))


def _phi_s(zeta):
    stable = 1.0 + 5.0 * zeta
    x = jnp.maximum(1.0 - 16.0 * zeta, 1e-12)
    unstable = x ** -0.5
    conv = (_A_S - _C_S * zeta) ** (-1.0 / 3.0)
    return jnp.where(zeta >= 0.0, stable,
                     jnp.where(zeta >= _ZETA_S, unstable, conv))


def _w_scales(sigma, bld, ustar, buoy_flux):
    """(w_m, w_s) turbulent velocity scales at normalized depth sigma.

    buoy_flux: destabilizing-positive surface buoyancy flux [m2 s-3].
    Monin-Obukhov length L = u*³/(κ B); ζ = σ·bld/L.  In unstable
    forcing the scales freeze at the surface-layer value σ=ε."""
    u3 = jnp.maximum(ustar, 1e-10) ** 3
    # destabilizing (B>0) → negative ζ by convention here
    sig_eff = jnp.where(buoy_flux > 0.0,
                        jnp.minimum(sigma, _SURF_EPS), sigma)
    zeta = -sig_eff * bld * _VON_KARMAN * buoy_flux / u3
    w_m = _VON_KARMAN * jnp.maximum(ustar, 1e-10) / _phi_m(zeta)
    w_s = _VON_KARMAN * jnp.maximum(ustar, 1e-10) / _phi_s(zeta)
    return w_m, w_s


def kpp_coefficients(cfg: KPPCfg, u, v, h, T, S, eos, rho0, g,
                     ustar=None, buoy_flux=None):
    """Compute KPP boundary-layer diffusivities.

    ustar: surface friction velocity [m s-1] (njh, nih); buoy_flux:
    surface buoyancy flux [m2 s-3] (positive = destabilizing)."""
    nk = h.shape[0]
    if ustar is None:
        ustar = jnp.zeros_like(h[0])
    if buoy_flux is None:
        buoy_flux = jnp.zeros_like(h[0])

    # depths of layer centers (positive down) and interfaces
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    z_mid = 0.5 * (z_int[:-1] + z_int[1:])

    # buoyancy at layer centers from surface-referenced potential
    # density (the bulk Ri must not see compressibility)
    if T is not None and eos is not None:
        rho = eos.density(T, S, jnp.zeros_like(T))
    else:
        rho = jnp.broadcast_to(jnp.zeros_like(h[0])[None], h.shape) + rho0
    buoy = -g * (rho - rho0) / rho0           # larger = lighter

    # N at layer centers from the local vertical density gradient
    dz_c = 0.5 * (h[:-1] + h[1:]) + _EPS
    n2_c = jnp.maximum((buoy[:-1] - buoy[1:]) / dz_c, 0.0)
    n_mid = jnp.sqrt(jnp.concatenate([n2_c, n2_c[-1:]], axis=0))

    # velocity at h points
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))

    # surface reference values: the mean over the surface layer
    # (approximated by the top model layer, as CVMix does for coarse
    # near-surface resolution)
    db = buoy[0:1] - buoy                                # (nk, ...)
    du2 = ((u_h - u_h[0:1]) ** 2 + (v_h - v_h[0:1]) ** 2)

    # LMD94 eq. 23 unresolved turbulent shear, using w_s evaluated at
    # each candidate depth with that depth as the trial BLD
    _, ws_cand = _w_scales(jnp.ones_like(z_mid), z_mid, ustar[None],
                           buoy_flux[None])
    cv_fac = cfg.cv * jnp.sqrt(-cfg.beta_t / (_C_S * _SURF_EPS)) \
        / (cfg.ri_crit * _VON_KARMAN ** 2)
    vt2 = jnp.maximum(cv_fac * z_mid * n_mid * ws_cand, cfg.min_vt2)

    ri_b = db * z_mid / jnp.maximum(du2 + vt2, _EPS)

    # BLD: linear interpolation of Ri_b to the Ri_crit crossing
    # between successive layer centers (CVMix_kpp_compute_OBL_depth)
    exceeded = ri_b >= cfg.ri_crit                       # (nk, ...)
    first = exceeded & ~jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(ri_b[:1]),
                         exceeded[:-1].astype(ri_b.dtype)], axis=0),
        axis=0).astype(bool)
    ri_up = jnp.concatenate([jnp.zeros_like(ri_b[:1]), ri_b[:-1]],
                            axis=0)
    z_up = jnp.concatenate([jnp.zeros_like(z_mid[:1]), z_mid[:-1]],
                           axis=0)
    frac = jnp.clip((cfg.ri_crit - ri_up)
                    / jnp.where(jnp.abs(ri_b - ri_up) > _EPS,
                                ri_b - ri_up, _EPS), 0.0, 1.0)
    z_cross = z_up + frac * (z_mid - z_up)
    bld = jnp.sum(jnp.where(first, z_cross, 0.0), axis=0)
    none_exceeded = ~jnp.any(exceeded, axis=0)
    bld = jnp.where(none_exceeded, z_int[-1], bld)
    bld = jnp.clip(bld, cfg.min_bld, z_int[-1])

    # velocity scales and cubic shape at interfaces
    sigma = jnp.clip(z_int / jnp.maximum(bld[None], _EPS), 0.0, 1.0)
    w_m, w_s = _w_scales(sigma, bld[None], ustar[None],
                         buoy_flux[None])

    Gs = sigma * (1.0 - sigma) ** 2
    kd = bld[None] * w_s * Gs * cfg.enhance_entrain
    kv = bld[None] * w_m * Gs * cfg.kv_prandtl
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    kv = kv.at[0].set(0.0).at[-1].set(0.0)

    # nonlocal transport shape (CS shape for destabilizing forcing)
    if cfg.nonlocal_transport:
        nl = jnp.where(buoy_flux[None] > 0.0, Gs * 6.32739901508, 0.0)
        nl = nl.at[0].set(0.0)
    else:
        nl = jnp.zeros_like(kd)

    return KPPResult(kd_int=kd, kv_int=kv, bld=bld, nonlocal_shape=nl)
