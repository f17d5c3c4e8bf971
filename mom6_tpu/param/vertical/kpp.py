"""K-profile parameterization (KPP) surface boundary layer mixing.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_CVMix_KPP.F90 (wrapping CVMix KPP, Large et al. 1994):

* boundary-layer depth from the bulk Richardson number criterion
  Ri_b(z) = (B_sfc − B(z)) z / (|ΔU(z)|² + U_t²)   with BLD where
  Ri_b first exceeds Ri_crit (KPP_compute_BLD, :964);
* K-profile within the boundary layer K(σ) = h_bl · w_s · G(σ) with
  the cubic shape G(σ) = σ(1−σ)², and the turbulent velocity scale
  w_s from the surface friction velocity and convective scaling;
* optional nonlocal transport term for surface-destabilizing buoyancy
  fluxes (returned as a shape profile, :1628).

Everything is branch-free column math over the full (njh, nih) block;
the BLD search is a dense masked-min over interfaces.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1

__all__ = ["KPPCfg", "kpp_coefficients", "KPPResult"]

_EPS = 1e-14
_VON_KARMAN = 0.4


@dataclasses.dataclass(frozen=True)
class KPPCfg:
    ri_crit: float = 0.3          # RI_CRIT bulk Richardson criterion
    min_bld: float = 1.0          # minimum boundary layer depth [m]
    ut2_bg: float = 1e-4          # background unresolved shear U_t² [m2 s-2]
    c_s: float = 98.96            # convective vel scale constant
    enhance_entrain: float = 1.0
    nonlocal_transport: bool = True   # NLT_SHAPE


class KPPResult(NamedTuple):
    kd_int: jnp.ndarray       # (nk+1, ...) boundary-layer diffusivity
    kv_int: jnp.ndarray
    bld: jnp.ndarray          # (...,) boundary layer depth [m]
    nonlocal_shape: jnp.ndarray   # (nk+1, ...) nonlocal transport shape


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

    # velocity at h points
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))

    # bulk Richardson number wrt the surface layer (layer 0)
    db = buoy[0:1] - buoy                                # (nk, ...)
    du2 = ((u_h - u_h[0:1]) ** 2 + (v_h - v_h[0:1]) ** 2)
    # unresolved turbulent shear: U_t² ~ c ws N z (simplified with bg)
    ut2 = cfg.ut2_bg + 0.1 * ustar[None] * jnp.sqrt(
        jnp.maximum(db * z_mid, 0.0))
    ri_b = db * z_mid / jnp.maximum(du2 + ut2, _EPS)

    # BLD: shallowest depth where Ri_b ≥ Ri_crit (masked min)
    exceeded = ri_b >= cfg.ri_crit
    z_cand = jnp.where(exceeded, z_mid, z_int[-1:])
    bld = jnp.minimum(jnp.min(z_cand, axis=0), z_int[-1])
    bld = jnp.maximum(bld, cfg.min_bld)

    # turbulent velocity scale w_s at interfaces
    sigma = jnp.clip(z_int / jnp.maximum(bld[None], _EPS), 0.0, 1.0)
    w_star3 = jnp.maximum(buoy_flux, 0.0) * bld            # convective
    ws = (_VON_KARMAN
          * (ustar[None] ** 3
             + cfg.c_s * _VON_KARMAN * sigma
             * w_star3[None]) ** (1.0 / 3.0))

    # cubic shape function G(σ) = σ(1−σ)²
    Gs = sigma * (1.0 - sigma) ** 2
    kd = bld[None] * ws * Gs
    kd = kd.at[0].set(0.0).at[-1].set(0.0)

    # nonlocal transport shape (CS shape for destabilizing forcing)
    if cfg.nonlocal_transport:
        nl = jnp.where(buoy_flux[None] > 0.0, Gs * 6.32739901508, 0.0)
        nl = nl.at[0].set(0.0)
    else:
        nl = jnp.zeros_like(kd)

    return KPPResult(kd_int=kd, kv_int=kd, bld=bld, nonlocal_shape=nl)
