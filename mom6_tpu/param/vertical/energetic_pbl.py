"""Energetically-constrained planetary boundary layer (ePBL).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_energetic_PBL.F90: the surface boundary layer deepens only as far
as the available mechanical + convective TKE can pay the potential
energy cost of mixing, yielding an MLD and a boundary-layer
diffusivity profile.

This branch-free formulation computes, per column,
  cost(K)  = PE(homogenized above z_K) − PE(current above z_K)
  avail(K) = mstar·ρ0·u*³·dt · exp(−z_K/decay) + convective release
and sets the mixing depth at the deepest interface where
cost ≤ avail; Kd follows the KPP-like shape within it.  (The
reference's per-column mstar iteration is replaced by a fixed mstar.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["EPBLCfg", "energetic_pbl"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class EPBLCfg:
    mstar: float = 1.2           # EPBL_MSTAR mechanical efficiency
    nstar: float = 0.2           # convective efficiency
    decay_scale: float = 50.0    # TKE penetration decay [m] (vstar-based
                                 # decay in the reference)
    min_mld: float = 1.0
    kd_max: float = 0.1          # cap on boundary-layer Kd [m2 s-1]


class EPBLResult(NamedTuple):
    kd_int: jnp.ndarray
    mld: jnp.ndarray


def energetic_pbl(cfg: EPBLCfg, h, T, S, eos, rho0, g, dt,
                  ustar=None, buoy_flux=None):
    """Returns boundary-layer Kd (nk+1, ...) and the MLD [m]."""
    nk = h.shape[0]
    if ustar is None:
        ustar = jnp.zeros_like(h[0])
    if buoy_flux is None:
        buoy_flux = jnp.zeros_like(h[0])

    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    z_mid = 0.5 * (z_int[:-1] + z_int[1:])
    # surface-referenced potential density: the PE cost of mixing
    # must not include compressibility
    if T is not None and eos is not None:
        rho = eos.density(T, S, jnp.zeros_like(T))
    else:
        rho = jnp.full_like(h, rho0)

    # PE cost of homogenizing everything above interface K (J m-2):
    # mixing moves the center of mass up by (z̄·Δρ terms); computed as
    # g·[ Σ ρ h z_mid − ρ̄ Σ h z_mid ] above each interface
    m_cum = jnp.cumsum(rho * h, axis=0)                  # mass/area
    hz_cum = jnp.cumsum(h * z_mid, axis=0)
    rhz_cum = jnp.cumsum(rho * h * z_mid, axis=0)
    h_cum = jnp.cumsum(h, axis=0)
    rho_bar = m_cum / (h_cum + _EPS)
    # z is DEPTH (positive down): PE = −g∫ρ z dz, so homogenizing a
    # stable column (dense deep → mixed up) costs
    # ΔPE = g·(Σρhz − ρ̄Σhz) ≥ 0
    cost = g * (rhz_cum - rho_bar * hz_cum)
    cost = jnp.maximum(cost, 0.0)                        # at K=1..nk

    # available TKE (J m-2) with depth decay; convective adds for
    # destabilizing buoyancy flux
    mech = cfg.mstar * rho0 * ustar[None] ** 3 * dt
    conv = cfg.nstar * rho0 * jnp.maximum(buoy_flux[None], 0.0) \
        * z_int[1:] * dt
    avail = mech * jnp.exp(-z_int[1:] / cfg.decay_scale) + conv

    affordable = cost <= avail
    z_aff = jnp.where(affordable, z_int[1:], 0.0)
    mld = jnp.maximum(jnp.max(z_aff, axis=0), cfg.min_mld)

    # Kd profile: KPP-like shape within the energetically-set MLD
    sigma = jnp.clip(z_int / jnp.maximum(mld[None], _EPS), 0.0, 1.0)
    ws = 0.4 * (ustar[None] ** 3
                + 10.0 * jnp.maximum(buoy_flux[None], 0.0)
                * mld[None]) ** (1.0 / 3.0)
    kd = jnp.minimum(mld[None] * ws * sigma * (1.0 - sigma) ** 2,
                     cfg.kd_max)
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return EPBLResult(kd_int=kd, mld=mld)
