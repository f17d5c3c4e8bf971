"""Kraus-Turner-type bulk mixed layer (layer mode).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_bulk_mixed_layer.F90 (bulkmixedlayer, :259): the surface layer is
a bulk mixed layer that deepens by entraining interior layers when the
turbulent kinetic energy supplied by wind work (m* u*³ dt) and surface
buoyancy loss exceeds the potential-energy cost of lifting the denser
water into the mixed layer.  The reference tracks NKML sublayers,
detrainment into buffer layers, and many limiters; this version does
the energetic deepening + homogenization core with a single bulk
layer, branch-free: a cumulative PE-cost scan down the column selects
the fully-entrained layers and a fractional entrainment of the
marginal layer, then mass-weights T/S over the new mixed layer.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["BulkMixedLayerCfg", "bulk_mixed_layer"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class BulkMixedLayerCfg:
    mstar: float = 1.2           # wind-work efficiency (MSTAR)
    nstar: float = 0.15          # convective release efficiency (NSTAR)
    bulk_ri: float = 0.0         # unused placeholder for Ri limiting
    g: float = 9.81
    rho0: float = 1035.0
    h_min: float = 1e-3


def bulk_mixed_layer(cfg: BulkMixedLayerCfg, h, T, S, eos, ustar,
                     buoy_flux, dt, tracers: dict | None = None):
    """Energetic mixed-layer deepening + homogenization.

    h/T/S: (nk, nj, ni); ustar: (nj, ni) friction velocity [m s-1];
    buoy_flux: (nj, ni) surface buoyancy flux, positive = buoyancy
    LOSS (destabilizing) [m2 s-3].  Returns (h, T, S, tracers, hml)."""
    nk = h.shape[0]
    rho = eos.density(T, S, jnp.zeros_like(T))
    b = -cfg.g * rho / cfg.rho0            # buoyancy [m s-2]

    # available TKE per unit area [m3 s-3 · s = m3 s-2]
    tke = dt * (cfg.mstar * ustar ** 3
                + cfg.nstar * jnp.maximum(buoy_flux, 0.0)
                * jnp.maximum(h[0], cfg.h_min))

    # PE cost of entraining layer k fully into the ML above it:
    # 0.5 · (b_ml − b_k) · H_above · h_k, with b_ml the running
    # mass-weighted ML buoyancy. A scan down the column.
    hH = jnp.cumsum(h, axis=0)             # depth of layer bottoms
    H_above = hH - h                       # depth of layer tops
    bh_cum = jnp.cumsum(b * h, axis=0)
    b_ml = (bh_cum - b * h) / jnp.maximum(H_above, _EPS)  # ML buoyancy
    cost = 0.5 * jnp.maximum(b_ml - b, 0.0) * H_above * h
    cost = cost.at[0].set(0.0)             # layer 1 is the ML seed
    cum_cost = jnp.cumsum(cost, axis=0)

    # fully entrained layers: cum_cost ≤ TKE; marginal layer gets the
    # leftover fraction
    full = (cum_cost <= tke[None]).astype(h.dtype)
    prev_cost = cum_cost - cost
    frac = jnp.clip((tke[None] - prev_cost)
                    / jnp.maximum(cost, _EPS), 0.0, 1.0)
    w = jnp.maximum(full, frac * (prev_cost <= tke[None]))
    w = w.at[0].set(1.0)

    # entrained mass joins the ML (layer 1); donors shrink
    dh = w * h
    dh = dh.at[0].set(0.0)
    h_ml = h[0] + jnp.sum(dh, axis=0)

    def homog(t):
        t_ml = (t[0] * h[0] + jnp.sum(dh * t, axis=0)) \
            / jnp.maximum(h_ml, _EPS)
        t_new = jnp.where(w >= 1.0, t_ml[None], t)
        return t_new.at[0].set(t_ml)

    T_new, S_new = homog(T), homog(S)
    h_new = (h - dh).at[0].set(h_ml)
    out = None
    if tracers is not None:
        out = {name: homog(t) for name, t in tracers.items()}
    return h_new, T_new, S_new, out, h_ml
