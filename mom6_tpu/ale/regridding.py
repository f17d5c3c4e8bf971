"""Vertical coordinate generators (the "regrid" half of ALE).

Re-design of /root/reference/src/ALE/MOM_regridding.F90 (regridding_main
:763 dispatch; build_zstar_grid :1174, build_sigma_grid :1289,
build_rho_grid :1389) and the coord_* modules: given the current column
state, build the new target thickness distribution h_new with the same
column total.

Modes (REGRIDDING_COORDINATE_MODE): Z* (stretched geopotential),
SIGMA (terrain-following), RHO (isopycnal target densities), LAYER
(no-op).  HYCOM1/ADAPTIVE are planned.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["RegridCfg", "build_grid"]

_H_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class RegridCfg:
    mode: str = "Z*"                  # REGRIDDING_COORDINATE_MODE
    # nominal layer resolution dz (m for Z*, fractions for SIGMA),
    # or target densities (kg m-3) for RHO — ALE_RESOLUTION/ALE_COORDINATE_CONFIG
    resolution: tuple = ()
    min_thickness: float = 1e-3       # MIN_THICKNESS [m]


def _nominal(cfg: RegridCfg, nk: int) -> np.ndarray:
    if cfg.resolution and len(cfg.resolution) == nk:
        return np.asarray(cfg.resolution, dtype=np.float64)
    return np.full(nk, 1.0 / nk)


def build_grid(cfg: RegridCfg, h, bathyT, T=None, S=None, eos=None,
               rlay=None, rho0: float = 1035.0, g: float = 9.8):
    """h_new (nk, njh, nih) with column totals preserved."""
    nk = h.shape[0]
    htot = jnp.sum(h, axis=0)
    mode = cfg.mode.upper().replace("*", "STAR")

    if mode in ("LAYER", "NONE"):
        return h

    if mode in ("HYCOM1", "HYBRID"):
        # HyCOM-style hybrid: interfaces follow target isopycnals but
        # never rise above the nominal fixed-z depths (z-coordinates
        # win near the surface, isopycnals in the interior —
        # coord_hycom.F90 / MOM_hybgen_regrid.F90 essence)
        h_rho = build_grid(dataclasses.replace(cfg, mode="RHO"), h,
                           bathyT, T, S, eos, rlay=rlay, rho0=rho0, g=g)
        z_rho = jnp.concatenate([jnp.zeros_like(h[:1]),
                                 jnp.cumsum(h_rho, axis=0)], axis=0)
        dz_nom = jnp.asarray(_nominal(cfg, nk))
        if cfg.resolution == ():
            dz_nom = dz_nom * jnp.max(bathyT)
        z_nom = jnp.concatenate([jnp.zeros(1, dz_nom.dtype),
                                 jnp.cumsum(dz_nom)]).reshape(-1, 1, 1)
        z_nom = jnp.minimum(z_nom, htot[None])
        z_new = jnp.maximum(z_rho, z_nom)
        z_new = jax.lax.associative_scan(jnp.maximum, z_new, axis=0)
        z_new = z_new.at[-1].set(htot)
        h_new = z_new[1:] - z_new[:-1]
        return _enforce_min(cfg, h_new, htot)

    if mode == "SIGMA":
        frac = _nominal(cfg, nk)
        frac = frac / frac.sum()
        h_new = jnp.asarray(frac).reshape(-1, 1, 1) * htot[None]

    elif mode == "ZSTAR":
        dz_nom = jnp.asarray(_nominal(cfg, nk))
        if cfg.resolution == ():
            # fractions of the deepest column (traced-safe)
            dz_nom = dz_nom * jnp.max(bathyT)
        z_nom = jnp.concatenate([jnp.zeros(1, dz_nom.dtype),
                                 jnp.cumsum(dz_nom)])   # (nk+1,)
        z_nom_j = z_nom.reshape(-1, 1, 1)
        # cap nominal interfaces at the local depth, then stretch so the
        # deepest interface hits the actual column total (z* stretching)
        zcap = jnp.minimum(z_nom_j, bathyT[None])
        scale = htot[None] / (zcap[-1:] + _H_NEGLECT)
        z_new = zcap * scale
        h_new = z_new[1:] - z_new[:-1]

    elif mode == "RHO":
        if rlay is None:
            raise ValueError("RHO regridding requires target densities")
        # column density profile at layer centers
        if T is not None and eos is not None:
            zs = jnp.concatenate([jnp.zeros_like(h[:1]),
                                  jnp.cumsum(h, axis=0)], axis=0)
            z_mid = 0.5 * (zs[:-1] + zs[1:])
            p_mid = rho0 * g * z_mid
            rho = eos.density(T, S, p_mid)
        else:
            rho = jnp.broadcast_to(jnp.asarray(rlay).reshape(-1, 1, 1),
                                   h.shape)
        # monotonic (stably-stratified) profile for inversion
        rho_mono = jax.lax.associative_scan(jnp.maximum, rho, axis=0)
        zs = jnp.concatenate([jnp.zeros_like(h[:1]),
                              jnp.cumsum(h, axis=0)], axis=0)
        z_mid = 0.5 * (zs[:-1] + zs[1:])
        rl = jnp.asarray(rlay)
        rho_int = 0.5 * (rl[:-1] + rl[1:])            # (nk-1,) targets
        # piecewise-linear inversion z(rho) via dense interval location
        r_lo = rho_mono[:-1]
        r_hi = rho_mono[1:]
        z_lo = z_mid[:-1]
        z_hi = z_mid[1:]
        tgt = rho_int.reshape((-1, 1) + (1,) * (h.ndim - 1))
        inside = (tgt >= r_lo[None]) & (tgt < r_hi[None] + 1e-12)
        first = jnp.cumsum(inside.astype(jnp.int32), axis=1) == 1
        sel = inside & first
        frac = jnp.where(r_hi[None] > r_lo[None] + 1e-12,
                         (tgt - r_lo[None]) / (r_hi[None] - r_lo[None]
                                               + _H_NEGLECT), 0.0)
        z_at = jnp.sum(jnp.where(sel, z_lo[None] + frac
                                 * (z_hi[None] - z_lo[None]), 0.0), axis=1)
        # targets lighter than the whole column → surface; denser → bottom
        above = tgt[:, 0] < rho_mono[0][None]
        below = tgt[:, 0] >= rho_mono[-1][None]
        z_at = jnp.where(above, 0.0, jnp.where(below, htot[None], z_at))
        z_new = jnp.concatenate([jnp.zeros_like(htot)[None], z_at,
                                 htot[None]], axis=0)
        # enforce monotonicity of interfaces
        z_new = jax.lax.associative_scan(jnp.maximum, z_new, axis=0)
        h_new = z_new[1:] - z_new[:-1]
    else:
        raise ValueError(f"Unknown REGRIDDING_COORDINATE_MODE "
                         f"'{cfg.mode}'")

    return _enforce_min(cfg, h_new, htot)


def _enforce_min(cfg: RegridCfg, h_new, htot):
    """Minimum thickness: redistribute forward then backward so the
    column total is preserved (inflate_vanished_layers analog)."""
    h_min = cfg.min_thickness
    hv = h_new

    def enforce(hv):
        def fwd(carry, hk):
            debt = carry
            avail = hk + debt
            out = jnp.maximum(avail, h_min)
            return avail - out, out
        _, out = jax.lax.scan(fwd, jnp.zeros_like(hv[0]), hv)
        return out

    hv = enforce(hv)
    hv = enforce(hv[::-1])[::-1]
    # rescale to the exact column total
    tot2 = jnp.sum(hv, axis=0)
    hv = hv * (htot / (tot2 + _H_NEGLECT))[None]
    return hv
