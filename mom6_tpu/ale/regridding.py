"""Vertical coordinate generators (the "regrid" half of ALE).

Re-design of /root/reference/src/ALE/MOM_regridding.F90 (regridding_main
:763 dispatch; build_zstar_grid :1174, build_sigma_grid :1289,
build_rho_grid :1389) and the coord_* modules: given the current column
state, build the new target thickness distribution h_new with the same
column total.

Modes (REGRIDDING_COORDINATE_MODE): Z* (stretched geopotential),
SIGMA (terrain-following), RHO (isopycnal target densities), LAYER
(no-op), HYCOM1 (hybrid), ADAPTIVE (coord_adapt.F90
build_adapt_column: interfaces chase the horizontal neutral-density
curvature, then relax under a vertical grid diffusion with
near-surface zoom and stratification terms).
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
    # ADAPTIVE-mode knobs (MOM_regridding.F90:593-608)
    adapt_time_ratio: float = 0.1     # ADAPT_TIME_RATIO
    adapt_zoom: float = 200.0         # ADAPT_ZOOM_DEPTH [m]
    adapt_zoom_coeff: float = 0.2     # ADAPT_ZOOM_COEFF
    adapt_buoy_coeff: float = 0.8     # ADAPT_BUOY_COEFF
    adapt_alpha: float = 1.0          # ADAPT_ALPHA
    adapt_drho0: float = 0.5          # ADAPT_DRHO0 [kg m-3]
    adapt_do_min: bool = False        # ADAPT_DO_MIN_DEPTH
    # HYBGEN mode: the full HYCOM hybrid generator's own parameters
    # (MOM_hybgen_regrid.F90; mom6_tpu.ale.hybgen_regrid)
    hybgen: object = None             # HybgenRegridCfg | None


def _nominal(cfg: RegridCfg, nk: int) -> np.ndarray:
    if cfg.resolution and len(cfg.resolution) == nk:
        return np.asarray(cfg.resolution, dtype=np.float64)
    return np.full(nk, 1.0 / nk)


def _build_adapt(cfg: RegridCfg, h, htot, bathyT, T, S, eos,
                 rho0, g, mask2dT):
    """ADAPTIVE coordinate (coord_adapt.F90 build_adapt_column):

    1. each interior interface moves by the horizontal Laplacian of
       neutral density divided by the local vertical density gradient
       (clipped to half the upwind layer and scaled by ADAPT_ALPHA);
    2. the interface field then relaxes under a columnwise implicit
       grid diffusion whose diffusivity blends a near-surface zoom
       term, a stratification term, and a uniform background;
    3. motions are clamped so no layer goes below MIN_THICKNESS.

    All columns solve at once: the neighbor stencil is ip1/im1/jp1/jm1
    shifts and the tridiagonal relaxation is a lax.scan Thomas solve
    over interfaces.
    """
    from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1
    from mom6_tpu.ale.remapping import _thomas_interfaces
    nk = h.shape[0]
    if mask2dT is None:
        mask2dT = jnp.ones_like(htot)
    # interface depths (positive down), temperatures, salinities
    zInt = jnp.concatenate([jnp.zeros_like(h[:1]),
                            jnp.cumsum(h, axis=0)], axis=0)
    tInt = jnp.concatenate([T[:1], 0.5 * (T[:-1] + T[1:]), T[-1:]],
                           axis=0)
    sInt = jnp.concatenate([S[:1], 0.5 * (S[:-1] + S[1:]), S[-1:]],
                           axis=0)
    pInt = rho0 * g * zInt                     # hydrostatic pressure

    # horizontal neutral-density curvature at interior interfaces
    del2sigma = jnp.zeros_like(zInt)
    for shift in (ip1, im1, jp1, jm1):
        tn, sn, zn, mn = (shift(tInt), shift(sInt), shift(pInt),
                          shift(mask2dT))
        alpha_n, beta_n = eos.density_derivs(
            0.5 * (tInt + tn), 0.5 * (sInt + sn), 0.5 * (pInt + zn))
        del2sigma = del2sigma + mn[None] * (
            alpha_n * (tn - tInt) + beta_n * (sn - sInt))

    alpha, beta = eos.density_derivs(tInt, sInt, pInt)
    # vertical density jump across each interior interface
    dT = jnp.concatenate([jnp.zeros_like(T[:1]), T[1:] - T[:-1]],
                         axis=0)
    dS = jnp.concatenate([jnp.zeros_like(S[:1]), S[1:] - S[:-1]],
                         axis=0)
    drho_v = jnp.maximum(alpha[:nk] * dT + beta[:nk] * dS, 1e-20)
    h_mid = jnp.concatenate([h[:1], 0.5 * (h[:-1] + h[1:])], axis=0)
    dh = del2sigma[:nk] * h_mid / drho_v
    h_up = jnp.where(dh > 0.0, h,
                     jnp.concatenate([h[:1], h[:-1]], axis=0))
    dh = (0.5 * cfg.adapt_alpha
          * jnp.sign(dh) * jnp.minimum(jnp.abs(del2sigma[:nk]),
                                       0.5 * h_up))
    K = jnp.arange(nk).reshape((-1,) + (1,) * (htot.ndim))
    dh = jnp.where(K == 0, 0.0, dh)            # surface pinned
    zNext = jnp.concatenate([zInt[:nk] + dh, zInt[-1:]], axis=0)

    # grid-diffusion relaxation (coord_adapt.F90:147-186): layer
    # diffusivities from zoom/stratification/background terms
    depth = jnp.maximum(htot, 1e-10)
    z_mid = 0.5 * (zNext[:-1] + zNext[1:])
    # stratification across each LAYER, per new thickness; the
    # reference divides by (zNext(K)-zNext(K+1)) with depth positive
    # down — taken here as the (positive) layer thickness so stable
    # columns get the documented stratification-dependent diffusion
    drdz_lay = (0.5 * (alpha[:-1] + alpha[1:]) * (tInt[1:] - tInt[:-1])
                + 0.5 * (beta[:-1] + beta[1:]) * (sInt[1:] - sInt[:-1]))
    drdz = jnp.maximum(
        drdz_lay / (zNext[1:] - zNext[:-1] + 1e-30), 0.0)
    kgrid = (cfg.adapt_time_ratio * nk ** 2 * depth) * (
        cfg.adapt_zoom_coeff / (cfg.adapt_zoom + z_mid)
        + cfg.adapt_buoy_coeff * drdz / cfg.adapt_drho0
        + max(1.0 - cfg.adapt_zoom_coeff - cfg.adapt_buoy_coeff, 0.0)
        / depth)
    # tridiagonal: (1 + kg[k-1] + kg[k]) z_K - kg[k-1] z_{K-1}
    #                                       - kg[k] z_{K+1} = z*_K
    kg_up = jnp.concatenate([jnp.zeros_like(kgrid[:1]), kgrid],
                            axis=0)[:nk + 1]   # kGrid(k-1) at iface K
    kg_dn = jnp.concatenate([kgrid, jnp.zeros_like(kgrid[:1])],
                            axis=0)            # kGrid(k) at iface K
    Ki = jnp.arange(nk + 1).reshape((-1,) + (1,) * (htot.ndim))
    interior = (Ki >= 1) & (Ki <= nk - 1)
    lo = jnp.where(interior, -kg_up, 0.0)
    up = jnp.where(interior, -kg_dn, 0.0)
    dg = jnp.where(interior, 1.0 + kg_up + kg_dn, 1.0)
    zNext = _thomas_interfaces(lo, dg, up, zNext)

    if cfg.adapt_do_min:
        # HyCOM-like mixed layer: interfaces may not rise above the
        # nominal coordinate depths (stretched to the column)
        dz_nom = jnp.asarray(_nominal(cfg, nk))
        if cfg.resolution == ():
            dz_nom = dz_nom * jnp.max(bathyT)
        stretch = zInt[-1] / depth
        z_nom = jnp.cumsum(dz_nom.reshape((-1,) + (1,) * htot.ndim)
                           * stretch[None], axis=0)
        zNext = zNext.at[1:].set(
            jnp.minimum(jnp.maximum(zNext[1:], z_nom), zInt[-1][None]))

    # monotone interfaces + min-thickness floor, totals preserved
    zNext = jax.lax.associative_scan(jnp.maximum, zNext, axis=0)
    zNext = zNext.at[0].set(0.0).at[-1].set(htot)
    h_new = zNext[1:] - zNext[:-1]
    h_new = _enforce_min(cfg, h_new, htot)
    # land columns keep their grid
    return jnp.where(mask2dT[None] > 0.0, h_new, h)


def build_grid(cfg: RegridCfg, h, bathyT, T=None, S=None, eos=None,
               rlay=None, rho0: float = 1035.0, g: float = 9.8,
               mask2dT=None):
    """h_new (nk, njh, nih) with column totals preserved.

    ``mask2dT`` is only consulted by ADAPTIVE mode (its neutral-
    curvature stencil must exclude land neighbors); h/T/S need one
    valid halo ring there."""
    nk = h.shape[0]
    htot = jnp.sum(h, axis=0)
    mode = cfg.mode.upper().replace("*", "STAR")

    if mode in ("LAYER", "NONE"):
        return h

    if mode in ("ADAPTIVE", "ADAPT"):
        if T is None or S is None or eos is None:
            raise ValueError("ADAPTIVE regridding needs T, S and an EOS")
        return _build_adapt(cfg, h, htot, bathyT, T, S, eos, rho0, g,
                            mask2dT)

    if mode == "HYBGEN":
        # the full HYCOM hybgen generator (MOM_hybgen_regrid.F90):
        # cushioned interface relocation toward the target isopycnals
        # under dp0k/ds0k minimum-thickness and relaxation constraints
        from mom6_tpu.ale.hybgen_regrid import (HybgenRegridCfg,
                                                hybgen_regrid)
        hcfg = cfg.hybgen
        if hcfg is None:
            dz = _nominal(cfg, nk)
            if cfg.resolution == ():
                dz = dz * float(jnp.max(bathyT))
            hcfg = HybgenRegridCfg(dp0k=tuple(dz),
                                   ds0k=tuple(0.1 * dz),
                                   min_thickness=cfg.min_thickness)
        if T is not None and eos is not None:
            rcv = eos.density(T, S, hcfg.ref_pressure)
        else:
            rcv = jnp.broadcast_to(
                jnp.asarray(rlay).reshape(-1, 1, 1), h.shape)
        rcv_tgt = jnp.asarray(rlay)
        h_new = hybgen_regrid(hcfg, h, rcv, rcv_tgt, bathyT)
        return _enforce_min(cfg, h_new, htot)

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
