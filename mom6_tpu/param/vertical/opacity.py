"""Shortwave penetration and ocean optics.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_opacity.F90: downward shortwave divides into spectral bands that
decay exponentially with band-specific e-folding depths; band
partitions/opacities follow Jerlov water types or the Manizza et al.
(2005) chlorophyll-dependent fit.  Returns the heating deposited in
each layer (the flux convergence), consumed by the diabatic driver's
applyBoundaryFluxesInOut.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["OpacityCfg", "sw_absorption_profile"]

# Jerlov water types: (fraction in band 1 (red), pen depth1 [m],
#                      pen depth2 [m] (blue-green))
_JERLOV = {
    "I": (0.58, 0.35, 23.0),
    "IA": (0.62, 0.60, 20.0),
    "IB": (0.67, 1.00, 17.0),
    "II": (0.77, 1.50, 14.0),
    "III": (0.78, 1.40, 7.9),
}


@dataclasses.dataclass(frozen=True)
class OpacityCfg:
    scheme: str = "JERLOV"         # JERLOV | MANIZZA_05 | EXPONENTIAL
    water_type: str = "IB"         # WATER_TYPE
    chl: float = 0.1               # chlorophyll [mg m-3] for MANIZZA
    sw_max_pen_depth: float = 1e4
    # EXPONENTIAL: the single-band PEN_SW_SCALE / PEN_SW_FRAC scheme
    # of the solo/gfdl surface forcing (MOM_surface_forcing.F90 and
    # MOM_opacity.F90's SW_EXP_MODE); the tc1-class benchmark configs
    # use it
    pen_sw_scale: float = 15.0     # PEN_SW_SCALE e-folding depth [m]
    pen_sw_frac: float = 0.42      # PEN_SW_FRAC penetrating fraction
    # CORRECT_ABSORPTION_DEPTH: move part of each layer's absorbed
    # shortwave into the water above so the pressure-weighted mean
    # heating depth matches the exact exponential profile
    # (absorbRemainingSW's adjustAbsorptionProfile branch,
    # MOM_opacity.F90:755-790)
    correct_absorption_depth: bool = False


def _bands(cfg: OpacityCfg):
    if cfg.scheme.upper() == "EXPONENTIAL":
        return ((cfg.pen_sw_frac, max(cfg.pen_sw_scale, 1e-3)),)
    if cfg.scheme.upper() == "JERLOV":
        r1, z1, z2 = _JERLOV[cfg.water_type.upper()]
        return ((r1, z1), (1.0 - r1, z2))
    if cfg.scheme.upper() == "MANIZZA_05":
        # Manizza et al. 2005: red absorbs fast; blue/green depend on Chl
        chl = max(cfg.chl, 0.001)
        k_bg = 0.0232 + 0.074 * chl ** 0.674      # blue-green [m-1]
        k_r = 0.225 + 0.037 * chl ** 0.629        # red
        return ((0.58, 1.0 / k_r), (0.42, 1.0 / k_bg))
    if cfg.scheme.upper() == "MOREL_88":
        # Morel & Antoine (1994) fits (opacity_morel /
        # SW_pen_frac_morel, MOM_opacity.F90): a single penetrating
        # band whose extinction length and fraction are chl-a
        # polynomials in log10(Chl); the non-penetrating remainder is
        # absorbed in the top band with a short e-folding depth
        chl = math.log10(min(max(cfg.chl, 0.02), 60.0))
        chl2 = chl * chl
        z2 = (7.925 - 6.644 * chl) + chl2 * (
            (3.662 - 1.815 * chl) + chl2 * (-0.218 + 0.502 * chl))
        pen = 1.0 - ((0.321 + 0.008 * chl) + chl2 * (
            (0.132 + 0.038 * chl) + chl2 * (-0.017 - 0.007 * chl)))
        return ((1.0 - pen, 0.35), (pen, z2))
    raise ValueError(f"Unknown opacity scheme '{cfg.scheme}'")


def sw_absorption_profile(cfg: OpacityCfg, h, sw_surface):
    """Layer heating [W m-2 absorbed per layer] from surface shortwave.

    Returns (heating (nk, ...), sw_bottom leftover)."""
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    flux_bot = 0.0
    heating = jnp.zeros_like(h)
    fsum = 0.0
    hh = z_int[:-1]                         # thickness above layer k
    for frac, zpen in _bands(cfg):
        fsum += frac
        fb = frac * sw_surface[None] * jnp.exp(
            -jnp.minimum(z_int / zpen, 80.0))
        absorbed = fb[:-1] - fb[1:]
        flux_bot = flux_bot + fb[-1]
        if not cfg.correct_absorption_depth:
            heating = heating + absorbed
            continue
        # adjustAbsorptionProfile (MOM_opacity.F90:755-790): a
        # fraction SWa of each layer's absorption heats the column
        # above uniformly in temperature, chosen so the
        # pressure-weighted mean heating depth equals that of the
        # exact exponential profile within the layer; capped so the
        # overlying water never warms faster than the layer itself
        od = h / zpen
        e = jnp.exp(-jnp.minimum(od, 80.0))
        swa_full = (((od + (od + 2.0) * e) - 2.0)
                    / ((od + hh / zpen) * jnp.maximum(1.0 - e, 1e-30)))
        swa_taylor = h * (od * (1.0 - od)) \
            / ((hh + h) * (6.0 - 3.0 * od) + 1e-30)
        swa = jnp.where(od > 1e-5, swa_full, swa_taylor)
        swa = jnp.where(hh > 0.0,
                        jnp.minimum(swa, hh / (hh + h + 1e-30)), 0.0)
        heating = heating + (1.0 - swa) * absorbed
        # uniform ΔT over the hh of water above: reverse-cumulated
        # temperature tendency × local thickness keeps it O(nz)
        dT_above = swa * absorbed / jnp.maximum(hh, 1e-30)
        s = jnp.flip(jnp.cumsum(jnp.flip(dT_above, 0), axis=0), 0)
        s_excl = jnp.concatenate([s[1:], jnp.zeros_like(s[:1])],
                                 axis=0)
        heating = heating + h * s_excl
    if fsum < 1.0 - 1e-12:
        # the non-penetrating remainder is absorbed at the surface
        # (single-band PEN_SW_FRAC semantics)
        heating = heating.at[0].add((1.0 - fsum) * sw_surface)
    return heating, flux_bot
