"""Stochastic physics perturbations.

Re-design of /root/reference/src/parameterizations/stochastic/
MOM_stochastics.F90 (SPPT and SKEB hooks fed by the external
stochastic_physics package, stubbed at
config_src/external/stochastic_physics/): AR(1)-in-time, spatially
smoothed random pattern fields used to multiply physics tendencies
(SPPT) or perturb ePBL energetics.  Patterns are generated with the
layout-invariant gridded PRNG.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.framework.random import gridded_normal
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["StochasticsCfg", "init_pattern", "step_pattern",
           "apply_sppt", "skeb_taper", "apply_skeb"]


@dataclasses.dataclass(frozen=True)
class StochasticsCfg:
    do_sppt: bool = False            # DO_SPPT
    sppt_amplitude: float = 0.5
    decorr_steps: int = 48           # AR(1) decorrelation [steps]
    smooth_passes: int = 4           # spatial smoothing iterations
    clip: float = 0.8                # |pattern| clip for stability
    # --- SKEB (stochastic kinetic-energy backscatter; apply_skeb,
    # MOM_stochastics.F90:265-390): a non-divergent velocity
    # increment curl(psi) with |psi| ~ sqrt(dt * local dissipation
    # rate) modulated by a second AR(1) random pattern ---
    do_skeb: bool = False            # DO_SKEB
    skeb_npass: int = 5              # SKEB_NPASS 9-point smoother
    skeb_taper_width: int = 4        # SKEB_TAPER_WIDTH [cells]
    skeb_amplitude: float = 1.0      # multiplies the psi amplitude


def _smooth(domain: Domain, f, passes: int):
    for _ in range(passes):
        f = 0.5 * f + 0.125 * ((ip1(f) + im1(f)) + (jp1(f) + jm1(f)))
        f = domain.fill_halos(f, width=1)
    return f


def init_pattern(domain: Domain, cfg: StochasticsCfg, seed: int,
                 i0=0, j0=0):
    r = gridded_normal(domain, seed, nk=1, i0=i0, j0=j0)[0]
    return _smooth(domain, r, cfg.smooth_passes)


def step_pattern(domain: Domain, cfg: StochasticsCfg, pattern, seed,
                 step: int, i0=0, j0=0):
    """AR(1) update: p' = φ p + √(1−φ²)·ε with fresh smoothed noise."""
    phi = jnp.exp(-1.0 / cfg.decorr_steps)
    eps = gridded_normal(domain, seed + step + 1, nk=1, i0=i0, j0=j0)[0]
    eps = _smooth(domain, eps, cfg.smooth_passes)
    return phi * pattern + jnp.sqrt(1.0 - phi * phi) * eps


def apply_sppt(cfg: StochasticsCfg, tendency, pattern):
    """Multiply a physics tendency by (1 + a·pattern), clipped."""
    fac = 1.0 + cfg.sppt_amplitude * jnp.clip(pattern, -cfg.clip,
                                              cfg.clip)
    return tendency * fac


def skeb_taper(domain: Domain, grid, width: int):
    """(taperCu, taperCv): ramps that zero the stochastic velocity
    increment within ``width`` cells of land (the taperCu/taperCv
    construction of MOM_stochastics.F90:136-210).  Built as a
    normalized L∞ distance-to-land transform: ``width`` iterations of
    a 3×3 min-filter on the T mask."""
    t = grid.mask2dT
    for _ in range(width):
        mn = jnp.minimum(t, jnp.minimum(ip1(t), im1(t)))
        mn = jnp.minimum(mn, jnp.minimum(jp1(t), jm1(t)))
        t = domain.fill_halos(
            jnp.minimum(t, mn + 1.0 / width), width=1)
    taper = jnp.clip(t, 0.0, 1.0) * grid.mask2dT
    t_cu = jnp.minimum(taper, ip1(taper)) * grid.mask2dCu
    t_cv = jnp.minimum(taper, jp1(taper)) * grid.mask2dCv
    return t_cu, t_cv


def apply_skeb(domain: Domain, grid, cfg: StochasticsCfg, u, v,
               wts, dt: float, taper_cu=None, taper_cv=None,
               extra_diss=None):
    """Stochastic kinetic-energy backscatter (apply_skeb,
    MOM_stochastics.F90:265-390): estimate the local dissipation rate
    from the deformation (shear + tension) of the resolved flow,
    smooth it, build a random streamfunction
    psi = sqrt(dt/4 · diss-corner-avg) · wts at corner points, and
    add the non-divergent increment (−∂ψ/∂y, +∂ψ/∂x), tapered to
    zero near land.  Returns (u, v) with the increment added."""
    mcv2 = grid.mask2dCv * im1(grid.mask2dCv)
    mcu2 = grid.mask2dCu * jm1(grid.mask2dCu)
    shr = (v - im1(v)) * (mcv2 * grid.IdxCv)[None] \
        + (u - jm1(u)) * (mcu2 * grid.IdyCu)[None]
    ten = (v - im1(v)) * (mcv2 * grid.IdyCv)[None] \
        + (u - jm1(u)) * (mcu2 * grid.IdxCu)[None]
    tot = jnp.sqrt(shr * shr + ten * ten) * grid.mask2dT[None]
    diss = tot ** 3 * grid.areaT[None]
    if extra_diss is not None:
        diss = diss + extra_diss
    # area-weighted 9-point smoother, skeb_npass times
    w = grid.mask2dT * grid.areaT
    diss = domain.fill_halos(diss, width=1)
    for _ in range(cfg.skeb_npass):
        num = (w * diss
               + ip1(w * diss) + im1(w * diss)
               + jp1(w * diss) + jm1(w * diss)
               + ip1(jp1(w * diss)) + ip1(jm1(w * diss))
               + im1(jp1(w * diss)) + im1(jm1(w * diss)))
        den = (w + ip1(w) + im1(w) + jp1(w) + jm1(w)
               + ip1(jp1(w)) + ip1(jm1(w)) + im1(jp1(w))
               + im1(jm1(w)))
        sm = num / (den + 1e-16)
        diss = domain.fill_halos(
            jnp.where(grid.mask2dT[None] > 0, sm, diss), width=1)
    # corner-point streamfunction: psi(I,J) from the 4 surrounding
    # T cells, modulated by the AR(1) pattern
    d4 = (diss + ip1(jp1(diss))) + (jp1(diss) + ip1(diss))
    psi = cfg.skeb_amplitude \
        * jnp.sqrt(0.25 * dt * jnp.maximum(d4, 0.0)) * wts[None]
    if taper_cu is None or taper_cv is None:
        taper_cu, taper_cv = skeb_taper(domain, grid,
                                        cfg.skeb_taper_width)
    ustar = -(psi - jm1(psi)) * (taper_cu * grid.IdyCu)[None]
    vstar = (psi - im1(psi)) * (taper_cv * grid.IdxCv)[None]
    return u + ustar, v + vstar
