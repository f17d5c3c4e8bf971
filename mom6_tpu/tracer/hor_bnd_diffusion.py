"""Near-boundary lateral tracer diffusion.

Re-design of /root/reference/src/tracer/MOM_hor_bnd_diffusion.F90:
lateral mixing restricted to the surface boundary layer, where neutral
surfaces outcrop and along-surface mixing is the physically correct
limit.  Tracers are diffused horizontally with a coefficient weighted
by the fraction of each layer inside the boundary layer depth (from
KPP/ePBL), using the same conservative thickness-weighted flux form as
tracer_hordiff.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["HorBndDiffCfg", "hor_bnd_diffusion"]

_EPS = 1e-20


@dataclasses.dataclass(frozen=True)
class HorBndDiffCfg:
    khtr_bnd: float = 0.0        # HBD KH [m2 s-1]
    max_diff_cfl: float = 0.2


def hor_bnd_diffusion(domain, grid: Grid, tracers: dict, h, bld, dt,
                      cfg: HorBndDiffCfg):
    """Diffuse tracers laterally within the boundary layer only.

    bld: boundary layer depth (njh, nih) [m]."""
    if cfg.khtr_bnd <= 0.0:
        return tracers
    # fraction of each layer inside the BLD
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    frac = jnp.clip((bld[None] - z_int[:-1]) / (h + _EPS), 0.0, 1.0)

    kh_u = jnp.minimum(cfg.khtr_bnd, cfg.max_diff_cfl
                       * grid.dxCu ** 2 / dt) * grid.mask2dCu
    kh_v = jnp.minimum(cfg.khtr_bnd, cfg.max_diff_cfl
                       * grid.dyCv ** 2 / dt) * grid.mask2dCv
    # effective exchange thickness: harmonic mean of the IN-BLD parts
    hb = frac * h
    hb_u = 2.0 * hb * ip1(hb) / (hb + ip1(hb) + _EPS)
    hb_v = 2.0 * hb * jp1(hb) / (hb + jp1(hb) + _EPS)
    hvol = h * grid.areaT + _EPS

    out = dict(tracers)
    for name, t in out.items():
        fx = kh_u * grid.dyCu * grid.IdxCu * hb_u * (ip1(t) - t)
        fy = kh_v * grid.dxCv * grid.IdyCv * hb_v * (jp1(t) - t)
        dtr = ((fx - im1(fx)) + (fy - jm1(fy))) * dt
        out[name] = t + dtr / hvol
    return out
