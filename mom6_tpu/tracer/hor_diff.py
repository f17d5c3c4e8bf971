"""Lateral (along-layer) tracer diffusion.

Re-design of /root/reference/src/tracer/MOM_tracer_hor_diff.F90:
along-layer Laplacian diffusion of tracers with thickness-weighted
fluxes and sub-stepped iteration when the diffusive CFL exceeds one
(the reference iterates num_itts times; here the applied coefficient is
CFL-bounded per pass and the pass count is fixed).  The epineutral
(neutral-surface) variant of MOM_neutral_diffusion.F90 lives in
mom6_tpu/tracer/neutral_diffusion.py (USE_NEUTRAL_DIFFUSION).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["TracerHorDiffCfg", "tracer_hordiff"]

_H_NEGLECT = 1e-20


@dataclasses.dataclass(frozen=True)
class TracerHorDiffCfg:
    khtr: float = 0.0             # KHTR [m2 s-1]
    khtr_min: float = 0.0
    khtr_max: float = -1.0
    max_diff_cfl: float = 0.2     # per-pass diffusive CFL bound
    passes: int = 2


@jax.named_scope("tracer_hordiff")
def tracer_hordiff(domain, grid: Grid, tracers: dict, h, dt,
                   cfg: TracerHorDiffCfg, khtr_2d=None):
    """Diffuse each tracer along layers; exactly conservative.

    khtr_2d: optional spatially-varying coefficient (e.g. MEKE-fed)."""
    if cfg.khtr <= 0.0 and khtr_2d is None:
        return tracers
    kh = khtr_2d if khtr_2d is not None else cfg.khtr
    kh = jnp.maximum(kh, cfg.khtr_min)
    if cfg.khtr_max > 0:
        kh = jnp.minimum(kh, cfg.khtr_max)

    out = dict(tracers)
    dt_pass = dt / cfg.passes
    for _ in range(cfg.passes):
        # CFL-bounded coefficient at faces
        kh_u = jnp.minimum(kh, cfg.max_diff_cfl * grid.dxCu ** 2
                           / dt_pass) * grid.mask2dCu
        kh_v = jnp.minimum(kh, cfg.max_diff_cfl * grid.dyCv ** 2
                           / dt_pass) * grid.mask2dCv
        h_u = 2.0 * h * ip1(h) / (h + ip1(h) + _H_NEGLECT)  # harmonic
        h_v = 2.0 * h * jp1(h) / (h + jp1(h) + _H_NEGLECT)
        coef_u = kh_u * grid.dyCu * grid.IdxCu * h_u
        coef_v = kh_v * grid.dxCv * grid.IdyCv * h_v
        hvol = h * grid.areaT + _H_NEGLECT
        for name, t in out.items():
            fx = coef_u * (ip1(t) - t)
            fy = coef_v * (jp1(t) - t)
            dtr = ((fx - im1(fx)) + (fy - jm1(fy))) * dt_pass
            out[name] = t + dtr / hvol
        out = domain.fill_halos(out, width=1)
    return out
