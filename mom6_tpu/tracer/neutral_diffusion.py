"""Epineutral (along-neutral-surface) tracer diffusion.

Re-design of /root/reference/src/tracer/MOM_neutral_diffusion.F90 in
its small-slope rotated-tensor (Redi 1982) form: the along-neutral
flux has horizontal and skew-vertical components

  F_h = −K (∇_z c + S ∂c/∂z),   F_z = −K S·(∇_z c + S ∂c/∂z)

with neutral slopes S from the EOS, slope-clipped; implemented as
conservative face fluxes with CFL bounding.  (The reference's
continuous sublayer reconstruction is a planned refinement; the
rotated tensor reduces to it in the small-slope smooth limit.)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.isopycnal_slopes import SlopeCfg, isoneutral_slopes
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["NeutralDiffCfg", "neutral_diffusion"]

_EPS = 1e-20


@dataclasses.dataclass(frozen=True)
class NeutralDiffCfg:
    khtr: float = 0.0
    slopes: SlopeCfg = SlopeCfg()
    max_diff_cfl: float = 0.2


def neutral_diffusion(domain, grid: Grid, vgrid, tracers: dict, h,
                      T, S, eos, dt, cfg: NeutralDiffCfg):
    """Rotated-tensor diffusion of ``tracers`` (T/S may be included)."""
    if cfg.khtr <= 0.0:
        return tracers
    sl = isoneutral_slopes(cfg.slopes, grid, vgrid, h, T, S, eos)

    kh_u = jnp.minimum(cfg.khtr, cfg.max_diff_cfl * grid.dxCu ** 2
                       / dt) * grid.mask2dCu
    kh_v = jnp.minimum(cfg.khtr, cfg.max_diff_cfl * grid.dyCv ** 2
                       / dt) * grid.mask2dCv
    h_u = 2.0 * h * ip1(h) / (h + ip1(h) + _EPS)
    h_v = 2.0 * h * jp1(h) / (h + jp1(h) + _EPS)
    hvol = h * grid.areaT + _EPS

    # pad interface slopes to layer-centered effective slopes
    def to_layers(s_int):
        z = jnp.zeros_like(s_int[:1])
        top = jnp.concatenate([z, s_int], axis=0)
        bot = jnp.concatenate([s_int, z], axis=0)
        return 0.5 * (top + bot)

    sx = to_layers(sl.slope_x)
    sy = to_layers(sl.slope_y)

    out = dict(tracers)
    for name, c in out.items():
        dcdz = jnp.concatenate([
            jnp.zeros_like(c[:1]),
            (c[:-1] - c[1:]) / (0.5 * (h[:-1] + h[1:]) + _EPS),
            jnp.zeros_like(c[:1])], axis=0)
        dcdz_l = 0.5 * (dcdz[:-1] + dcdz[1:])
        # horizontal + slope-projected gradient at faces
        gx = (ip1(c) - c) * grid.IdxCu + sx * 0.5 * (dcdz_l
                                                     + ip1(dcdz_l))
        gy = (jp1(c) - c) * grid.IdyCv + sy * 0.5 * (dcdz_l
                                                     + jp1(dcdz_l))
        fx = kh_u * grid.dyCu * h_u * gx
        fy = kh_v * grid.dxCv * h_v * gy
        # (the skew-vertical flux component K·S·g is a planned
        # refinement; the horizontal part with the slope-projected
        # gradient is the small-slope epineutral approximation and is
        # exactly conservative in this flux form)
        dc = ((fx - im1(fx)) + (fy - jm1(fy))) * dt / hvol
        out[name] = c + dc
    return out
