"""Epineutral (along-neutral-surface) tracer diffusion.

Re-design of /root/reference/src/tracer/MOM_neutral_diffusion.F90 in
the complete small-slope rotated-tensor (Redi 1982) form.  With z
positive up and neutral slope S = (Sx, Sy), the flux is

  F_h = −K (∇_z c + S ∂c/∂z)
  F_z = −K (S·∇_z c + |S|² ∂c/∂z)

discretized as
  * conservative horizontal face fluxes with the slope-projected
    gradient (CFL-bounded K),
  * an explicit skew-vertical cross flux −K S·∇_z c at interior
    interfaces (exactly telescoping per column, so column tracer mass
    is conserved to round-off), and
  * the |S|² diagonal applied IMPLICITLY through the shared Thomas
    solve (tracer_vertdiff) — the term that is conditionally stable
    explicitly for thin layers is unconditionally stable here, the
    TPU-native replacement for the reference's sublayer decomposition.

Property test: a tracer that tracks density has vanishing along-
neutral gradient, so its flux (and diapycnal leakage) is ~0 while a
purely horizontal diffusion of the same field would be O(K ∂c/∂x)
(tests/test_neutral_diffusion.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.isopycnal_slopes import SlopeCfg, isoneutral_slopes
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1
from mom6_tpu.tracer.vertdiff import tracer_vertdiff

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
    kh_t = jnp.minimum(cfg.khtr, cfg.max_diff_cfl
                       * jnp.minimum(grid.dxT, grid.dyT) ** 2
                       / dt) * grid.mask2dT
    h_u = 2.0 * h * ip1(h) / (h + ip1(h) + _EPS)
    h_v = 2.0 * h * jp1(h) / (h + jp1(h) + _EPS)
    hvol = h * grid.areaT + _EPS

    # pad interface slopes to layer-centered effective slopes (faces)
    def to_layers(s_int):
        z = jnp.zeros_like(s_int[:1])
        top = jnp.concatenate([z, s_int], axis=0)
        bot = jnp.concatenate([s_int, z], axis=0)
        return 0.5 * (top + bot)

    sx = to_layers(sl.slope_x)
    sy = to_layers(sl.slope_y)
    # interface slopes at T points (mean of the adjacent faces)
    sx_t = 0.5 * (sl.slope_x + im1(sl.slope_x))
    sy_t = 0.5 * (sl.slope_y + jm1(sl.slope_y))
    # implicit |S|² diagonal: interface diffusivity K|S|², padded with
    # zero-flux top/bottom boundaries
    kv_int = kh_t * (sx_t ** 2 + sy_t ** 2)
    zc = jnp.zeros_like(h[:1])
    kv_pad = jnp.concatenate([zc, kv_int, zc], axis=0)

    out = dict(tracers)
    for name, c in out.items():
        dcdz = jnp.concatenate([
            jnp.zeros_like(c[:1]),
            (c[:-1] - c[1:]) / (0.5 * (h[:-1] + h[1:]) + _EPS),
            jnp.zeros_like(c[:1])], axis=0)
        dcdz_l = 0.5 * (dcdz[:-1] + dcdz[1:])
        # plain-horizontal (monotone, CFL-bounded) diffusive fluxes
        gx_raw = (ip1(c) - c) * grid.IdxCu * grid.mask2dCu
        gy_raw = (jp1(c) - c) * grid.IdyCv * grid.mask2dCv
        fx_d = kh_u * grid.dyCu * h_u * gx_raw
        fy_d = kh_v * grid.dxCv * h_v * gy_raw
        # skew horizontal fluxes: the Sx ∂c/∂z part of F_h
        fx_s = kh_u * grid.dyCu * h_u * grid.mask2dCu \
            * sx * 0.5 * (dcdz_l + ip1(dcdz_l))
        fy_s = kh_v * grid.dxCv * h_v * grid.mask2dCv \
            * sy * 0.5 * (dcdz_l + jp1(dcdz_l))
        # skew-vertical cross flux −K S·∇_z c at interior interfaces
        # (z-up positive, per unit area)
        gxc = 0.5 * (gx_raw + im1(gx_raw))
        gyc = 0.5 * (gy_raw + jm1(gy_raw))
        gxc_i = 0.5 * (gxc[:-1] + gxc[1:])
        gyc_i = 0.5 * (gyc[:-1] + gyc[1:])
        g_int = -kh_t * (sx_t * gxc_i + sy_t * gyc_i)
        g_pad = jnp.concatenate([zc, g_int, zc], axis=0)

        # multidimensional Zalesak FCT on the skew fluxes: the
        # low-order solution is the plain-horizontal diffusion (always
        # monotone); each skew flux is scaled so no cell leaves the
        # min/max envelope of its 7-point neighborhood — the
        # monotonicity the reference gets from its positive-definite
        # sublayer decomposition (MOM_neutral_diffusion.F90
        # neutral_surface_flux)
        c_low = c + ((fx_d - im1(fx_d)) + (fy_d - jm1(fy_d))) \
            * dt / hvol
        nbhd = jnp.stack([c, c_low, ip1(c), im1(c), jp1(c), jm1(c)])
        cmax = jnp.max(nbhd, axis=0)
        cmin = jnp.min(nbhd, axis=0)
        cmax = jnp.maximum(cmax, jnp.maximum(
            jnp.concatenate([c[:1], c[:-1]], 0),
            jnp.concatenate([c[1:], c[-1:]], 0)))
        cmin = jnp.minimum(cmin, jnp.minimum(
            jnp.concatenate([c[:1], c[:-1]], 0),
            jnp.concatenate([c[1:], c[-1:]], 0)))
        # antidiffusive budgets (concentration units): positive fx_s
        # raises cell i (dc = +fx_s − im1(fx_s)); positive g raises the
        # layer above the interface
        p_in = (jnp.maximum(fx_s, 0.0) + jnp.maximum(-im1(fx_s), 0.0)
                + jnp.maximum(fy_s, 0.0)
                + jnp.maximum(-jm1(fy_s), 0.0)) * dt / hvol \
            + (jnp.maximum(g_pad[1:], 0.0)
               + jnp.maximum(-g_pad[:-1], 0.0)) * dt / (h + _EPS)
        p_out = (jnp.maximum(-fx_s, 0.0) + jnp.maximum(im1(fx_s), 0.0)
                 + jnp.maximum(-fy_s, 0.0)
                 + jnp.maximum(jm1(fy_s), 0.0)) * dt / hvol \
            + (jnp.maximum(-g_pad[1:], 0.0)
               + jnp.maximum(g_pad[:-1], 0.0)) * dt / (h + _EPS)
        r_in = jnp.minimum(1.0, jnp.maximum(cmax - c_low, 0.0)
                           / (p_in + _EPS))
        r_out = jnp.minimum(1.0, jnp.maximum(c_low - cmin, 0.0)
                            / (p_out + _EPS))
        # per-face limiter: min(receiver r_in, donor r_out)
        fx_s = fx_s * jnp.where(fx_s > 0,
                                jnp.minimum(r_in, ip1(r_out)),
                                jnp.minimum(r_out, ip1(r_in)))
        fy_s = fy_s * jnp.where(fy_s > 0,
                                jnp.minimum(r_in, jp1(r_out)),
                                jnp.minimum(r_out, jp1(r_in)))
        r_up = jnp.minimum(r_in[:-1], r_out[1:])     # for g>0
        r_dn = jnp.minimum(r_out[:-1], r_in[1:])     # for g<0
        g_lim = jnp.where(g_int > 0, r_up * g_int, r_dn * g_int)
        g_pad = jnp.concatenate([zc, g_lim, zc], axis=0)

        fx = fx_d + fx_s
        fy = fy_d + fy_s
        dc = ((fx - im1(fx)) + (fy - jm1(fy))) * dt / hvol \
            + (g_pad[1:] - g_pad[:-1]) * dt / (h + _EPS)
        c_new = c + dc
        # implicit K|S|² diagonal (unconditionally stable Thomas solve)
        c_new = tracer_vertdiff(c_new, h, kv_pad, dt)
        out[name] = c_new
    return out
