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
    # KHTR_SLOPE_CFF: Visbeck-style addition cff·L²·SN to the tracer
    # diffusivity (MOM_tracer_hor_diff.F90:241,1659)
    khtr_slope_cff: float = 0.0
    # DIFFUSE_ML_TO_INTERIOR (MOM_tracer_hor_diff.F90:541-551,1687):
    # in layered mode the mixed layer diffuses along coordinate-density
    # (epipycnal) surfaces into the interior instead of along its own
    # z-like layers; the within-ML along-layer diffusivity is scaled by
    # ML_KHTR_SCALE (0 → none) and the buffer layers get no
    # along-layer diffusion at all
    diffuse_ml_to_interior: bool = False
    ml_khtr_scale: float = 1.0    # ML_KHTR_SCALE
    nkml: int = 0                 # mixed-layer layer count (NKML)
    nkmb: int = 0                 # nkml + buffer layers (nk_rho_varies)
    p_ref: float = 2.0e7          # coordinate-density P_REF [Pa]


@jax.named_scope("tracer_hordiff")
def tracer_hordiff(domain, grid: Grid, tracers: dict, h, dt,
                   cfg: TracerHorDiffCfg, khtr_2d=None,
                   res_u=None, res_v=None, add_u=None, add_v=None,
                   rho_ml=None, rlay=None):
    """Diffuse each tracer along layers; exactly conservative.

    khtr_2d: optional spatially-varying coefficient (e.g. MEKE-fed).
    add_u/add_v: optional additive face terms entering before the
    caps (the KHTR_SLOPE_CFF Visbeck addition,
    MOM_tracer_hor_diff.F90:241 Kh_loc = KhTr + Slope_Cff·L2u·SN_u).
    res_u/res_v: optional face-centered resolution-function factors
    applied after KHTR_MAX but before the KHTR_MIN floor
    (MOM_tracer_hor_diff.F90:244-246)."""
    if cfg.khtr <= 0.0 and khtr_2d is None and add_u is None:
        return tracers
    kh0 = khtr_2d if khtr_2d is not None else cfg.khtr

    def face_coef(kh_add, res):
        k = kh0 if kh_add is None else kh0 + kh_add
        if cfg.khtr_max > 0:
            k = jnp.minimum(k, cfg.khtr_max)
        if res is not None:
            k = k * res
        return jnp.maximum(k, cfg.khtr_min)

    kh_u0 = face_coef(add_u, res_u)
    kh_v0 = face_coef(add_v, res_v)

    # per-layer scaling of the along-layer diffusion under
    # DIFFUSE_ML_TO_INTERIOR: ML layers × ML_KHTR_SCALE, buffer layers
    # × 0 (the reference `cycle`s those k, :541-551)
    layer_scale = None
    if cfg.diffuse_ml_to_interior and cfg.nkmb > 0:
        nz = h.shape[0]
        kidx = jnp.arange(nz).reshape((-1,) + (1,) * (h.ndim - 1))
        layer_scale = jnp.where(
            kidx < cfg.nkml, cfg.ml_khtr_scale,
            jnp.where(kidx < cfg.nkmb, 0.0, 1.0))

    out = dict(tracers)
    dt_pass = dt / cfg.passes
    for _ in range(cfg.passes):
        # CFL-bounded coefficient at faces
        kh_u = jnp.minimum(kh_u0, cfg.max_diff_cfl * grid.dxCu ** 2
                           / dt_pass) * grid.mask2dCu
        kh_v = jnp.minimum(kh_v0, cfg.max_diff_cfl * grid.dyCv ** 2
                           / dt_pass) * grid.mask2dCv
        h_u = 2.0 * h * ip1(h) / (h + ip1(h) + _H_NEGLECT)  # harmonic
        h_v = 2.0 * h * jp1(h) / (h + jp1(h) + _H_NEGLECT)
        coef_u = kh_u * grid.dyCu * grid.IdxCu * h_u
        coef_v = kh_v * grid.dxCv * grid.IdyCv * h_v
        if layer_scale is not None:
            coef_u = coef_u * layer_scale
            coef_v = coef_v * layer_scale
        hvol = h * grid.areaT + _H_NEGLECT
        for name, t in out.items():
            fx = coef_u * (ip1(t) - t)
            fy = coef_v * (jp1(t) - t)
            dtr = ((fx - im1(fx)) + (fy - jm1(fy))) * dt_pass
            out[name] = t + dtr / hvol
        out = domain.fill_halos(out, width=1)
    if cfg.diffuse_ml_to_interior and cfg.nkmb > 0 \
            and rho_ml is not None:
        out = ml_epipycnal_diff(domain, grid, out, h, rho_ml, rlay,
                                dt, cfg, kh_u0, kh_v0)
    return out


def _epi_pair_fluxes(c, h, kR, coef, ml_sl):
    """Volume-rate·tracer exchange between ML layers (axis-0 slice
    [:nkmb]) on the 'own' side and density-matched layers kR on the
    ip1/jp1 'other' side, both directions; returns the tracer-content
    tendency [conc·m3 s-1] on the own cell layout."""
    nz, nkmb = h.shape[0], kR.shape[0]
    own_c, own_h = c[:nkmb], h[:nkmb]
    oth_c, oth_h = ml_sl(c), ml_sl(h)
    oth_ct = jnp.take_along_axis(oth_c, kR, axis=0)
    oth_ht = jnp.take_along_axis(oth_h, kR, axis=0)
    hpair = 2.0 * own_h * oth_ht / (own_h + oth_ht + _H_NEGLECT)
    f = coef * hpair * (oth_ct - own_c)        # into own ML layer
    # scatter −f onto the other side's target layers
    scat = jnp.sum(jax.nn.one_hot(kR, nz, axis=1, dtype=f.dtype)
                   * f[:, None], axis=0)       # (nz, nj, ni)
    d_own = jnp.zeros_like(c).at[:nkmb].add(f)
    return d_own, scat


@jax.named_scope("ml_epipycnal_diff")
def ml_epipycnal_diff(domain, grid: Grid, tracers: dict, h, rho_ml,
                      rlay, dt, cfg: TracerHorDiffCfg, kh_u0, kh_v0):
    """Epipycnal diffusion of mixed-layer/buffer water into the
    density-matched interior layer of the neighboring column
    (tracer_epipycnal_ML_diff, MOM_tracer_hor_diff.F90:700).

    TPU-native simplification of the reference's sorted pair-merge:
    each ML/buffer layer k ≤ nkmb with coordinate density rho_ml
    exchanges with the single interior layer whose Rlay target
    bracket contains it (Rlay[kR-1] < rho ≤ Rlay[kR], the reference's
    max_kRho bisection at :857-870), with the harmonic-thickness flux
    limit of the along-layer scheme.  Exactly conservative; ML↔ML
    exchange is carried by the ML_KHTR_SCALE along-layer pass."""
    nkmb = cfg.nkmb
    nz = h.shape[0]
    # first interior layer whose target density is >= the ML water's
    # coordinate density (global Rlay ⇒ the pairing index only depends
    # on the ML cell's own density)
    # bisect over the interior targets only (the first nkmb Rlay
    # entries are ML/buffer placeholders and need not be monotone)
    kR = jnp.clip(nkmb + jnp.searchsorted(rlay[nkmb:], rho_ml),
                  nkmb, nz - 1)
    out = dict(tracers)
    dt_pass = dt / cfg.passes
    hvol = h * grid.areaT + _H_NEGLECT
    for _ in range(cfg.passes):
        kh_u = jnp.minimum(kh_u0, cfg.max_diff_cfl * grid.dxCu ** 2
                           / dt_pass) * grid.mask2dCu
        kh_v = jnp.minimum(kh_v0, cfg.max_diff_cfl * grid.dyCv ** 2
                           / dt_pass) * grid.mask2dCv
        coef_u = kh_u * grid.dyCu * grid.IdxCu
        coef_v = kh_v * grid.dxCv * grid.IdyCv
        for name, t in out.items():
            # own ML ↔ east neighbor's matched layer (flux through the
            # u-face at I); the reverse pairing (east ML ↔ own matched
            # layer) arrives via the shifted scatter of the im1 face
            d_e, scat_e = _epi_pair_fluxes(t, h, kR, coef_u, ip1)
            d_n, scat_n = _epi_pair_fluxes(t, h, kR, coef_v, jp1)
            dtr = (d_e + d_n) - (im1(scat_e) + jm1(scat_n))
            out[name] = t + dtr * dt_pass / hvol
        out = domain.fill_halos(out, width=1)
    return out
