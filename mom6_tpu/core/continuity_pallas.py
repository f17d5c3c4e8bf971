"""Fused Pallas TPU kernels for the PPM continuity step.

The jnp continuity path (continuity_ppm.py) is a pipeline of ~30
stencil phases per call — PPM edge reconstruction, 7 Newton flux
evaluations per direction, the final flux, and the thickness update —
and XLA materializes many phase boundaries to HBM; at 512x512x25 the
transport-matched call reads ~9 ms on a v5e chip, dominated by that
phase-boundary traffic, not FLOPs.

Design: one kernel per directional sweep, exploiting that each sweep
shifts in exactly ONE axis:

* the x-sweep is row-local (shifts only along lanes), so it runs on
  plain row-blocked VMEM BlockSpecs — every input read from HBM
  once, every output written once, the whole sweep (edges + Newton
  + final flux + h update) fused in VMEM;
* the y-sweep transposes rows<->lanes (two cheap XLA transposes per
  field) and reuses the SAME row-local kernel with the y-direction
  grid constants in the x slots;
* rows too wide for whole-row VMEM blocks (OM4-class 1440+ lanes)
  use the lane-tiled variant: a 2-D (row-block, lane-tile) grid
  where each LTX-lane output tile recomputes the sweep on a
  3*LTX-lane window assembled from three lane-shifted BlockSpecs
  (clamped to consecutive tiles at the walls) — 3x input read
  amplification, still far below the jnp path's ~30 phase-boundary
  round trips.

Lane dims are zero-padded to a 128 multiple (Mosaic's lane tiling);
the padded columns alias the same physical memory XLA's tiled layout
already allocates, and the rolls' wraparound only corrupts lane-edge
halo columns the caller refreshes anyway.

Semantics mirror continuity_ppm formula-for-formula (same Newton
iteration count, same limiter); equivalence is tested to roundoff in
tests/test_continuity_pallas.py (f64 interpret mode, bitwise-tight).

Reference: zonal_mass_flux / zonal_flux_adjust,
/root/reference/src/core/MOM_continuity_PPM.F90:640-1247.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.continuity_ppm import ContinuityCfg, ContinuityResult

__all__ = ["continuity_ppm_pallas", "pallas_continuity_supported",
           "set_up_bt_cont_pallas"]

TJ = 8         # output rows per block
LTX = 128      # output lane tile for the lane-tiled (wide-row) sweep


def _fits_direct(nk: int, lanes: int) -> bool:
    """Whole-row VMEM blocks: a (nk, TJ, lanes) block must fit the
    16 MB scoped VMEM with double-buffered inputs/outputs and the
    sweep temporaries — at nk=25 that bounds the lane width to ~1024."""
    return nk * lanes * TJ * 4 * 16 <= 14e6


def _fits_tiled(nk: int, lanes: int) -> bool:
    """Lane-tiled blocks: VMEM holds a 3*LTX-lane window per field
    regardless of the row width, so only nk is bounded (~40 at the
    28-buffer budget below)."""
    return lanes >= 3 * LTX and nk * TJ * (3 * LTX) * 4 * 28 <= 14e6


def pallas_continuity_supported(cfg: ContinuityCfg, grid_shape,
                                obc=None, porous=False) -> bool:
    """The fused kernels cover the production configuration: full PPM
    (not upwind/simple-2nd), positive-definite limiter, no porous
    barriers, no OBC coupling, njh divisible by TJ."""
    nk, njh, nih = grid_shape
    # each sweep runs with the swept axis on lanes (the y-sweep
    # transposed), whole-row blocked when the row fits VMEM and
    # lane-tiled (3-tile recompute windows) when it does not
    lanes_pad = -(-nih // 128) * 128
    rows_pad = -(-njh // 128) * 128
    vmem_ok = all(_fits_direct(nk, p) or _fits_tiled(nk, p)
                  for p in (lanes_pad, rows_pad))
    return (not cfg.upwind_1st and not cfg.simple_2nd
            and not cfg.monotonic and not cfg.vol_cfl
            and obc is None and not porous
            and njh % TJ == 0 and njh >= 3 * TJ and vmem_ok)


def _edges(h, mask, roll_p, roll_m, h_min2):
    """PPM edge values (positive-definite limiter), mirroring
    continuity_ppm._ppm_edges."""
    m_p = roll_p(mask)
    m_m = roll_m(mask)
    h_p = m_p * roll_p(h) + (1.0 - m_p) * h
    h_m = m_m * roll_m(h) + (1.0 - m_m) * h
    hp_raw, hm_raw = roll_p(h), roll_m(h)
    slp = 0.5 * (hp_raw - hm_raw)
    dMx = jnp.maximum(jnp.maximum(hp_raw, hm_raw), h) - h
    dMn = h - jnp.minimum(jnp.minimum(hp_raw, hm_raw), h)
    slp = jnp.sign(slp) * jnp.minimum(jnp.abs(slp),
                                      2.0 * jnp.minimum(dMx, dMn))
    slp = jnp.where(m_p * mask * m_m > 0.0, slp, 0.0)
    one6 = 1.0 / 6.0
    h_W = 0.5 * (h_m + h) + one6 * (roll_m(slp) - slp)
    h_E = 0.5 * (h_p + h) + one6 * (slp - roll_p(slp))
    curv = 3.0 * (h_W + h_E - 2.0 * h)
    dh = h_E - h_W
    interior_min = (curv > 0.0) & (jnp.abs(dh) < curv)
    denom = curv * curv + 3.0 * dh * dh
    need_scale = 12.0 * curv * (h - h_min2) < denom
    scale = jnp.where(denom > 0.0,
                      12.0 * curv * jnp.maximum(h - h_min2, 0.0)
                      / jnp.where(denom > 0.0, denom, 1.0), 1.0)
    flat = interior_min & (h <= h_min2)
    shrink = interior_min & (~flat) & need_scale
    h_W = jnp.where(flat, h, jnp.where(shrink, h + scale * (h_W - h),
                                       h_W))
    h_E = jnp.where(flat, h, jnp.where(shrink, h + scale * (h_E - h),
                                       h_E))
    return h_W, h_E


def _flux(u, h, h_W, h_E, dt, dlen, Idx_up, Idx_dn, face_mask, vr,
          roll_p):
    """Upwind PPM face flux + velocity derivative (zonal_flux_layer,
    MOM_continuity_PPM.F90:640-706)."""
    h_dn = roll_p(h)
    hW_dn = roll_p(h_W)
    hE_dn = roll_p(h_E)
    cfl_p = u * dt * Idx_up
    cfl_m = -u * dt * Idx_dn
    curv3_p = h_W + h_E - 2.0 * h
    flux_p = dlen * u * (
        h_E + cfl_p * (0.5 * (h_W - h_E) + curv3_p * (cfl_p - 1.5)))
    marg_p = h_E + cfl_p * ((h_W - h_E) + 3.0 * curv3_p
                            * (cfl_p - 1.0))
    curv3_m = hW_dn + hE_dn - 2.0 * h_dn
    flux_m = dlen * u * (
        hW_dn + cfl_m * (0.5 * (hE_dn - hW_dn)
                         + curv3_m * (cfl_m - 1.5)))
    marg_m = hW_dn + cfl_m * ((hE_dn - hW_dn) + 3.0 * curv3_m
                              * (cfl_m - 1.0))
    pos = u > 0.0
    neg = u < 0.0
    flux = jnp.where(pos, flux_p,
                     jnp.where(neg, flux_m, 0.0)) * face_mask
    h_marg = jnp.where(pos, marg_p,
                       jnp.where(neg, marg_m, 0.5 * (hW_dn + h_E)))
    dfdu = dlen * h_marg * vr * face_mask
    return flux, dfdu


def _sweep(vel, h, vr, hbt, dt, dlen, Idx_up, Idx_dn, Iarea, mask_f,
           mask_t, du_lim, cfg, roll_p, roll_m, h_min, h_min2):
    """One directional sweep: edges + Newton transport matching +
    final flux + thickness update, all VMEM-resident.  The Newton
    iteration is a fori_loop so Mosaic compiles ONE flux evaluation,
    not newton_iters copies."""
    h_W, h_E = _edges(h, mask_t, roll_p, roll_m, h_min2)

    def newton(_, du):
        u_try = vel + vr * du[None]
        flux, dfdu = _flux(u_try, h, h_W, h_E, dt, dlen, Idx_up,
                           Idx_dn, mask_f, vr, roll_p)
        err = jnp.sum(flux, axis=0) - hbt
        denom = jnp.sum(dfdu, axis=0)
        step = -err / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        return jnp.clip(du + step, -du_lim, du_lim)

    du = jax.lax.fori_loop(0, cfg.newton_iters, newton,
                           jnp.zeros_like(hbt))
    u_cor = vel + vr * du[None]
    flux, _ = _flux(u_cor, h, h_W, h_E, dt, dlen, Idx_up, Idx_dn,
                    mask_f, vr, roll_p)
    h_new = jnp.maximum(h - dt * Iarea * (flux - roll_m(flux)), h_min)
    return h_new, flux, u_cor


def _mk_rolls(interpret_mode):
    from jax.experimental.pallas import tpu as pltpu

    def _rl(f, sh, ax):
        if interpret_mode:
            return jnp.roll(f, sh, axis=ax)
        size = f.shape[ax]
        return pltpu.roll(f, sh % size, axis=f.ndim + ax)
    return _rl


def _kernel_x(u_ref, h_ref, vru_ref, ub_ref, g_ref,
              h_out, uh_out, ucor_out,
              *, dt, cfg, h_min, interpret_mode):
    """Row-blocked x-sweep: lane shifts only, so no row halo at all.
    g_ref stacks (dyCu, IdxT, IdxT_ip1, IareaT, maskCu, dxCu, maskT)."""
    _rl = _mk_rolls(interpret_mode)
    u = u_ref[...]
    h = h_ref[...]
    vru = vru_ref[...]
    uhbt = ub_ref[...][0]
    gw = g_ref[...]
    dyCu, IdxT, IdxT_ip1, IareaT, maskCu, dxCu, maskT = \
        [gw[i] for i in range(7)]

    def roll_p(f):
        return _rl(f, -1, -1)

    def roll_m(f):
        return _rl(f, 1, -1)

    h1, uh, u_cor = _sweep(
        u, h, vru, uhbt, dt, dyCu, IdxT, IdxT_ip1, IareaT, maskCu,
        maskT, cfg.cfl_limit * dxCu / dt, cfg, roll_p, roll_m,
        h_min, 2.0 * h_min)
    h_out[...] = h1
    uh_out[...] = uh
    ucor_out[...] = u_cor


def _kernel_x_tiled(u0, u1, u2, h0, hh1, hh2, r0, r1, r2,
                    b0, b1, b2, g0, g1, g2,
                    h_out, uh_out, ucor_out,
                    *, dt, cfg, h_min, nbl, interpret_mode):
    """Lane-tiled x-sweep for rows too wide for whole-row VMEM blocks
    (OM4-class 1440+ lanes).  Each (TJ, LTX) output block recomputes
    the sweep on a 3*LTX-lane window assembled from three lane-shifted
    copies of every input (clamped to consecutive tiles at the walls,
    so the window always covers three REAL neighboring tiles).  The
    3-lane stencil reach stays inside the window for every output
    lane; the lane-roll wraparound at the window edge only corrupts
    lanes that are domain halo at the array walls."""
    from jax.experimental import pallas as pl
    _rl = _mk_rolls(interpret_mode)

    def cat(a, b, c):
        return jnp.concatenate([a[...], b[...], c[...]], axis=-1)

    u = cat(u0, u1, u2)
    h = cat(h0, hh1, hh2)
    vru = cat(r0, r1, r2)
    uhbt = cat(b0, b1, b2)[0]
    gw = cat(g0, g1, g2)
    dyCu, IdxT, IdxT_ip1, IareaT, maskCu, dxCu, maskT = \
        [gw[i] for i in range(7)]

    def roll_p(f):
        return _rl(f, -1, -1)

    def roll_m(f):
        return _rl(f, 1, -1)

    h1, uh, u_cor = _sweep(
        u, h, vru, uhbt, dt, dyCu, IdxT, IdxT_ip1, IareaT, maskCu,
        maskT, cfg.cfl_limit * dxCu / dt, cfg, roll_p, roll_m,
        h_min, 2.0 * h_min)

    # which third of the window this program's output tile occupies:
    # pos = i - base, base = clip(i-1, 0, nbl-3)
    pid = pl.program_id(1)
    pos = pid - jnp.clip(pid - 1, 0, nbl - 3)
    for p in range(3):
        @pl.when(pos == p)
        def _(p=p):
            sl = slice(p * LTX, (p + 1) * LTX)
            h_out[...] = h1[:, :, sl]
            uh_out[...] = uh[:, :, sl]
            ucor_out[...] = u_cor[:, :, sl]


def _run_tiled(g9, vgrid, vel, h, vr, bt, dt, cfg, interpret):
    """Launch the lane-tiled sweep: 2-D (row-block, lane-tile) grid,
    every input passed three times with lane-shifted index maps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nk, njh, nih = h.shape
    nbj, nbl = njh // TJ, nih // LTX
    assert nbl >= 3, "lane-tiled sweep needs >= 3 lane tiles"

    def win_specs(nc):
        return [pl.BlockSpec(
            (nc, TJ, LTX),
            lambda j, i, o=o: (0, j, jnp.clip(i - 1, 0, nbl - 3) + o),
            memory_space=pltpu.VMEM) for o in range(3)]

    in_specs = (win_specs(nk) + win_specs(nk) + win_specs(nk)
                + win_specs(1) + win_specs(7))
    out_spec = pl.BlockSpec((nk, TJ, LTX), lambda j, i: (0, j, i),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_x_tiled, dt=dt, cfg=cfg,
                             h_min=vgrid.angstrom, nbl=nbl,
                             interpret_mode=interpret)
    shp = jax.ShapeDtypeStruct(h.shape, h.dtype)
    return pl.pallas_call(
        kern, grid=(nbj, nbl),
        in_specs=in_specs,
        out_specs=(out_spec,) * 3,
        out_shape=(shp,) * 3,
        interpret=interpret,
    )(vel, vel, vel, h, h, h, vr, vr, vr, bt, bt, bt, g9, g9, g9)


def _force_tiled():
    import os
    return os.environ.get("MOM6_PALLAS_FORCE_TILED") == "1"


# ---------------------------------------------------------------------
# Fused set_up_BT_cont: the face-area curve fit is the same lane-local
# structure as the sweep (PPM edges + 6 flux probes + pointwise fit),
# so it reuses _edges/_flux inside one kernel per direction
# ---------------------------------------------------------------------

def _btcont_math(u, h, vr, dt, cfg, h_min, dyC, Idx_up, Idx_dn,
                 maskC, maskT, dlenF, roll_p, roll_m):
    """VMEM-resident mirror of continuity_ppm._bt_cont_1dir (probe the
    layered flux at the zero-transport and one-signed CFL-limited
    corrections, fit the 3-segment marginal-area curve).  Returns the
    (6, TJ, L) stack (FA_far_minus, FA_0_minus, FA_0_plus,
    FA_far_plus, u_turn_minus, u_turn_plus)."""
    h_W, h_E = _edges(h, maskT, roll_p, roll_m, 2.0 * h_min)
    du_lim = cfg.cfl_limit * dlenF / dt

    def fl(du):
        return _flux(u + vr * du[None], h, h_W, h_E, dt, dyC,
                     Idx_up, Idx_dn, maskC, vr, roll_p)

    def newton(_, du0):
        flux, dfdu = fl(du0)
        err = jnp.sum(flux, axis=0)
        denom = jnp.sum(dfdu, axis=0)
        step = -err / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        return jnp.clip(du0 + step, -du_lim, du_lim)

    du0 = jax.lax.fori_loop(0, 3, newton, jnp.zeros_like(du_lim))
    du_max = du_lim
    du_cfl = 1.0e-6 * dlenF / dt
    vr_max = jnp.max(vr, axis=0)
    vr_lim = jnp.maximum(vr, 0.1 * vr_max[None]) + 1e-30
    duL_req = jnp.max((du_cfl[None] * vr - u) / vr_lim, axis=0)
    duL = jnp.clip(jnp.maximum(du0 + du_cfl, duL_req), 0.0, du_max)
    duR_req = jnp.min(-(u + du_cfl[None] * vr) / vr_lim, axis=0)
    duR = jnp.clip(jnp.minimum(du0 - du_cfl, duR_req), -du_max, 0.0)

    def probe(du):
        flux, dfdu = fl(du)
        return jnp.sum(flux, axis=0), jnp.sum(dfdu, axis=0)

    _, fa_0 = probe(du0)
    uh_l, fa_l = probe(duL)
    uh_r, fa_r = probe(duR)

    def fit(d_probe, uh_tot, fa_far):
        d_safe = jnp.where(d_probe != 0.0, d_probe, 1.0)
        fa_avg = jnp.where(d_probe != 0.0, uh_tot / d_safe, fa_0)
        hi = jnp.maximum(fa_0, fa_far)
        lo = jnp.minimum(fa_0, fa_far)
        fa0_adj = jnp.where(fa_avg < lo, fa_avg, fa_0)
        fa_avg = jnp.clip(fa_avg, lo, hi)
        denom = fa_far - fa0_adj
        degen = jnp.abs(denom) <= 1e-12 * jnp.abs(fa0_adj)
        u_turn = jnp.where(
            degen, 0.0,
            (1.5 * d_probe) * ((fa_far - fa_avg)
                               / jnp.where(degen, 1.0, denom)))
        return fa0_adj, u_turn

    fa_w0, u_ww = fit(duL - du0, uh_l, fa_l)
    fa_e0, u_ee = fit(duR - du0, uh_r, fa_r)
    u_ww = jnp.maximum(u_ww, 0.0)
    u_ee = jnp.minimum(u_ee, 0.0)
    return jnp.stack([fa_r, fa_e0, fa_w0, fa_l, u_ee, u_ww], axis=0)


def _kernel_bt(u_ref, h_ref, vr_ref, g_ref, out_ref,
               *, dt, cfg, h_min, interpret_mode):
    """Row-blocked BT_cont curve fit; g_ref uses the SAME 7-field
    stack layout as _kernel_x (IareaT is unused here)."""
    _rl = _mk_rolls(interpret_mode)
    u = u_ref[...]
    h = h_ref[...]
    vr = vr_ref[...]
    gw = g_ref[...]
    dyC, Idx_up, Idx_dn, _unused, maskC, dlenF, maskT = \
        [gw[i] for i in range(7)]

    def roll_p(f):
        return _rl(f, -1, -1)

    def roll_m(f):
        return _rl(f, 1, -1)

    out_ref[...] = _btcont_math(u, h, vr, dt, cfg, h_min, dyC,
                                Idx_up, Idx_dn, maskC, maskT, dlenF,
                                roll_p, roll_m)


def _kernel_bt_tiled(u0, u1, u2, h0, hh1, hh2, r0, r1, r2,
                     g0, g1, g2, out_ref,
                     *, dt, cfg, h_min, nbl, interpret_mode):
    """Lane-tiled BT_cont curve fit (same windowing as
    _kernel_x_tiled)."""
    from jax.experimental import pallas as pl
    _rl = _mk_rolls(interpret_mode)

    def cat(a, b, c):
        return jnp.concatenate([a[...], b[...], c[...]], axis=-1)

    u = cat(u0, u1, u2)
    h = cat(h0, hh1, hh2)
    vr = cat(r0, r1, r2)
    gw = cat(g0, g1, g2)
    dyC, Idx_up, Idx_dn, _unused, maskC, dlenF, maskT = \
        [gw[i] for i in range(7)]

    def roll_p(f):
        return _rl(f, -1, -1)

    def roll_m(f):
        return _rl(f, 1, -1)

    res = _btcont_math(u, h, vr, dt, cfg, h_min, dyC, Idx_up,
                       Idx_dn, maskC, maskT, dlenF, roll_p, roll_m)
    pid = pl.program_id(1)
    pos = pid - jnp.clip(pid - 1, 0, nbl - 3)
    for p in range(3):
        @pl.when(pos == p)
        def _(p=p):
            out_ref[...] = res[:, :, p * LTX:(p + 1) * LTX]


def _run_btcont(g9, vgrid, vel, h, vr, dt, cfg, interpret):
    """One direction's curve fit: direct row-blocked when the row fits
    VMEM, lane-tiled otherwise.  Returns a (6, njh, nih) stack."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nk, njh, nih = h.shape
    shp = jax.ShapeDtypeStruct((6, njh, nih), h.dtype)
    if not _fits_direct(nk, nih) or _force_tiled():
        nbj, nbl = njh // TJ, nih // LTX
        assert nbl >= 3, "lane-tiled BT_cont needs >= 3 lane tiles"

        def win_specs(nc):
            return [pl.BlockSpec(
                (nc, TJ, LTX),
                lambda j, i, o=o: (0, j,
                                   jnp.clip(i - 1, 0, nbl - 3) + o),
                memory_space=pltpu.VMEM) for o in range(3)]

        kern = functools.partial(_kernel_bt_tiled, dt=dt, cfg=cfg,
                                 h_min=vgrid.angstrom, nbl=nbl,
                                 interpret_mode=interpret)
        return pl.pallas_call(
            kern, grid=(nbj, nbl),
            in_specs=(win_specs(nk) + win_specs(nk) + win_specs(nk)
                      + win_specs(7)),
            out_specs=pl.BlockSpec((6, TJ, LTX), lambda j, i: (0, j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=shp,
            interpret=interpret,
        )(vel, vel, vel, h, h, h, vr, vr, vr, g9, g9, g9)

    nb = njh // TJ
    spec3 = pl.BlockSpec((nk, TJ, nih), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    specg = pl.BlockSpec((7, TJ, nih), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_bt, dt=dt, cfg=cfg,
                             h_min=vgrid.angstrom,
                             interpret_mode=interpret)
    return pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[spec3, spec3, spec3, specg],
        out_specs=pl.BlockSpec((6, TJ, nih), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=shp,
        interpret=interpret,
    )(vel, h, vr, g9)


def set_up_bt_cont_pallas(grid: Grid, vgrid: VerticalGrid, u, v, h,
                          dt, cfg: ContinuityCfg,
                          visc_rem_u=None, visc_rem_v=None,
                          interpret: bool = False):
    """Drop-in fused replacement for continuity_ppm.set_up_bt_cont
    (set_up_BT_cont, MOM_continuity_PPM.F90:757): both directions'
    PPM edges + 6 flux probes + curve fits run in VMEM-resident
    kernels instead of ~16 XLA phase-boundary round trips."""
    from mom6_tpu.core.continuity_ppm import BTContFaces
    from mom6_tpu.parallel.stencil import ip1, jp1
    import dataclasses as _dc

    nk, njh, nih = h.shape
    vr_u = visc_rem_u if visc_rem_u is not None else jnp.ones_like(u)
    vr_v = visc_rem_v if visc_rem_v is not None else jnp.ones_like(v)

    nih_pad = -(-nih // 128) * 128
    njh_pad = -(-njh // 128) * 128
    pad_n = nih_pad - nih
    pad_j = njh_pad - njh

    def _pad(f):
        if pad_n == 0 and pad_j == 0:
            return f
        widths = ([(0, 0)] * (f.ndim - 2)
                  + [(0, pad_j), (0, pad_n)])
        return jnp.pad(f, widths)

    gp = grid
    if pad_n or pad_j:
        gp = _dc.replace(
            grid,
            **{name: _pad(getattr(grid, name))
               for name in ("dyCu", "IdxT", "IareaT", "mask2dCu",
                            "dxCu", "mask2dT", "dxCv", "IdyT",
                            "mask2dCv", "dyCv")})
    uu = _pad(u.astype(h.dtype))
    vv = _pad(v.astype(h.dtype))
    hh = _pad(h)
    vru = _pad(vr_u.astype(h.dtype))
    vrv = _pad(vr_v.astype(h.dtype))

    def T2(f):
        return jnp.swapaxes(f, -1, -2)

    gx = jnp.stack([gp.dyCu, gp.IdxT, ip1(gp.IdxT), gp.IareaT,
                    gp.mask2dCu, gp.dxCu, gp.mask2dT],
                   axis=0).astype(h.dtype)
    res_x = _run_btcont(gx, vgrid, uu, hh, vru, dt, cfg, interpret)

    gy = jnp.stack([gp.dxCv, gp.IdyT, jp1(gp.IdyT), gp.IareaT,
                    gp.mask2dCv, gp.dyCv, gp.mask2dT],
                   axis=0).astype(h.dtype)
    res_yT = _run_btcont(T2(gy), vgrid, T2(vv), T2(hh), T2(vrv), dt,
                         cfg, interpret)
    res_y = T2(res_yT)

    def _unpad(f):
        if pad_n == 0 and pad_j == 0:
            return f
        return f[..., :njh, :nih]

    rx = [_unpad(res_x[i]) for i in range(6)]
    ry = [_unpad(res_y[i]) for i in range(6)]
    return BTContFaces(FA_u_EE=rx[0], FA_u_E0=rx[1], FA_u_W0=rx[2],
                       FA_u_WW=rx[3], uBT_EE=rx[4], uBT_WW=rx[5],
                       FA_v_NN=ry[0], FA_v_N0=ry[1], FA_v_S0=ry[2],
                       FA_v_SS=ry[3], vBT_NN=ry[4], vBT_SS=ry[5])


def _run_x(grid, vgrid, u, h, vr_u, uhbt, dt, cfg, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mom6_tpu.parallel.stencil import ip1

    nk, njh, nih = h.shape
    nb = njh // TJ
    gx = jnp.stack([grid.dyCu, grid.IdxT, ip1(grid.IdxT),
                    grid.IareaT, grid.mask2dCu, grid.dxCu,
                    grid.mask2dT], axis=0).astype(h.dtype)
    if not _fits_direct(nk, nih) or _force_tiled():
        return _run_tiled(gx, vgrid, u, h, vr_u, uhbt[None], dt, cfg,
                          interpret)
    spec3 = pl.BlockSpec((nk, TJ, nih), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((1, TJ, nih), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    specg = pl.BlockSpec((7, TJ, nih), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_x, dt=dt, cfg=cfg,
                             h_min=vgrid.angstrom,
                             interpret_mode=interpret)
    shp = jax.ShapeDtypeStruct(h.shape, h.dtype)
    return pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[spec3, spec3, spec3, spec2, specg],
        out_specs=(spec3,) * 3,
        out_shape=(shp,) * 3,
        interpret=interpret,
    )(u, h, vr_u, uhbt[None], gx)


def _run_y(grid, vgrid, v, h, vr_v, vhbt, dt, cfg, interpret):
    """y-sweep via the PROVEN row-local kernel on transposed arrays:
    swapping rows and lanes turns the y-direction (row-shift) sweep
    into a lane-shift sweep, so the same no-halo row-blocked kernel
    applies; the y-direction grid constants map onto the x-kernel's
    slots (dlen=dxCv, Idx_up=IdyT, Idx_dn=jp1(IdyT), du_lim from
    dyCv).  Two tiled transposes per field (~0.5 ms total at
    512x512x25) buy a kernel that fits VMEM with no windowed blocks
    (the windowed variant wanted 32 MB of scoped VMEM vs the chip's
    16 MB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mom6_tpu.parallel.stencil import jp1

    nk, njh, nih = h.shape

    def T2(f):
        return jnp.swapaxes(f, -1, -2)

    gy = jnp.stack([grid.dxCv, grid.IdyT, jp1(grid.IdyT),
                    grid.IareaT, grid.mask2dCv, grid.dyCv,
                    grid.mask2dT], axis=0).astype(h.dtype)
    gyT = T2(gy)

    if not _fits_direct(nk, njh) or _force_tiled():
        # transposed lanes (= rows) too wide for whole-row blocks:
        # the lane-tiled sweep on the transposed arrays
        h2T, vhT, vcorT = _run_tiled(gyT, vgrid, T2(v), T2(h),
                                     T2(vr_v), T2(vhbt)[None], dt,
                                     cfg, interpret)
        return T2(h2T), T2(vhT), T2(vcorT)

    nbT = nih // TJ   # transposed row count = lane count, TJ-blocked
    spec3 = pl.BlockSpec((nk, TJ, njh), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((1, TJ, njh), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    specg = pl.BlockSpec((7, TJ, njh), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_x, dt=dt, cfg=cfg,
                             h_min=vgrid.angstrom,
                             interpret_mode=interpret)
    shpT = jax.ShapeDtypeStruct((nk, nih, njh), h.dtype)
    h2T, vhT, vcorT = pl.pallas_call(
        kern, grid=(nbT,),
        in_specs=[spec3, spec3, spec3, spec2, specg],
        out_specs=(spec3,) * 3,
        out_shape=(shpT,) * 3,
        interpret=interpret,
    )(T2(v), T2(h), T2(vr_v), T2(vhbt)[None], gyT)
    return T2(h2T), T2(vhT), T2(vcorT)


def continuity_ppm_pallas(grid: Grid, vgrid: VerticalGrid, u, v, h,
                          dt, cfg: ContinuityCfg,
                          uhbt, vhbt, visc_rem_u, visc_rem_v,
                          x_first: bool = True,
                          interpret: bool = False) -> ContinuityResult:
    """Drop-in fused replacement for continuity_ppm with transport
    matching (uhbt/vhbt required).  Output halos are NOT valid —
    exactly like the jnp path, the caller refreshes them."""
    nk, njh, nih = h.shape
    vr_u = visc_rem_u if visc_rem_u is not None else jnp.ones_like(u)
    vr_v = visc_rem_v if visc_rem_v is not None else jnp.ones_like(v)

    # Mosaic lane tiling: zero-pad BOTH horizontal axes to 128
    # multiples — the y-sweep runs transposed, so the row axis
    # becomes its lane axis and non-multiple widths force Mosaic
    # into unpadded relayouts that blow the 16 MB scoped-VMEM budget.
    # The rolls wrap through the pad, corrupting only pad/halo
    # rows+columns the caller refreshes anyway.
    nih_pad = -(-nih // 128) * 128
    njh_pad = -(-njh // 128) * 128
    pad_n = nih_pad - nih
    pad_j = njh_pad - njh

    def _pad(f):
        if pad_n == 0 and pad_j == 0:
            return f
        widths = ([(0, 0)] * (f.ndim - 2)
                  + [(0, pad_j), (0, pad_n)])
        return jnp.pad(f, widths)

    import dataclasses as _dc
    gp = grid
    if pad_n:
        gp = _dc.replace(
            grid,
            **{name: _pad(getattr(grid, name))
               for name in ("dyCu", "IdxT", "IareaT", "mask2dCu",
                            "dxCu", "mask2dT", "dxCv", "IdyT",
                            "mask2dCv", "dyCv")})
    uu = _pad(u.astype(h.dtype))
    vv = _pad(v.astype(h.dtype))
    hh = _pad(h)
    vru = _pad(vr_u.astype(h.dtype))
    vrv = _pad(vr_v.astype(h.dtype))
    ub = _pad(uhbt.astype(h.dtype))
    vb = _pad(vhbt.astype(h.dtype))

    if x_first:
        h1, uh, u_cor = _run_x(gp, vgrid, uu, hh, vru, ub, dt, cfg,
                               interpret)
        h2, vh, v_cor = _run_y(gp, vgrid, vv, h1, vrv, vb, dt, cfg,
                               interpret)
    else:
        h1, vh, v_cor = _run_y(gp, vgrid, vv, hh, vrv, vb, dt, cfg,
                               interpret)
        h2, uh, u_cor = _run_x(gp, vgrid, uu, h1, vru, ub, dt, cfg,
                               interpret)

    def _unpad(f):
        if pad_n == 0 and pad_j == 0:
            return f
        return f[..., :njh, :nih]

    return ContinuityResult(h=_unpad(h2), uh=_unpad(uh),
                            vh=_unpad(vh), u_cor=_unpad(u_cor),
                            v_cor=_unpad(v_cor))
