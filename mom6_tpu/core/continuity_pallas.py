"""Fused Pallas TPU kernel for the PPM continuity step.

The jnp continuity path (continuity_ppm.py) is a pipeline of ~30
stencil phases per call — PPM edge reconstruction, 7 Newton flux
evaluations per direction, the final flux, and the thickness update —
and XLA materializes many phase boundaries to HBM.  At 512x512x25
that phase-boundary traffic, not FLOPs, is the cost.  This kernel
runs the ENTIRE directionally-split update (x-sweep PPM edges +
Newton transport matching + flux + h update, then the y-sweep of the
same) in VMEM for a block of rows: each input field is DMA'd from
HBM once per block (a TJ+2*NPAD-row window), each output written
once.

Blocking: the x-sweep is row-local, so only the y-sweep needs north/
south neighbors — halo-ring recompute: the x-sweep runs on NPAD
extra rows each side of the block, giving the y-sweep the valid h1
neighbors it needs.  Windows are clamped at the domain walls, which
only corrupts rows that lie inside the array-edge halo (the caller
guarantees halo >= NPAD+1 and refreshes halos after the call, like
the jnp path).

Semantics mirror continuity_ppm formula-for-formula (same Newton
iteration count, same limiter); equivalence is tested to fp32
roundoff in tests/test_continuity_pallas.py.

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

__all__ = ["continuity_ppm_pallas", "pallas_continuity_supported"]

TJ = 8        # output rows per grid step
# the y-sweep stencil reaches 3 rows out of an output row (PPM edge
# -> slope -> neighbor-h chain, + the southward vh in the h update);
# the DMA window must also be (8,128)-TILE-ALIGNED in HBM (Mosaic
# rejects misaligned memref slices), so each block reads the three
# aligned TJ-row blocks around it: W = 3*TJ, start = TJ*(j-1)
# clamped at the walls.  Corrupted wall-window rows fall inside the
# domain halo (halo >= 4 > stencil reach 3)
W_ROWS = 3 * TJ


def pallas_continuity_supported(cfg: ContinuityCfg, grid_shape,
                                obc=None, porous=False) -> bool:
    """The fused kernel covers the production configuration: full PPM
    (not upwind/simple-2nd), positive-definite limiter, no porous
    barriers, no OBC coupling, njh divisible by TJ."""
    nk, njh, nih = grid_shape
    return (not cfg.upwind_1st and not cfg.simple_2nd
            and not cfg.monotonic and not cfg.vol_cfl
            and obc is None and not porous
            and njh % TJ == 0 and njh >= W_ROWS)


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
    iteration is a fori_loop so Mosaic compiles ONE flux evaluation
    per sweep, not newton_iters copies (the unrolled form blew the
    TPU compile time past 13 minutes)."""
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


def _kernel(u_hbm, v_hbm, h_hbm, vru_hbm, vrv_hbm, ub_hbm, vb_hbm,
            g_hbm, h_out, uh_out, vh_out, ucor_out, vcor_out,
            *, dt, cfg, h_min, x_first, njh, interpret_mode=False):
    """Fused two-sweep continuity on a TJ+2*NPAD-row window, DMA'd
    from HBM.  g_hbm stacks the 2-D grid constants (dyCu, IdxT,
    IareaT, maskCu, dxCu, dxCv, IdyT, maskCv, maskT, dyCv)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = W_ROWS
    j = pl.program_id(0)
    start = jnp.clip((j - 1) * TJ, 0, njh - W)   # tile-aligned
    off = j * TJ - start              # output rows inside the window

    nk = u_hbm.shape[0]
    nih = u_hbm.shape[-1]
    dtype = h_out.dtype

    def body(uw, vw, hw, vruw, vrvw, ubw, vbw, gww, sems):
        copies = [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start, W), :], uw, sems.at[0]),
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(start, W), :], vw, sems.at[1]),
            pltpu.make_async_copy(
                h_hbm.at[:, pl.ds(start, W), :], hw, sems.at[2]),
            pltpu.make_async_copy(
                vru_hbm.at[:, pl.ds(start, W), :], vruw, sems.at[3]),
            pltpu.make_async_copy(
                vrv_hbm.at[:, pl.ds(start, W), :], vrvw, sems.at[4]),
            pltpu.make_async_copy(
                ub_hbm.at[pl.ds(start, W), :], ubw, sems.at[5]),
            pltpu.make_async_copy(
                vb_hbm.at[pl.ds(start, W), :], vbw, sems.at[6]),
            pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(start, W), :], gww, sems.at[7]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        u = uw[...]
        v = vw[...]
        h = hw[...]
        vru = vruw[...]
        vrv = vrvw[...]
        uhbt = ubw[...]
        vhbt = vbw[...]
        gw = gww[...]
        (dyCu, IdxT, IareaT, maskCu, dxCu, dxCv, IdyT, maskCv,
         maskT, dyCv) = [gw[i] for i in range(10)]

        h_min2 = 2.0 * h_min

        # mosaic-native circular shifts (pltpu.roll); jnp.roll's
        # slice+concat lowering stalled the TPU compile
        def _rl(f, sh, ax):
            if interpret_mode:
                return jnp.roll(f, sh, axis=ax)
            # pltpu.roll requires a non-negative shift
            size = f.shape[ax]
            return pltpu.roll(f, sh % size, axis=f.ndim + ax)

        def roll_xp(f):
            return _rl(f, -1, -1)

        def roll_xm(f):
            return _rl(f, 1, -1)

        def roll_yp(f):
            return _rl(f, -1, -2)

        def roll_ym(f):
            return _rl(f, 1, -2)

        du_lim_x = cfg.cfl_limit * dxCu / dt
        du_lim_y = cfg.cfl_limit * dyCv / dt

        def x_sweep(hx):
            return _sweep(u, hx, vru, uhbt, dt, dyCu, IdxT,
                          roll_xp(IdxT), IareaT, maskCu, maskT,
                          du_lim_x, cfg, roll_xp, roll_xm,
                          h_min, h_min2)

        def y_sweep(hy):
            return _sweep(v, hy, vrv, vhbt, dt, dxCv, IdyT,
                          roll_yp(IdyT), IareaT, maskCv, maskT,
                          du_lim_y, cfg, roll_yp, roll_ym,
                          h_min, h_min2)

        if x_first:
            h1, uh, u_cor = x_sweep(h)
            h2, vh, v_cor = y_sweep(h1)
        else:
            h1, vh, v_cor = y_sweep(h)
            h2, uh, u_cor = x_sweep(h1)

        # Mosaic cannot dynamic-slice VALUES, so the (three-valued)
        # window offset selects one of three static slices: off=0 at
        # the south wall, 2*NPAD at the north wall, NPAD elsewhere
        def write(o):
            h_out[...] = h2[:, o:o + TJ, :]
            uh_out[...] = uh[:, o:o + TJ, :]
            vh_out[...] = vh[:, o:o + TJ, :]
            ucor_out[...] = u_cor[:, o:o + TJ, :]
            vcor_out[...] = v_cor[:, o:o + TJ, :]

        @pl.when(off == 0)
        def _():
            write(0)

        @pl.when(off == TJ)
        def _():
            write(TJ)

        @pl.when(off == 2 * TJ)
        def _():
            write(2 * TJ)

    pl.run_scoped(
        body,
        pltpu.VMEM((nk, W, nih), dtype),
        pltpu.VMEM((nk, W, nih), dtype),
        pltpu.VMEM((nk, W, nih), dtype),
        pltpu.VMEM((nk, W, nih), dtype),
        pltpu.VMEM((nk, W, nih), dtype),
        pltpu.VMEM((W, nih), dtype),
        pltpu.VMEM((W, nih), dtype),
        pltpu.VMEM((10, W, nih), dtype),
        pltpu.SemaphoreType.DMA((8,)),
    )


def continuity_ppm_pallas(grid: Grid, vgrid: VerticalGrid, u, v, h,
                          dt, cfg: ContinuityCfg,
                          uhbt, vhbt, visc_rem_u, visc_rem_v,
                          x_first: bool = True,
                          interpret: bool = False) -> ContinuityResult:
    """Drop-in fused replacement for continuity_ppm with transport
    matching (uhbt/vhbt required).  Output halos are NOT valid —
    exactly like the jnp path, the caller refreshes them."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nk, njh, nih = h.shape
    nb = njh // TJ
    vr_u = visc_rem_u if visc_rem_u is not None else jnp.ones_like(u)
    vr_v = visc_rem_v if visc_rem_v is not None else jnp.ones_like(v)
    gconst = jnp.stack([grid.dyCu, grid.IdxT, grid.IareaT,
                        grid.mask2dCu, grid.dxCu, grid.dxCv,
                        grid.IdyT, grid.mask2dCv, grid.mask2dT,
                        grid.dyCv], axis=0).astype(h.dtype)

    kern = functools.partial(_kernel, dt=dt, cfg=cfg,
                             h_min=vgrid.angstrom, x_first=x_first,
                             njh=njh, interpret_mode=interpret)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((nk, TJ, nih), lambda j: (0, j, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct(h.shape, h.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[any_spec] * 8,
        out_specs=(out_spec,) * 5,
        out_shape=(shp,) * 5,
        interpret=interpret,
    )(u.astype(h.dtype), v.astype(h.dtype), h,
      vr_u.astype(h.dtype), vr_v.astype(h.dtype),
      uhbt.astype(h.dtype), vhbt.astype(h.dtype), gconst)
    h_new, uh, vh, u_cor, v_cor = outs
    return ContinuityResult(h=h_new, uh=uh, vh=vh, u_cor=u_cor,
                            v_cor=v_cor)
