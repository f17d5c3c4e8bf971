"""ALE orchestration: regrid then conservatively remap the state.

Re-design of /root/reference/src/ALE/MOM_ALE.F90: ALE_regrid (:484),
ALE_remap_tracers (:737), ALE_remap_set_h_vel (:870) and
ALE_remap_velocities (:1061): build the new vertical grid from the
evolved state, then remap tracers on cell columns and velocities on
face columns (source/target face thicknesses are the arithmetic means
of the adjacent cell columns).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mom6_tpu.ale.regridding import RegridCfg, build_grid
from mom6_tpu.ale.remapping import RemapCfg, remap_column_means
from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["ALECfg", "ale_regrid_remap"]


@dataclasses.dataclass(frozen=True)
class ALECfg:
    regrid: RegridCfg = RegridCfg()
    remap: RemapCfg = RemapCfg()
    vel_remap: RemapCfg = RemapCfg(scheme="PPM_H4")
    # hybgen unmixing before a HYCOM1 regrid (MOM_ALE.F90:475,
    # MOM_hybgen_unmix.F90); None disables
    hybgen_unmix: Optional["HybgenUnmixCfg"] = None
    # grid-motion time filter (REGRID_TIME_SCALE +
    # REGRID_FILTER_SHALLOW/DEEP_DEPTH, MOM_ALE.F90:274,
    # filtered_grid_motion): blends the target grid with the old one,
    # full filtering below the deep depth, none above the shallow one,
    # cubic in between; 0 disables
    regrid_time_scale: float = 0.0
    filter_shallow_depth: float = 0.0
    filter_deep_depth: float = 0.0
    # ALE_SEQUENTIAL_REMAP: remap fields one at a time behind
    # optimization barriers instead of stacking each group into one
    # batched call.  Slower (geometry recomputed per field) but caps
    # the live-temporary set at one field's worth — the HBM lever for
    # production grid sizes where the stacked remap's concurrent
    # buffers dominate the thermo executable's footprint.
    sequential_remap: bool = False
    # ALE_REMAP_BAND: evaluate only the near-diagonal (dst interface,
    # src cell) pairs of the per-step remap (|k-m| <= band), falling
    # back to the full pair space through lax.cond when violated
    # (exact either way).  MEASURED SLOWER at nk=25/512² on TPU v5e
    # (37 vs 21 ms for a 3-field remap: the per-offset k-axis gathers
    # outweigh the pair-space savings), so default OFF; retained for
    # potential deep-nk configurations.  0 disables.
    remap_band: int = 0


def _filter_grid_motion(cfg: ALECfg, h_old, h_new, dt: float):
    """Time-filtered interface motion (filtered_grid_motion,
    MOM_regridding.F90:1022, simplified to fixed per-depth weights):
    w(z) = 1 above the shallow filter depth, dt/(tau+dt) below the
    deep one, a cubic blend between, applied to the interface depths
    so the final grid relaxes toward the target with timescale
    REGRID_TIME_SCALE."""
    tau = cfg.regrid_time_scale
    w_deep = dt / (tau + dt)
    z_old = jnp.concatenate([jnp.zeros_like(h_old[:1]),
                             jnp.cumsum(h_old, axis=0)], axis=0)
    z_new = jnp.concatenate([jnp.zeros_like(h_new[:1]),
                             jnp.cumsum(h_new, axis=0)], axis=0)
    zs, zd = cfg.filter_shallow_depth, cfg.filter_deep_depth
    frac = jnp.clip((z_old - zs) / max(zd - zs, 1e-30), 0.0, 1.0) \
        if zd > zs else (z_old > zs).astype(h_old.dtype)
    s = frac * frac * (3.0 - 2.0 * frac)            # cubic profile
    w = 1.0 - s * (1.0 - w_deep)
    z_f = z_old + w * (z_new - z_old)
    z_f = jax.lax.associative_scan(jnp.maximum, z_f, axis=0)
    z_f = z_f.at[-1].set(z_new[-1])                 # pin the bottom
    return jnp.maximum(z_f[1:] - z_f[:-1], 0.0)


@jax.named_scope("ale")
def ale_regrid_remap(grid: Grid, vgrid: VerticalGrid, state: State,
                     cfg: ALECfg, eos=None,
                     tracers: dict | None = None,
                     aux_u: dict | None = None,
                     aux_v: dict | None = None, dt: float = 0.0):
    """One ALE step: (state, tracers) on h → same on the new grid.

    aux_u/aux_v: optional extra face-staggered layer fields to remap
    onto the new grid with the velocity face-thickness rule (the
    split scheme's u_av/v_av auxiliaries; remap_dyn_split_RK2_aux_vars,
    MOM_dynamics_split_RK2.F90:1273).
    Returns (new_state, new_tracers, h_new, aux_u, aux_v)."""
    h = state.h
    if (cfg.hybgen_unmix is not None and eos is not None
            and state.T is not None):
        from mom6_tpu.ale.hybgen_unmix import hybgen_unmix
        h_u, T_u, S_u, tr_u = hybgen_unmix(
            h, state.T, state.S, tracers, eos, vgrid.Rlay,
            cfg.hybgen_unmix)
        state = state.replace(h=h_u, T=T_u, S=S_u)
        if tracers is not None:
            tracers = tr_u
        h = h_u
    h_new = build_grid(cfg.regrid, h, grid.bathyT, state.T, state.S, eos,
                       rlay=vgrid.Rlay, rho0=vgrid.Rho0, g=vgrid.g_Earth,
                       mask2dT=grid.mask2dT)
    if cfg.regrid_time_scale > 0.0 and dt > 0.0:
        h_new = _filter_grid_motion(cfg, h, h_new, dt)

    # batch every field sharing a (h_src, h_dst) column pair into ONE
    # remap call (fields stacked on a broadcast axis): the
    # reconstruction geometry and sub-cell overlap masks are computed
    # once per pair instead of once per field — the dominant cost of
    # remap_column_means is pair-space geometry, not the field reduces
    if cfg.remap_band > 0:
        from mom6_tpu.ale.remapping import remap_column_means_banded

        def _remap(hs, f, hd, rcfg):
            return remap_column_means_banded(hs, f, hd,
                                             cfg.remap_band, rcfg)
    else:
        _remap = remap_column_means

    def remap_batch(h_src, fields, h_dst, rcfg):
        if not fields:
            return []
        if cfg.sequential_remap:
            import jax as _jax
            out = []
            carry = (h_src, h_dst)
            for f in fields:
                hs, hd = carry
                r = _remap(hs, f, hd, rcfg)
                # barrier: the next field's remap may not start until
                # this one's temporaries are dead
                r, hs, hd = _jax.lax.optimization_barrier(
                    (r, hs, hd))
                carry = (hs, hd)
                out.append(r)
            return out
        if len(fields) == 1:
            return [_remap(h_src, fields[0], h_dst, rcfg)]
        stk = jnp.stack(fields, axis=1)          # (nk, F, nj, ni)
        out = _remap(h_src[:, None], stk, h_dst[:, None], rcfg)
        return [out[:, i] for i in range(len(fields))]

    t_fields, t_names = [], []
    if state.T is not None:
        t_fields += [state.T, state.S]
        t_names += ["__T", "__S"]
    if tracers is not None:
        for k, v in tracers.items():
            t_fields.append(v)
            t_names.append(k)
    t_out = dict(zip(t_names,
                     remap_batch(h, t_fields, h_new, cfg.remap)))
    T_new = t_out.pop("__T", None)
    S_new = t_out.pop("__S", None)
    new_tracers = t_out if tracers is not None else None

    # velocities: face-column thicknesses (ALE_remap_set_h_vel)
    h_u_src = 0.5 * (h + ip1(h))
    h_u_dst = 0.5 * (h_new + ip1(h_new))
    h_v_src = 0.5 * (h + jp1(h))
    h_v_dst = 0.5 * (h_new + jp1(h_new))
    u_fields = [state.u] + (list(aux_u.values()) if aux_u else [])
    v_fields = [state.v] + (list(aux_v.values()) if aux_v else [])
    u_out = [f * grid.mask2dCu for f in
             remap_batch(h_u_src, u_fields, h_u_dst, cfg.vel_remap)]
    v_out = [f * grid.mask2dCv for f in
             remap_batch(h_v_src, v_fields, h_v_dst, cfg.vel_remap)]
    u_new, v_new = u_out[0], v_out[0]
    aux_u_new = aux_v_new = None
    if aux_u is not None:
        aux_u_new = dict(zip(aux_u.keys(), u_out[1:]))
    if aux_v is not None:
        aux_v_new = dict(zip(aux_v.keys(), v_out[1:]))

    new_state = state.replace(u=u_new, v=v_new, h=h_new, T=T_new, S=S_new)
    return new_state, new_tracers, h_new, aux_u_new, aux_v_new


def ale_regrid_accelerated(grid: Grid, vgrid: VerticalGrid,
                           state: State, cfg: ALECfg, n_itt: int,
                           eos=None, tracers: dict | None = None):
    """Iterated regridding for initialization spin-up
    (ALE_regrid_accelerated, /root/reference/src/ALE/MOM_ALE.F90:609):
    regrid n_itt times, carrying only working copies of (h, T, S)
    between iterations so the target coordinate converges toward its
    attractor (z-climatology initial states can sit far from a RHO or
    HYCOM coordinate's equilibrium), then remap the FULL original
    state (u, v, tracers, T, S) once from the original grid onto the
    final one — minimizing accumulated remap diffusion.
    Returns (new_state, new_tracers, h_final)."""
    from mom6_tpu.ale.regridding import build_grid
    h_orig = state.h
    h = state.h
    T, S = state.T, state.S
    for _ in range(max(n_itt, 1)):
        h_new = build_grid(cfg.regrid, h, grid.bathyT, T, S, eos,
                           rlay=vgrid.Rlay, rho0=vgrid.Rho0,
                           g=vgrid.g_Earth, mask2dT=grid.mask2dT)
        if T is not None:
            stk = jnp.stack([T, S], axis=1)
            out = remap_column_means(h[:, None], stk, h_new[:, None],
                                     cfg.remap)
            T, S = out[:, 0], out[:, 1]
        h = h_new
    # single final remap of the complete state from the ORIGINAL grid
    # onto the converged one (one remap's worth of diffusion total)
    h_f = h
    fields = []
    names = []
    if state.T is not None:
        fields += [state.T, state.S]
        names += ["__T", "__S"]
    if tracers is not None:
        for k, v in tracers.items():
            fields.append(v)
            names.append(k)
    outs = {}
    if fields:
        stk = jnp.stack(fields, axis=1)
        rem = remap_column_means(h_orig[:, None], stk, h_f[:, None],
                                 cfg.remap)
        outs = {n: rem[:, i] for i, n in enumerate(names)}
    h_u_src = 0.5 * (h_orig + ip1(h_orig))
    h_u_dst = 0.5 * (h_f + ip1(h_f))
    h_v_src = 0.5 * (h_orig + jp1(h_orig))
    h_v_dst = 0.5 * (h_f + jp1(h_f))
    u_new = remap_column_means(h_u_src, state.u, h_u_dst,
                               cfg.vel_remap) * grid.mask2dCu
    v_new = remap_column_means(h_v_src, state.v, h_v_dst,
                               cfg.vel_remap) * grid.mask2dCv
    new_state = state.replace(h=h_f, u=u_new, v=v_new,
                              T=outs.pop("__T", None),
                              S=outs.pop("__S", None))
    new_tracers = outs if tracers is not None else None
    return new_state, new_tracers, h_f
