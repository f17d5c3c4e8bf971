"""Implicit vertical viscosity (and the visc_rem coupling fractions).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_vert_friction.F90: `vertvisc_coef` (:1168) builds interface
coupling coefficients a = Kv/dz and face thicknesses; `vertvisc`
(:526) performs the layer-thickness-weighted implicit tridiagonal
solve per velocity column including surface stress and bottom drag;
`vertvisc_remnant` (:1064) computes the fraction of momentum (or of a
barotropic acceleration) a layer retains through the implicit solve —
the visc_rem_u/v arrays threaded through continuity and the barotropic
solver; `vertvisc_limit_vel` (:2259) truncates CFL-violating
velocities.

The sequential-in-k Thomas recursion runs as a `lax.scan` over layers,
vectorized across the whole (njh, nih) horizontal block — columns are
the vector lanes, layers the (short) sequential axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["VertViscCfg", "vertvisc_coef", "vertvisc", "vertvisc_remnant",
           "vertvisc_limit_vel", "implicit_visc_solve"]

_H_NEGLECT = 1e-20


@dataclasses.dataclass(frozen=True)
class VertViscCfg:
    kv: float = 1e-4              # KV background vertical viscosity [m2 s-1]
    hbbl: float = 10.0            # HBBL near-bottom averaging depth [m]
    cdrag: float = 0.003          # CDRAG quadratic bottom drag
    drag_bg_vel: float = 0.0      # DRAG_BG_VEL [m s-1]
    bottomdraglaw: bool = True    # BOTTOMDRAGLAW (quadratic via BBL)
    linear_drag: bool = False     # LINEAR_DRAG
    # MAXVEL default matches the reference's effectively-off 3.0e8
    # (MOM_vert_friction.F90:2719); a small cap silently clips fast
    # flows (gravity currents, solitons, hurricanes)
    maxvel: float = 3.0e8         # MAXVEL truncation [m s-1]
    cfl_trunc: float = 0.5        # CFL_TRUNCATE (ref default 0.5)
    channel_drag: bool = False    # CHANNEL_DRAG (side-wall Rayleigh drag)
    # stratified/rotational BBL thickness (set_viscous_BBL,
    # MOM_set_viscosity.F90:800-860): the drag acts over
    # h_bbl = h_N/(1/2+sqrt(1/4+(2f h_N/u*)^2)), h_N the KW99
    # stratification limit, instead of the fixed HBBL
    dynamic_bbl: bool = True
    bbl_thick_min: float = 0.1    # BBL_THICK_MIN [m]
    kv_bbl_min: float = 1e-4      # KV_BBL_MIN [m2 s-1]
    # surface viscous mixed layer (set_viscous_ML,
    # MOM_set_viscosity.F90:1898 + the vertvisc_coef LOTW floor,
    # MOM_vert_friction.F90:2190): within the viscous ML the interface
    # coupling is floored by a log-layer x Ekman-limited profile built
    # from the surface friction velocity.  'fixed' uses HMIX_FIXED;
    # 'dynamic' the Ekman depth  min(D, ml_ekman_coeff*ustar/|f|)
    # (the unstratified limit of the reference's bulk-Ri search; the
    # stratified refinement lives in the KPP/ePBL BLD used by the
    # diabatic path).  '' disables.
    visc_ml_mode: str = ""        # '', 'fixed', 'dynamic'
    hmix_fixed: float = 20.0      # HMIX_FIXED [m]
    # DIRECT_STRESS: wind stress as a body force over the topmost
    # HMIX_STRESS of fluid instead of a surface boundary condition
    direct_stress: bool = False
    hmix_stress: float = 20.0     # HMIX_STRESS [m]
    # HARMONIC_VISC: harmonic (vs arithmetic) mean thicknesses in the
    # interior viscous coupling (MOM_vert_friction.F90:121-128)
    harmonic_visc: bool = False
    # BBL_USE_EOS (MOM_set_viscosity.F90:336,462): the BBL
    # stratification ladder uses in-situ EOS density differences from
    # T/S instead of the coordinate Rlay targets
    bbl_use_eos: bool = False
    ml_ekman_coeff: float = 0.5   # decay-scale coefficient [nondim]
    vonkar: float = 0.41          # VON_KARMAN
    # KV_ML_INVZ2 (MOM_vert_friction.F90:1877-1888): extra near-
    # surface viscosity decaying as 1/z^2 (z in units of HMIX_FIXED)
    # — the vintage massless-layer guard used without a surface
    # boundary-layer scheme
    kv_ml_invz2: float = 0.0      # [m2 s-1]


class ViscCoefs(NamedTuple):
    a_u: jnp.ndarray     # (nk+1, njh, nih) coupling coeff at u columns [m s-1]
    a_v: jnp.ndarray
    h_u: jnp.ndarray     # (nk, njh, nih) effective thickness at u faces [m]
    h_v: jnp.ndarray
    ray_u: jnp.ndarray | None = None   # (nk, ...) Rayleigh drag [m s-1]
    ray_v: jnp.ndarray | None = None


class BBLInfo(NamedTuple):
    """Per-face bottom-boundary-layer state (set_viscous_BBL output:
    the visc%kv_bbl_u / bbl_thick_u analogs)."""
    piston_u: jnp.ndarray    # kv_bbl/bbl_thick at u faces [m s-1]
    thick_u: jnp.ndarray     # BBL thickness at u faces [m]
    piston_v: jnp.ndarray
    thick_v: jnp.ndarray


def _hab_interfaces(h_face):
    """Height of interfaces above the bottom (K=0..nk; [-1]=0)."""
    return jnp.concatenate(
        [jnp.cumsum(h_face[::-1], axis=0)[::-1],
         jnp.zeros_like(h_face[:1])], axis=0)


@jax.named_scope("set_viscous_bbl")
def set_viscous_bbl(grid: Grid, u, v, h,
                    cfg: VertViscCfg = VertViscCfg(),
                    vgrid=None, T=None, S=None, eos=None) -> BBLInfo:
    """Bottom-boundary-layer piston velocity and thickness at u/v
    faces (set_viscous_BBL, MOM_set_viscosity.F90): the near-bottom
    velocity is averaged over the bottom HBBL meters,
    u* = √(cdrag)·√(u_bbl²+u_bg²), the BBL thickness is limited by
    stratification (the KW99 limit h_N ≈ 20u*/N, integrated through
    the layered Δρ ladder, :761) and rotation (h_f = u*/2f) through
    h_bbl = h_N/(½+√(¼+(2f h_N/u*)²)) (:832-845), and the bottom
    viscosity kv_bbl = √(cdrag)·u*·h_bbl gives the drag-law stress
    when the shear occupies h_bbl.  With cfg.dynamic_bbl False (or no
    vgrid) this collapses to the fixed-HBBL drag-law piston.

    Like the reference, this is meant to be computed ONCE per dynamics
    step from the pre-step state and reused by every vertvisc_coef
    call within the step.
    """
    nk = h.shape[0]

    # reduced gravities across interior interfaces for the
    # stratification-limited BBL (layered ladder; ALE-mode runs
    # carry their stratification in Rlay only weakly and mostly see
    # the rotational limit)
    gp_int = None
    gp_u = gp_v = None
    if (cfg.bbl_use_eos and cfg.dynamic_bbl and vgrid is not None
            and T is not None and S is not None and eos is not None):
        # BBL_USE_EOS: interface reduced gravities from the actual
        # T/S stratification (locally-referenced potential density
        # difference across each interior interface,
        # MOM_set_viscosity.F90:462-520)
        z_int = jnp.cumsum(h, axis=0)[:-1]
        p_int = vgrid.Rho0 * vgrid.g_Earth * z_int
        drho = eos.density(T[1:], S[1:], p_int) \
            - eos.density(T[:-1], S[:-1], p_int)
        gp_h = jnp.maximum(vgrid.g_Earth * drho / vgrid.Rho0, 0.0)
        gp_u = 0.5 * (gp_h + ip1(gp_h))
        gp_v = 0.5 * (gp_h + jp1(gp_h))
    elif vgrid is not None and cfg.dynamic_bbl:
        import numpy as _np
        rl = _np.asarray(vgrid.Rlay)
        gp = _np.maximum(vgrid.g_Earth * (rl[1:] - rl[:-1])
                         / vgrid.Rho0, 0.0)
        gp_int = jnp.asarray(gp.reshape((-1,) + (1,) * (h.ndim - 1)))

    def face_bbl(h_face, umag2_face, absf, gp_face=None):
        hab = _hab_interfaces(h_face)
        if cfg.linear_drag:
            piston = cfg.cdrag * cfg.drag_bg_vel \
                * jnp.ones_like(h_face[0])
            return piston, jnp.full_like(h_face[0], cfg.hbbl)
        # |u| averaged over the bottom HBBL meters (:627)
        w = jnp.clip(cfg.hbbl - hab[1:], 0.0, h_face) / cfg.hbbl
        u_bbl2 = jnp.sum(w * umag2_face, axis=0) \
            / jnp.maximum(jnp.sum(w, axis=0), 1e-10)
        ustar = jnp.sqrt(cfg.cdrag * (u_bbl2 + cfg.drag_bg_vel ** 2))
        if gp_face is None:
            gp_face = gp_int
        if gp_face is not None and nk > 1:
            # KW99 stratification limit: the largest height h with
            # Σ_{K below h} g'_K (h − hab_K) ≤ 400 u*²
            targ = 400.0 * ustar * ustar
            habi = hab[1:nk]            # interior interfaces
            # gcum[k] = Σ_{j>=k} g'_j: stratification felt by heights
            # in the segment ABOVE interface k (the interface-k term
            # vanishes at h = habi[k], so the same sums also evaluate
            # f(habi[k]) for the reachability test)
            gcum = jnp.cumsum(gp_face[::-1], axis=0)[::-1]
            gh = jnp.cumsum((gp_face * habi)[::-1], axis=0)[::-1]
            lhs = habi * gcum - gh
            ok = lhs <= targ[None]
            # per-segment crossing: h = (targ + Σg'hab)/Σg', valid
            # between this interface and the one above it
            ub = jnp.concatenate([hab[:1], habi[:-1]], axis=0)
            h_cand = jnp.where(
                gcum > 0.0,
                (targ[None] + gh) / jnp.maximum(gcum, 1e-30), ub)
            h_cand = jnp.clip(h_cand, habi, ub)
            h_n = jnp.max(jnp.where(ok, h_cand, 0.0), axis=0)
            h_n = jnp.where(jnp.any(ok, axis=0), h_n,
                            cfg.bbl_thick_min)
            h_n = jnp.minimum(h_n, hab[0])
            # rotational limit, guarded for u*→0
            ust = jnp.maximum(ustar, 1e-12)
            root = jnp.sqrt(0.25 * ust * ust
                            + (2.0 * absf * h_n) ** 2)
            bbl_thick = jnp.maximum(
                (h_n * ust) / (0.5 * ust + root), cfg.bbl_thick_min)
        else:
            # no stratification information: fixed-HBBL behavior
            bbl_thick = jnp.full_like(h_face[0], cfg.hbbl)
        kv_bbl = jnp.maximum(jnp.sqrt(cfg.cdrag) * ustar * bbl_thick,
                             cfg.kv_bbl_min)
        piston = kv_bbl / jnp.maximum(bbl_thick, cfg.bbl_thick_min)
        return piston, bbl_thick

    h_u = 0.5 * (h + ip1(h))
    h_v = 0.5 * (h + jp1(h))
    # squared speed at faces (the cross-component averaged over the 4
    # surrounding faces, :698 set_viscous_BBL)
    from mom6_tpu.parallel.stencil import im1, jm1
    v_at_u = 0.25 * ((v + ip1(v)) + jm1(v + ip1(v)))
    u_at_v = 0.25 * ((u + jp1(u)) + im1(u + jp1(u)))
    fq = jnp.abs(grid.CoriolisBu)
    pu, tu = face_bbl(h_u, u * u + v_at_u * v_at_u,
                      0.5 * (fq + jm1(fq)), gp_face=gp_u)
    pv, tv = face_bbl(h_v, v * v + u_at_v * u_at_v,
                      0.5 * (fq + im1(fq)), gp_face=gp_v)
    return BBLInfo(piston_u=pu, thick_u=tu, piston_v=pv, thick_v=tv)


def surface_ustar(grid: Grid, rho0: float, forces):
    """Surface friction velocity at h points from the wind stress
    (the forces%ustar the reference's set_viscous_ML consumes):
    u* = sqrt(|tau|/rho0)."""
    from mom6_tpu.parallel.stencil import im1, jm1
    tx = forces.taux if forces.taux is not None else 0.0
    ty = forces.tauy if forces.tauy is not None else 0.0
    tx_h = 0.5 * (tx + im1(tx)) if forces.taux is not None else 0.0
    ty_h = 0.5 * (ty + jm1(ty)) if forces.tauy is not None else 0.0
    tau = jnp.sqrt(tx_h * tx_h + ty_h * ty_h + 1e-60)
    return jnp.sqrt(tau / rho0) * grid.mask2dT


@jax.named_scope("vertvisc_coef")
def vertvisc_coef(grid: Grid, u, v, h, kv_int=None,
                  cfg: VertViscCfg = VertViscCfg(),
                  vgrid=None, bbl: BBLInfo | None = None,
                  ustar=None) -> ViscCoefs:
    """Build interface coupling coefficients at u and v columns.

    kv_int: optional (nk+1, njh, nih) interface viscosity at h points
    (from set_diffusivity/CVMix); defaults to the constant cfg.kv.
    ustar: optional (njh, nih) surface friction velocity at h points
    [m s-1] enabling the viscous-mixed-layer coupling floor
    (cfg.visc_ml_mode).

    The bottom coupling uses the set_viscous_BBL piston velocity and
    BBL thickness (``bbl``, computed once per step; recomputed here
    from (u, v, h) when not supplied), slaving every interface within
    the BBL to the drag so near-bottom massless layers do not
    free-slip above it (MOM_vert_friction.F90 vertvisc_coef).
    """
    nk = h.shape[0]
    if cfg.bottomdraglaw and bbl is None:
        bbl = set_viscous_bbl(grid, u, v, h, cfg, vgrid)

    def ml_floor(a_int, h_face, ust_face, absf):
        """Viscous-ML coupling floor (MOM_vert_friction.F90:2190):
        visc_ml = z(h_ml - z) * kappa u*^2 / (|f| z(h_ml - z)
        + h_ml u*), with the log-layer a_floor = (h_ml - z) *
        ustar2_denom, both taken as maxima against the interior
        coupling within the ML."""
        htot = jnp.sum(h_face, axis=0)
        if cfg.visc_ml_mode == "fixed":
            h_ml = jnp.minimum(cfg.hmix_fixed, htot)
        else:                                  # 'dynamic' Ekman depth
            h_ml = jnp.minimum(
                htot, cfg.ml_ekman_coeff * ust_face
                / jnp.maximum(absf, 1e-10))
        z_t = jnp.cumsum(h_face[:-1], axis=0)   # interfaces K=1..nk-1
        temp1 = jnp.maximum(z_t * (h_ml[None] - z_t), 0.0)
        denom = (absf[None] * temp1
                 + (h_ml + _H_NEGLECT)[None] * ust_face[None])
        u2d = (cfg.vonkar * ust_face ** 2)[None] \
            / jnp.maximum(denom, 1e-30)
        a_ml = temp1 * u2d / (0.25 * (h_face[1:] + h_face[:-1])
                              + _H_NEGLECT)
        a_floor = jnp.maximum(h_ml[None] - z_t, 0.0) * u2d
        in_ml = (z_t < h_ml[None]) & (ust_face[None] > 0.0)
        return jnp.where(in_ml,
                         jnp.maximum(a_int,
                                     jnp.maximum(a_ml, a_floor)),
                         a_int)

    def face_coefs(h_face, kv_face, piston, bbl_thick, ust_face,
                   absf):
        # interior interfaces K=1..nk-1: a = Kv / dz between layer
        # centers; HARMONIC_VISC uses the harmonic mean spacing,
        # which lets thin layers decouple (the Hallberg layered-mode
        # preference, MOM_vert_friction.F90:121)
        if cfg.harmonic_visc:
            dz = (h_face[:-1] * h_face[1:]) \
                / (h_face[:-1] + h_face[1:] + _H_NEGLECT) \
                + _H_NEGLECT
        else:
            dz = 0.5 * (h_face[:-1] + h_face[1:]) + _H_NEGLECT
        kv_in = kv_face[1:-1]
        if cfg.kv_ml_invz2 > 0.0:
            # Kv += KV_ML_INVZ2 / (z^2 (1 + 0.09 z^6)), z the
            # interface depth in units of HMIX_FIXED
            # (MOM_vert_friction.F90:1877-1888)
            i_hmix = 1.0 / (cfg.hmix_fixed + _H_NEGLECT)
            z_t = (jnp.cumsum(h_face[:-1], axis=0)
                   + _H_NEGLECT) * i_hmix
            kv_in = kv_in + cfg.kv_ml_invz2 / (
                (z_t * z_t) * (1.0 + 0.09 * z_t ** 6))
        a_int = kv_in / dz
        if cfg.visc_ml_mode and ust_face is not None:
            a_int = ml_floor(a_int, h_face, ust_face, absf)
        a_top = jnp.zeros_like(h_face[0])[None]
        if not cfg.bottomdraglaw:
            a_bot = (kv_face[-1] / (0.5 * h_face[-1] + _H_NEGLECT))[None]
            return jnp.concatenate([a_top, a_int, a_bot], axis=0)
        a_bot = (piston + kv_face[-1] / (0.5 * h_face[-1]
                                         + 0.5 * cfg.hbbl))[None]
        hab = _hab_interfaces(h_face)
        in_bbl = hab[1:nk] < bbl_thick[None]
        a_int = jnp.where(in_bbl, jnp.maximum(a_int, piston[None]),
                          a_int)
        return jnp.concatenate([a_top, a_int, a_bot], axis=0)

    h_u = 0.5 * (h + ip1(h))
    h_v = 0.5 * (h + jp1(h))
    if kv_int is None:
        kv_u = jnp.full((nk + 1,) + h.shape[1:], cfg.kv, h.dtype)
        kv_v = kv_u
    else:
        kv_u = 0.5 * (kv_int + ip1(kv_int))
        kv_v = 0.5 * (kv_int + jp1(kv_int))

    pu = bbl.piston_u if bbl is not None else None
    tu = bbl.thick_u if bbl is not None else None
    pv = bbl.piston_v if bbl is not None else None
    tv = bbl.thick_v if bbl is not None else None
    if ustar is not None:
        from mom6_tpu.parallel.stencil import im1 as _im1, jm1 as _jm1
        ust_u = 0.5 * (ustar + ip1(ustar))
        ust_v = 0.5 * (ustar + jp1(ustar))
        fq = jnp.abs(grid.CoriolisBu)
        absf_u = 0.5 * (fq + _jm1(fq))
        absf_v = 0.5 * (fq + _im1(fq))
    else:
        ust_u = ust_v = absf_u = absf_v = None
    a_u = face_coefs(h_u, kv_u, pu, tu, ust_u, absf_u) \
        * grid.mask2dCu[None]
    a_v = face_coefs(h_v, kv_v, pv, tv, ust_v, absf_v) \
        * grid.mask2dCv[None]

    ray_u = ray_v = None
    if cfg.channel_drag:
        # Side-wall (channel) drag, MOM_set_viscosity.F90
        # set_viscous_BBL CHANNEL_DRAG branch: at a face between cells
        # of unequal depth, the part of the column deeper than the
        # shallow side flows along exposed topography and feels a
        # Rayleigh drag from the drag law, scaled by how far below the
        # shallow bottom the layer sits.  This is what keeps massless
        # layers banked against topography from free-slipping to the
        # MAXVEL cap.
        def channel_ray(h_face, u_face, d_a, d_b):
            d_sh = jnp.minimum(d_a, d_b)
            d_dp = jnp.maximum(d_a, d_b)
            z_c = jnp.cumsum(h_face, axis=0) - 0.5 * h_face
            frac = jnp.clip((z_c - d_sh[None])
                            / jnp.maximum(d_dp - d_sh, 1e-9)[None],
                            0.0, 1.0)
            return cfg.cdrag * (jnp.abs(u_face)
                                + cfg.drag_bg_vel) * frac

        ray_u = channel_ray(h_u, u, grid.bathyT, ip1(grid.bathyT)) \
            * grid.mask2dCu[None]
        ray_v = channel_ray(h_v, v, grid.bathyT, jp1(grid.bathyT)) \
            * grid.mask2dCv[None]
    return ViscCoefs(a_u=a_u, a_v=a_v, h_u=h_u, h_v=h_v,
                     ray_u=ray_u, ray_v=ray_v)


def implicit_visc_solve(u, h_col, a, dt, rhs_extra=None, ray=None):
    """Thickness-weighted implicit viscosity Thomas solve.

    Solves (h + dt*L) u' = h*u (+ rhs_extra in layer 0), where L is the
    tridiagonal coupling through interface coefficients a (nk+1 levels)
    plus Rayleigh drag ray (nk levels).  Exactly the recursion of
    MOM_vert_friction.F90 vertvisc (:656-707), vectorized over columns.
    """
    nk = u.shape[0]
    if ray is None:
        ray = jnp.zeros_like(u)
    rhs = h_col * u
    if rhs_extra is not None:
        rhs = rhs.at[0].add(rhs_extra)

    a_top = a[:-1]      # a(K) for layer k (top interface)
    a_bot = a[1:]       # a(K+1) (bottom interface)

    def fwd(carry, xs):
        b1_prev, d1_prev, u_prev = carry
        h_k, ray_k, a_t, a_b, rhs_k = xs
        c1_k = dt * a_t * b1_prev
        b_denom = h_k + dt * (ray_k + a_t * d1_prev)
        b1 = 1.0 / (b_denom + dt * a_b)
        d1 = b_denom * b1
        u_k = (rhs_k + dt * a_t * u_prev) * b1
        return (b1, d1, u_k), (u_k, c1_k)

    ones = jnp.ones_like(u[0])
    zeros = jnp.zeros_like(u[0])
    (_, _, _), (u_fwd, c1) = jax.lax.scan(
        fwd, (zeros, ones, zeros), (h_col, ray, a_top, a_bot, rhs))

    def bwd(u_next, xs):
        u_k, c1_next = xs
        u_new = u_k + c1_next * u_next
        return u_new, u_new

    # backward substitution from k=nk-1 down
    _, u_rev = jax.lax.scan(
        bwd, u_fwd[-1],
        (u_fwd[:-1][::-1], c1[1:][::-1]))
    return jnp.concatenate([u_rev[::-1], u_fwd[-1:]], axis=0)


@jax.named_scope("vertvisc")
def vertvisc(grid: Grid, u, v, h, coefs: ViscCoefs, dt,
             taux=None, tauy=None, rho0: float = 1035.0,
             ray_u=None, ray_v=None,
             direct_stress: bool = False,
             hmix_stress: float = 20.0):
    """Apply the implicit viscosity solve to both velocity components.

    taux/tauy: surface stress [Pa] at u/v points.  With
    ``direct_stress`` the stress enters as a body force spread over
    the topmost ``hmix_stress`` of fluid instead of a surface
    boundary condition (DIRECT_STRESS / HMIX_STRESS,
    MOM_vert_friction.F90:666-683)."""
    stress_u = None if taux is None else (dt / rho0) * taux * grid.mask2dCu
    stress_v = None if tauy is None else (dt / rho0) * tauy * grid.mask2dCv
    hu = coefs.h_u + _H_NEGLECT
    hv = coefs.h_v + _H_NEGLECT
    if direct_stress:
        def body(vel, stress, h_face):
            if stress is None:
                return vel
            # fraction of each layer within the top hmix_stress
            z_top = jnp.concatenate(
                [jnp.zeros_like(h_face[:1]),
                 jnp.cumsum(h_face, axis=0)], axis=0)
            hfr = (jnp.clip(hmix_stress - z_top[:-1], 0.0,
                            h_face + _H_NEGLECT)
                   / (h_face + _H_NEGLECT))
            return vel + (stress / hmix_stress)[None] * hfr \
                * (h_face > _H_NEGLECT)
        u = body(u, stress_u, hu)
        v = body(v, stress_v, hv)
        stress_u = stress_v = None
    ray_u = coefs.ray_u if ray_u is None else ray_u
    ray_v = coefs.ray_v if ray_v is None else ray_v
    u_new = implicit_visc_solve(u, hu, coefs.a_u, dt, stress_u, ray_u)
    v_new = implicit_visc_solve(v, hv, coefs.a_v, dt, stress_v, ray_v)
    return u_new * grid.mask2dCu, v_new * grid.mask2dCv


@jax.named_scope("vertvisc_remnant")
def vertvisc_remnant(grid: Grid, coefs: ViscCoefs, dt):
    """visc_rem_u/v: fraction of barotropic acceleration each layer
    retains through the implicit solve (vertvisc_remnant,
    MOM_vert_friction.F90:1064) — the solve applied to u≡1."""
    ones_u = jnp.ones_like(coefs.h_u)
    ones_v = jnp.ones_like(coefs.h_v)
    hu = coefs.h_u + _H_NEGLECT
    hv = coefs.h_v + _H_NEGLECT
    rem_u = implicit_visc_solve(ones_u, hu, coefs.a_u, dt,
                                ray=coefs.ray_u)
    rem_v = implicit_visc_solve(ones_v, hv, coefs.a_v, dt,
                                ray=coefs.ray_v)
    return rem_u * grid.mask2dCu, rem_v * grid.mask2dCv


@jax.named_scope("vertvisc_limit_vel")
def vertvisc_limit_vel(grid: Grid, u, v, dt, cfg: VertViscCfg):
    """CFL + absolute velocity truncation (vertvisc_limit_vel).

    Returns (u, v, trunc_count)."""
    u_lim = jnp.minimum(cfg.cfl_trunc * grid.dxCu / dt, cfg.maxvel)
    v_lim = jnp.minimum(cfg.cfl_trunc * grid.dyCv / dt, cfg.maxvel)
    truncs = (jnp.sum(jnp.abs(u) > u_lim) + jnp.sum(jnp.abs(v) > v_lim))
    u = jnp.clip(u, -u_lim, u_lim)
    v = jnp.clip(v, -v_lim, v_lim)
    return u, v, truncs
