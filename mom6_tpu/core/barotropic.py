"""Barotropic (2D shallow-water) solver for split time stepping.

Re-design of /root/reference/src/core/MOM_barotropic.F90:423 btstep:
subcycles the vertically-integrated dynamics ``nstep = ceil(dt/dtbt)``
times with a dissipative predictor-corrector (backward weight ``bebt``),
returning time-filtered mean transports (uhbtav), the free surface, and
the per-layer barotropic anomaly accelerations that the baroclinic
update adds to its own accelerations (accel_layer_[uv],
MOM_barotropic.F90:2578).

Key couplings reproduced:
* ``frhat``/``wt`` thickness-fraction weights (btcalc, :3394) project
  layer velocities/accelerations onto the barotropic mode;
* ``gtot_{E,W,N,S}`` effective reduced gravities from ``pbce``;
* Coriolis anomaly about ``Cor_ref`` (the projection of the 3D
  Coriolis acceleration already present in bc_accel) with
  depth-weighted Sadourny-energy averaging (:1439-1487);
* pressure anomaly ``gtot*(eta_PF_BT − eta_PF)`` (:2054);
* per-substep viscous decay ``bt_rem = av_rem**(1/nstep)``;
* transports from the nonlinear BT_cont face-area curves fitted by
  the layered continuity solver (find_uhbt :3683, with the residual
  ``uhbt0`` anchoring the curve to the layered transports :1211),
  falling back to linearized ``Datu*ubt`` without a BT_cont;
* the ``eta_cor`` mass-source correction reconciling the barotropic
  eta with the layered Σh (bt_mass_source :4318, eta_src :1624);
* linearly-ramped filter weights wt_vel/wt_eta with the reverse-
  cumulative wt_trans/wt_accel (:1758-1810, DT_BT_FILTER), so the
  returned eta is the filtered estimate and the mean transports are
  exactly consistent with it.

The substep loop is a ``lax.fori_loop``; with
``wide_halo_period == 1`` it exchanges a 3-ring halo every substep,
and with larger periods it runs the reference's wide-halo
communication-avoiding march (:782-786, :1842-1850): halos 3·period
wide are exchanged once per ``period`` substeps while the valid
region shrinks 3 rings per substep.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["BarotropicCfg", "btstep", "btcalc", "set_dtbt", "BTResult"]

_H_NEGLECT = 1e-20


def _bt_w(domain) -> int:
    return min(3, domain.halo)


@dataclasses.dataclass(frozen=True)
class BarotropicCfg:
    bebt: float = 0.2          # BEBT dissipative backward-Euler weight
    dtbt_frac: float = 0.25    # DTBT<0 fraction of max stable step
    nstep: int = 32            # substeps per baroclinic dt (set_dtbt)
    bt_project: bool = False   # BT_PROJECT_VELOCITY
    coriolis_scale: float = 1.0
    # communication-avoiding wide-halo march (MOM_barotropic.F90
    # :782-786, :1842-1850): exchange halos every ``wide_halo_period``
    # substeps using halos 3x that wide.  1 → exchange every substep.
    wide_halo_period: int = 1
    # DT_BT_FILTER: averaging window for the final velocity/eta
    # (negative → fraction of dt); 0 → no filter (the last substep's
    # values are returned and transports average flat)
    dt_bt_filter: float = -0.25
    # USE_BT_CONT_TYPE: use the continuity-fitted face-area curves
    use_bt_cont: bool = True
    # BT_THICK_SCHEME (MOM_barotropic.F90:4520,3495): per-layer face
    # thickness estimate behind frhat — FROM_BT_CONT (default; HYBRID
    # weights here), HYBRID, ARITHMETIC, HARMONIC
    hvel_scheme: str = "FROM_BT_CONT"
    # BOUND_BT_CORRECTION (MOM_barotropic.F90:1587): cap the eta_cor
    # pseudo mass source by what maxCFL_BT_cont velocities can carry
    bound_bt_corr: bool = False
    # BT_STRONG_DRAG (MOM_barotropic.F90:1513,4641): harmonic-form
    # per-substep viscous remnant n·r/(1+(n-1)·r) — a stronger
    # retarding estimate under strong bottom drag than the geometric
    # r^(1/n) decay
    strong_drag: bool = False
    # SSH_EXTRA [m]: headroom added to the depth in the safe external
    # wave speed of set_dtbt (MOM_barotropic.F90:4697).  0 keeps this
    # build's empirically-tuned subcycle CFL; < 0 selects the
    # reference default min(10 m, 5% of max depth)
    ssh_extra: float = 0.0
    maxcfl_bt_cont: float = 0.25     # MAXCFL_BT_CONT
    # fuse the subcycle into the Pallas TPU kernel when supported
    # (single device, fp32, no OBC; see barotropic_pallas.py)
    use_pallas: bool = True


class BTResult(NamedTuple):
    eta: jnp.ndarray            # final free surface anomaly [m]
    eta_av: jnp.ndarray         # time-mean eta over the step
    uhbtav: jnp.ndarray         # time-mean zonal barotropic transport
    vhbtav: jnp.ndarray
    accel_layer_u: jnp.ndarray  # per-layer BT anomaly accel [m s-2]
    accel_layer_v: jnp.ndarray
    ubt_av: jnp.ndarray         # time-mean barotropic velocities
    vbt_av: jnp.ndarray


def _hvel_weights(h, h1, scheme, d0, d1):
    """Per-layer thickness estimate at a velocity face under the
    BT_THICK_SCHEME options (btcalc, MOM_barotropic.F90:3495-3539):
    ARITHMETIC 0.5(h+h1); HARMONIC 2·h·h1/(h+h1); HYBRID arithmetic
    above the shallower bottom, harmonic below, linearly blended
    across the layer that straddles it."""
    h_arith = 0.5 * (h + h1)
    if scheme == "ARITHMETIC":
        return h_arith
    # h_harm = h·h1/(0.5(h+h1)) = 2·h·h1/(h+h1), the harmonic mean
    # exactly as the reference's (h(i+1)*h(i))/(h_arith+h_neglect)
    h_harm = (h * h1) / (h_arith + _H_NEGLECT)
    if scheme == "HARMONIC":
        return h_harm
    # HYBRID (also the FROM_BT_CONT fallback): interfaces from the
    # mean bottom -0.5(D+D1); layers whose bottom interface is above
    # the SHALLOW bottom -D_min use the arithmetic mean, layers fully
    # below it the harmonic mean, the straddling layer a linear blend
    e_bot = -0.5 * (d0 + d1)
    d_shallow = -jnp.minimum(d0, d1)
    # e_top[k] = e_bot + sum_{j>=k} h_arith[j]
    e_top = e_bot[None] + jnp.cumsum(h_arith[::-1], axis=0)[::-1]
    wt = jnp.clip((e_top - d_shallow[None])
                  / (h_arith + _H_NEGLECT), 0.0, 1.0)
    return wt * h_arith + (1.0 - wt) * h_harm


def btcalc(grid: Grid, h, scheme: str = "ARITHMETIC"):
    """frhatu/frhatv: fraction of total column thickness in each layer
    at u and v faces (btcalc, MOM_barotropic.F90:3482-3560), with the
    BT_THICK_SCHEME face-thickness estimate.  FROM_BT_CONT (the
    reference default) uses the HYBRID weights here: the reference
    derives h_u from the BT_cont face areas in that mode, whose
    zero-flow limit is the same shallow-bottom-aware estimate."""
    sch = "HYBRID" if scheme == "FROM_BT_CONT" else scheme
    if sch not in ("ARITHMETIC", "HARMONIC", "HYBRID"):
        raise ValueError(f"Unknown BT_THICK_SCHEME '{scheme}'")
    h_u = _hvel_weights(h, ip1(h), sch, grid.bathyT, ip1(grid.bathyT))
    h_v = _hvel_weights(h, jp1(h), sch, grid.bathyT, jp1(grid.bathyT))
    frhatu = h_u * (grid.mask2dCu / (jnp.sum(h_u, 0) + _H_NEGLECT))
    frhatv = h_v * (grid.mask2dCv / (jnp.sum(h_v, 0) + _H_NEGLECT))
    return frhatu, frhatv


def set_dtbt(domain: Domain, grid, vgrid, cfg: BarotropicCfg, dt: float,
             max_depth: float | None = None, h=None) -> int:
    """Host-side: number of substeps from the barotropic gravity-wave
    CFL (set_dtbt, MOM_barotropic.F90:2801).  Returns static nstep.

    With ``h`` (current layer thicknesses), the wave speed uses the
    instantaneous total column thickness instead of the resting depth
    — the DTBT_RESET_PERIOD re-estimate of the reference (which calls
    set_dtbt with the evolving eta, MOM_barotropic.F90:2835)."""
    import numpy as np
    if h is not None:
        D = float(jnp.max(jnp.sum(h, axis=0) * grid.mask2dT))
    else:
        D = float(jnp.max(grid.bathyT)) if max_depth is None \
            else max_depth
    # SSH_EXTRA: headroom for how much higher SSH might get, entering
    # the safe external wave speed (MOM_barotropic.F90:4697,4907;
    # default min(10 m, 5% of the maximum depth))
    ssh_extra = cfg.ssh_extra if cfg.ssh_extra >= 0.0 \
        else min(10.0, 0.05 * D)
    c = math.sqrt(vgrid.g_Earth * max(D + ssh_extra, 1.0))
    dx = float(jnp.min(jnp.where(grid.dxT > 0, grid.dxT, jnp.inf)))
    dy = float(jnp.min(jnp.where(grid.dyT > 0, grid.dyT, jnp.inf)))
    dmin = min(dx, dy)
    # Empirical stability of this forward-backward/bebt subcycle: the
    # 2D checkerboard mode requires per-axis CFL ≲ 0.5 (measured:
    # stable at 0.47, unstable at 0.62 — see tests/test_split_rk2).
    dtbt_max = 0.9 * dmin / (2.0 * c)
    nstep = max(1, int(math.ceil(dt / dtbt_max)))
    return nstep


def _bt_curve_consts(fa_far_neg, fa_0_neg, fa_0_pos, fa_far_pos,
                     u_neg, u_pos):
    """Derived cubic-fit constants (set_local_BT_cont_types,
    MOM_barotropic.F90): curvature crv so the cubic matches the linear
    branch's value and slope at the transition velocity, and the
    transport at the transition uh_turn = u_turn·(2·FA_0 + FA_far)/3."""
    def one(fa0, fafar, ut):
        ut2 = ut * ut
        crv = jnp.where(ut2 > 0.0, (fafar - fa0)
                        / jnp.where(ut2 > 0.0, 3.0 * ut2, 1.0), 0.0)
        uh_turn = ut * ((2.0 * fa0 + fafar) / 3.0)
        return crv, uh_turn
    crv_neg, uh_neg = one(fa_0_neg, fa_far_neg, u_neg)
    crv_pos, uh_pos = one(fa_0_pos, fa_far_pos, u_pos)
    return crv_neg, uh_neg, crv_pos, uh_pos


def find_uhbt(u, fa_far_neg, fa_0_neg, fa_0_pos, fa_far_pos,
              u_neg, u_pos, crv_neg, uh_neg, crv_pos, uh_pos):
    """Transport through a face for barotropic velocity u on the
    fitted 3-segment curve (find_uhbt, MOM_barotropic.F90:3683) —
    branch-free where-chain over the whole face array."""
    lin_neg = (u - u_neg) * fa_far_neg + uh_neg
    cub_neg = u * (fa_0_neg + crv_neg * u * u)
    cub_pos = u * (fa_0_pos + crv_pos * u * u)
    lin_pos = (u - u_pos) * fa_far_pos + uh_pos
    return jnp.where(u < u_neg, lin_neg,
                     jnp.where(u < 0.0, cub_neg,
                               jnp.where(u <= u_pos, cub_pos, lin_pos)))


def uhbt_to_ubt(uhbt, fa_far_neg, fa_0_neg, fa_0_pos, fa_far_pos,
                u_neg, u_pos, crv_neg, uh_neg, crv_pos, uh_pos,
                iters: int = 12):
    """Invert the face-area curve: the velocity giving transport uhbt
    (uhbt_to_ubt, MOM_barotropic.F90:3733).  The reference's
    Newton-with-false-position becomes a fixed-count clipped Newton on
    the cubic branches (the linear branches invert in closed form)."""
    # closed-form linear branches
    ub_lin_neg = u_neg + (uhbt - uh_neg) / jnp.where(
        fa_far_neg > 0.0, fa_far_neg, 1.0)
    ub_lin_pos = u_pos + (uhbt - uh_pos) / jnp.where(
        fa_far_pos > 0.0, fa_far_pos, 1.0)
    # cubic branch Newton, bracketed in [u_neg, 0] or [0, u_pos]
    neg_side = uhbt < 0.0
    fa0 = jnp.where(neg_side, fa_0_neg, fa_0_pos)
    crv = jnp.where(neg_side, crv_neg, crv_pos)
    turn = jnp.where(neg_side, u_neg, u_pos)
    uh_t = jnp.where(neg_side, uh_neg, uh_pos)
    safe = jnp.where(jnp.abs(uh_t) > 0.0, uh_t, 1.0)
    ub = turn * jnp.clip(uhbt / safe, 0.0, 1.0)   # false-position seed
    lo = jnp.minimum(turn, 0.0)
    hi = jnp.maximum(turn, 0.0)
    for _ in range(iters):
        err = ub * (fa0 + crv * ub * ub) - uhbt
        slope = fa0 + 3.0 * crv * ub * ub
        ub = jnp.clip(ub - err / jnp.where(jnp.abs(slope) > 1e-30,
                                           slope, 1e-30), lo, hi)
    in_lin_neg = uhbt < uh_neg
    in_lin_pos = uhbt > uh_pos
    out = jnp.where(in_lin_neg, ub_lin_neg,
                    jnp.where(in_lin_pos, ub_lin_pos, ub))
    return jnp.where(uhbt == 0.0, 0.0, out)


def _filter_weights(nstep: int, nfilt: int, total: int, dt_filt: float,
                    dtbt: float, dtype=None):
    """Host-side filter weights (MOM_barotropic.F90:1768-1810): a
    linear ramp of half-width dt_filt centered on substep nstep for
    wt_vel/wt_eta; wt_trans/wt_accel are their reverse cumulative
    sums, making the mean transports exactly consistent with the
    filtered eta.  All normalized; padded with zeros to ``total``."""
    import numpy as np
    N = nstep + nfilt
    wt_vel = np.zeros(total)
    for n in range(1, N + 1):
        if (n == nstep) or (dt_filt - abs(n - nstep) * dtbt >= 0.0):
            wt_vel[n - 1] = 1.0
        elif dtbt + dt_filt - abs(n - nstep) * dtbt > 0.0:
            wt_vel[n - 1] = 1.0 + (dt_filt / dtbt) - abs(n - nstep)
    wt_eta = wt_vel.copy()
    wt_trans = np.zeros(total)
    wt_accel = np.zeros(total)
    acc_t = acc_a = 0.0
    for n in range(N, 0, -1):
        acc_t += wt_eta[n - 1]
        acc_a += wt_vel[n - 1]
        wt_trans[n - 1] = acc_t
        wt_accel[n - 1] = acc_a
    wt_vel /= max(wt_vel.sum(), 1e-300)
    wt_eta /= max(wt_eta.sum(), 1e-300)
    wt_trans /= max(wt_trans.sum(), 1e-300)
    wt_accel /= max(wt_accel.sum(), 1e-300)
    npdt = np.dtype("float32" if dtype == jnp.float32 else "float64")
    # plain HOST numpy: the pallas path embeds these in the kernel
    # call, the jnp path converts at its use site (converting here
    # inside a jit trace would hand back tracers)
    return tuple(w.astype(npdt)
                 for w in (wt_vel, wt_eta, wt_trans, wt_accel))


def _widen_domain(domain: Domain, hw: int) -> Domain:
    return dataclasses.replace(domain, halo=hw)


def _widen(domain: Domain, dw: Domain, f):
    """Re-embed a (njl+2H,...) 2D field into (njl+2Hw,...) padding and
    refresh the wide halos (one exchange)."""
    def one(a):
        inner = domain.interior(a)
        pads = [(0, 0)] * (a.ndim - 2) + [(dw.halo, dw.halo)] * 2
        return jnp.pad(inner, pads)
    wide = jax.tree.map(one, f)
    return dw.fill_halos(wide)


def _narrow(domain: Domain, dw: Domain, f):
    def one(a):
        inner = dw.interior(a)
        pads = [(0, 0)] * (a.ndim - 2) + [(domain.halo, domain.halo)] * 2
        return jnp.pad(inner, pads)
    out = jax.tree.map(one, f)
    return domain.fill_halos(out)



def _fill_bt(domain: Domain, eta, ubt, vbt, width=None):
    """Fill the (eta, ubt, vbt) trio with fold-aware staggering: eta
    is a T scalar, (ubt, vbt) a C-grid vector pair (sign flip across
    a tripolar fold)."""
    if domain.tripolar_n:
        eta = domain.fill_halos(eta, width)
        ubt, vbt = domain.fill_vector_halos(ubt, vbt, width)
        return eta, ubt, vbt
    return domain.fill_halos((eta, ubt, vbt), width)

@jax.named_scope("btstep")
def btstep(domain: Domain, grid: Grid, vgrid: VerticalGrid,
           u_in, v_in, eta_in, h,
           bc_accel_u, bc_accel_v, pbce, u_cor, v_cor,
           dt: float, cfg: BarotropicCfg,
           visc_rem_u=None, visc_rem_v=None,
           taux=None, tauy=None, eta_pf=None,
           nstep: int | None = None, obc=None,
           bt_cont=None, eta_cor=None,
           uhbt_in=None, vhbt_in=None) -> BTResult:
    """One barotropic solve over the baroclinic step dt.

    u_in/v_in: layer velocities whose BT part seeds ubt.
    u_cor/v_cor: velocities used in CorAdCalc (u_av) — the reference
    values for the Coriolis anomaly.
    eta_pf: the eta already used in the 3D pressure force (its
    contribution is in bc_accel; the BT PG applies only anomalies).
    bt_cont: BTContFaces face-area curves from set_up_bt_cont; when
    given (and cfg.use_bt_cont) transports follow the nonlinear curve
    anchored by the layered-transport residual uhbt0 = Σuh −
    find_uhbt(ubt0), with uhbt_in/vhbt_in the layer-summed transports.
    eta_cor: the Σh-vs-eta discrepancy (bt_mass_source) applied as a
    per-substep free-surface source.
    """
    nz = h.shape[0]
    nstep = cfg.nstep if nstep is None else nstep
    dtbt = dt / nstep
    bebt = cfg.bebt

    if visc_rem_u is None:
        visc_rem_u = jnp.ones_like(u_in)
    if visc_rem_v is None:
        visc_rem_v = jnp.ones_like(v_in)
    # Datu/q are consumed at ring 3 inside the subcycle and derive from
    # eta via one-cell shifts, so eta needs its full halo valid.
    eta_in = domain.fill_halos(eta_in)
    if eta_pf is None:
        eta_pf = eta_in

    frhatu, frhatv = btcalc(grid, h, scheme=cfg.hvel_scheme)
    wt_u = frhatu * visc_rem_u
    wt_v = frhatv * visc_rem_v

    # initial/projection quantities
    ubt0 = jnp.sum(frhatu * u_in, axis=0)
    vbt0 = jnp.sum(frhatv * v_in, axis=0)
    ubt_Cor = jnp.sum(wt_u * u_cor, axis=0)
    vbt_Cor = jnp.sum(wt_v * v_cor, axis=0)
    BT_force_u = jnp.sum(wt_u * bc_accel_u, axis=0)
    BT_force_v = jnp.sum(wt_v * bc_accel_v, axis=0)

    # total depths (Boussinesq) at faces/centers
    D_cell = grid.bathyT + eta_in                     # water column [m]
    D_cell = jnp.maximum(D_cell, 0.0)
    DCor_u = 0.5 * (D_cell + ip1(D_cell))
    DCor_v = 0.5 * (D_cell + jp1(D_cell))
    Datu = grid.dyCu * DCor_u * grid.mask2dCu         # face areas [m2]
    Datv = grid.dxCv * DCor_v * grid.mask2dCv

    if taux is not None:
        BT_force_u = BT_force_u + (taux / vgrid.Rho0) * visc_rem_u[0] \
            / (DCor_u + _H_NEGLECT)
    if tauy is not None:
        BT_force_v = BT_force_v + (tauy / vgrid.Rho0) * visc_rem_v[0] \
            / (DCor_v + _H_NEGLECT)

    # effective reduced gravities across each face direction
    gtot_E = jnp.sum(pbce * wt_u, axis=0)
    gtot_W = jnp.sum(pbce * im1(wt_u), axis=0)
    gtot_N = jnp.sum(pbce * wt_v, axis=0)
    gtot_S = jnp.sum(pbce * jm1(wt_v), axis=0)

    # depth-weighted Coriolis q at corners (q absorbs the 1/4 factor)
    sumA = (grid.areaT + ip1(jp1(grid.areaT))) + (ip1(grid.areaT)
                                                  + jp1(grid.areaT))
    sumAD = ((grid.areaT * D_cell + ip1(jp1(grid.areaT * D_cell)))
             + (ip1(grid.areaT * D_cell) + jp1(grid.areaT * D_cell)))
    q = 0.25 * (cfg.coriolis_scale * grid.CoriolisBu) * sumA \
        / jnp.maximum(sumAD, _H_NEGLECT)

    Dv_q = DCor_v  # depth weights for the Coriolis averaging
    Du_q = DCor_u

    def cor_u(vbt):
        dvv = Dv_q * vbt
        A = q * (ip1(dvv) + dvv)
        return A + jm1(A)

    def cor_v(ubt):
        duu = Du_q * ubt
        B = q * (duu + jp1(duu))
        return -(B + im1(B))

    Cor_ref_u = cor_u(vbt_Cor)
    Cor_ref_v = cor_v(ubt_Cor)

    # per-substep viscous remnant decay
    av_rem_u = jnp.sum(frhatu * visc_rem_u, axis=0)
    av_rem_v = jnp.sum(frhatv * visc_rem_v, axis=0)
    Instep = 1.0 / nstep
    if cfg.strong_drag:
        # BT_STRONG_DRAG harmonic form (MOM_barotropic.F90:1513)
        bt_rem_u = grid.mask2dCu * (nstep * av_rem_u) \
            / (1.0 + (nstep - 1.0) * av_rem_u)
        bt_rem_v = grid.mask2dCv * (nstep * av_rem_v) \
            / (1.0 + (nstep - 1.0) * av_rem_v)
    else:
        bt_rem_u = jnp.where(av_rem_u > 0, av_rem_u ** Instep, 0.0) \
            * grid.mask2dCu
        bt_rem_v = jnp.where(av_rem_v > 0, av_rem_v ** Instep, 0.0) \
            * grid.mask2dCv

    fill = domain.fill_halos

    def _fill_bt3(trio, width=None):
        return _fill_bt(domain, trio[0], trio[1], trio[2], width)

    # collect the per-call 2D constants the subcycle needs; the wide-
    # halo path re-embeds exactly these into wider padding
    consts = dict(Datu=Datu, Datv=Datv, gtot_E=gtot_E, gtot_W=gtot_W,
                  gtot_N=gtot_N, gtot_S=gtot_S, q=q, Du_q=Du_q,
                  Dv_q=Dv_q, DCor_u=DCor_u, DCor_v=DCor_v,
                  Cor_ref_u=Cor_ref_u, Cor_ref_v=Cor_ref_v,
                  bt_rem_u=bt_rem_u, bt_rem_v=bt_rem_v,
                  BT_force_u=BT_force_u, BT_force_v=BT_force_v,
                  eta_pf=eta_pf, IdxCu=grid.IdxCu, IdyCv=grid.IdyCv,
                  IareaT=grid.IareaT)

    # BT_cont face-area curves: derived cubic constants plus the
    # residual transports that anchor the curve to the layered flow
    use_curve = cfg.use_bt_cont and bt_cont is not None
    if use_curve:
        bc = bt_cont
        crv_E, uh_EE, crv_W, uh_WW = _bt_curve_consts(
            bc.FA_u_EE, bc.FA_u_E0, bc.FA_u_W0, bc.FA_u_WW,
            bc.uBT_EE, bc.uBT_WW)
        crv_N, vh_NN, crv_S, vh_SS = _bt_curve_consts(
            bc.FA_v_NN, bc.FA_v_N0, bc.FA_v_S0, bc.FA_v_SS,
            bc.vBT_NN, bc.vBT_SS)
        cu_args = (bc.FA_u_EE, bc.FA_u_E0, bc.FA_u_W0, bc.FA_u_WW,
                   bc.uBT_EE, bc.uBT_WW, crv_E, uh_EE, crv_W, uh_WW)
        cv_args = (bc.FA_v_NN, bc.FA_v_N0, bc.FA_v_S0, bc.FA_v_SS,
                   bc.vBT_NN, bc.vBT_SS, crv_N, vh_NN, crv_S, vh_SS)
        uhbt0 = -find_uhbt(ubt0, *cu_args)
        vhbt0 = -find_uhbt(vbt0, *cv_args)
        if uhbt_in is not None:
            uhbt0 = uhbt0 + uhbt_in
        if vhbt_in is not None:
            vhbt0 = vhbt0 + vhbt_in
        consts["cu"] = cu_args
        consts["cv"] = cv_args
        consts["uhbt0"] = uhbt0
        consts["vhbt0"] = vhbt0

    # eta_cor mass source: reconcile the BT eta with the layered Σh
    # over the step (bt_mass_source :4318); applied per substep
    if eta_cor is not None:
        ec = eta_cor
        if cfg.bound_bt_corr and use_curve:
            # BOUND_BT_CORRECTION (MOM_barotropic.F90:1587-1617):
            # outward (positive) corrections are limited to the mass
            # the BT_cont curves can export at maxCFL_BT_cont; inward
            # corrections to the mass already in the column
            u_cor = grid.dxT * (cfg.maxcfl_bt_cont / dt)
            v_cor = grid.dyT * (cfg.maxcfl_bt_cont / dt)
            out_u = find_uhbt(u_cor, *cu_args) + uhbt0
            in_u = find_uhbt(-u_cor, *cu_args) + uhbt0
            out_v = find_uhbt(v_cor, *cv_args) + vhbt0
            in_v = find_uhbt(-v_cor, *cv_args) + vhbt0
            ec_max = dt * grid.IareaT * (
                (out_u - im1(in_u)) + (out_v - jm1(in_v)))
            htot_col = grid.bathyT + eta_in
            ec = jnp.where(ec > 0.0,
                           jnp.minimum(ec, jnp.maximum(0.0, ec_max)),
                           jnp.maximum(ec, -jnp.maximum(0.0,
                                                        htot_col)))
        consts["eta_src"] = grid.mask2dT * ec / nstep
    else:
        consts["eta_src"] = jnp.zeros_like(eta_in)

    # round substep count up to an even multiple of the exchange period
    period = max(1, int(cfg.wide_halo_period))
    if period > 1 and domain.tripolar_n:
        # the wide-halo re-embedding fills everything as T scalars;
        # across a tripolar fold ubt/vbt need vector sign handling,
        # so exchange every substep there
        period = 1
    if period > 1 and obc is not None:
        # the comm-avoiding wide-halo march recomputes a shrinking
        # overlap between exchanges, which would skip the per-substep
        # Flather/extension updates at open faces — fall back to
        # exchanging every substep when segments are present
        period = 1
    if period % 2:
        period = period + 1 if period > 1 else 1
    chunk = max(2, period)
    dtbt = dt / nstep

    # filter window (DT_BT_FILTER) adds nfilt substeps past dt
    if cfg.dt_bt_filter >= 0.0:
        dt_filt = 0.5 * max(0.0, min(cfg.dt_bt_filter, 2.0 * dt))
    else:
        dt_filt = 0.5 * max(0.0, dt * min(-cfg.dt_bt_filter, 2.0))
    nfilt = int(math.ceil(dt_filt / dtbt - 1e-9))
    nblocks = -(-(nstep + nfilt) // chunk)
    total = nblocks * chunk
    wt_vel_a, wt_eta_a, wt_trans_a, wt_accel_a = _filter_weights(
        nstep, nfilt, total, dt_filt, dtbt, dtype=eta_in.dtype)

    # --- fused Pallas subcycle (TPU, single device, no OBC) ---
    from mom6_tpu.core.barotropic_pallas import (pallas_supported,
                                                 subcycle_pallas)
    if (cfg.use_pallas and period == 1
            and pallas_supported(domain, obc, period, eta_in.dtype,
                                 use_curve=use_curve)):
        import numpy as _np
        wt_rows = _np.stack([wt_vel_a, wt_eta_a, wt_trans_a,
                             wt_accel_a])
        curve_args = None
        if use_curve:
            curve_args = (consts["cu"], consts["cv"],
                          consts["uhbt0"], consts["vhbt0"])
        eta_r0, ubt_r0, vbt_r0 = _fill_bt3((eta_in, ubt0, vbt0),
                                      width=_bt_w(domain))
        _, _, _, sums = subcycle_pallas(
            eta_r0, ubt_r0, vbt_r0, consts, curve_args, wt_rows,
            dtbt, bebt, nblocks * chunk,
            domain.reentrant_x, domain.halo, domain.nil, domain.njl)
        sums = fill(sums, width=_bt_w(domain))
        u_accel_bt = sums["accel_u"]
        v_accel_bt = sums["accel_v"]
        e_anom = sums["eta"] - eta_pf
        accel_layer_u = u_accel_bt[None] - (
            ip1((pbce - gtot_W[None]) * e_anom[None])
            - (pbce - gtot_E[None]) * e_anom[None]) * grid.IdxCu[None]
        accel_layer_v = v_accel_bt[None] - (
            jp1((pbce - gtot_S[None]) * e_anom[None])
            - (pbce - gtot_N[None]) * e_anom[None]) * grid.IdyCv[None]
        accel_layer_u = accel_layer_u * grid.mask2dCu
        accel_layer_v = accel_layer_v * grid.mask2dCv
        return BTResult(eta=sums["eta"], eta_av=sums["eta"],
                        uhbtav=sums["uhbt"], vhbtav=sums["vhbt"],
                        accel_layer_u=accel_layer_u,
                        accel_layer_v=accel_layer_v,
                        ubt_av=sums["ubt"], vbt_av=sums["vbt"])

    if period > 1:
        # communication-avoiding march: each exchange refreshes
        # 3·period rings, then ``period`` substeps run exchange-free
        # while the valid region shrinks 3 rings per substep
        # (MOM_barotropic.F90:782-786,1842-1850)
        dom_run = _widen_domain(domain, 3 * period)
        consts = _widen(domain, dom_run, consts)
        eta_r, ubt_r, vbt_r = _widen(domain, dom_run,
                                     (eta_in, ubt0, vbt0))
        fill_w = 3 * period
    else:
        dom_run = domain
        eta_r, ubt_r, vbt_r = _fill_bt3((eta_in, ubt0, vbt0),
                                   width=_bt_w(domain))
        fill_w = _bt_w(domain)
    run_fill = dom_run.fill_halos

    def _run_fill_bt3(trio, width=None):
        return _fill_bt(dom_run, trio[0], trio[1], trio[2], width)

    wt_vel_j = jnp.asarray(wt_vel_a)
    wt_eta_j = jnp.asarray(wt_eta_a)
    wt_trans_j = jnp.asarray(wt_trans_a)
    wt_accel_j = jnp.asarray(wt_accel_a)

    c = consts

    def cor_u_c(vbt):
        dvv = c["Dv_q"] * vbt
        A = c["q"] * (ip1(dvv) + dvv)
        return A + jm1(A)

    def cor_v_c(ubt):
        duu = c["Du_q"] * ubt
        B = c["q"] * (duu + jp1(duu))
        return -(B + im1(B))

    def div_c(uhbt, vhbt):
        return ((uhbt - im1(uhbt)) + (vhbt - jm1(vhbt))) * c["IareaT"]

    if use_curve:
        def trans_u(ubt):
            return find_uhbt(ubt, *c["cu"]) + c["uhbt0"]

        def trans_v(vbt):
            return find_uhbt(vbt, *c["cv"]) + c["vhbt0"]
    else:
        def trans_u(ubt):
            return c["Datu"] * ubt

        def trans_v(vbt):
            return c["Datv"] * vbt

    def _one(eta, ubt, vbt, sums, n, u_first: bool, do_fill: bool):
        uhbt = trans_u(ubt)
        vhbt = trans_v(vbt)
        eta_pred = (eta + c["eta_src"]) - dtbt * div_c(uhbt, vhbt)
        eta_bt_pf = (1.0 - bebt) * eta + bebt * eta_pred
        d_eta = eta_bt_pf - c["eta_pf"]

        pf_u = (d_eta * c["gtot_E"] - ip1(d_eta * c["gtot_W"])) \
            * c["IdxCu"]
        pf_v = (d_eta * c["gtot_N"] - jp1(d_eta * c["gtot_S"])) \
            * c["IdyCv"]

        if u_first:
            cu = cor_u_c(vbt) - c["Cor_ref_u"]
            ubt2 = c["bt_rem_u"] * (ubt + dtbt * ((c["BT_force_u"]
                                                   + cu) + pf_u))
            cv = cor_v_c(ubt2) - c["Cor_ref_v"]
            vbt2 = c["bt_rem_v"] * (vbt + dtbt * ((c["BT_force_v"]
                                                   + cv) + pf_v))
        else:
            cv = cor_v_c(ubt) - c["Cor_ref_v"]
            vbt2 = c["bt_rem_v"] * (vbt + dtbt * ((c["BT_force_v"]
                                                   + cv) + pf_v))
            cu = cor_u_c(vbt2) - c["Cor_ref_u"]
            ubt2 = c["bt_rem_u"] * (ubt + dtbt * ((c["BT_force_u"]
                                                   + cu) + pf_u))

        if obc is not None:
            ubt2 = obc.apply_flather_u(ubt2, eta, c["DCor_u"],
                                       vgrid.g_Earth)
            vbt2 = obc.apply_flather_v(vbt2, eta, c["DCor_v"],
                                       vgrid.g_Earth)

        uhbt2 = trans_u(ubt2)
        vhbt2 = trans_v(vbt2)
        eta2 = (eta + c["eta_src"]) - dtbt * div_c(uhbt2, vhbt2)

        if do_fill:
            # each substep's validity chain consumes 3 rings
            eta2, ubt2, vbt2 = _run_fill_bt3((eta2, ubt2, vbt2),
                                        width=fill_w)
            if obc is not None:
                eta2 = obc.extend(eta2)
                ubt2 = obc.apply_flather_u(ubt2, eta2, c["DCor_u"],
                                           vgrid.g_Earth)
                vbt2 = obc.apply_flather_v(vbt2, eta2, c["DCor_v"],
                                           vgrid.g_Earth)

        # ramped filter weights: transports/accelerations use the
        # reverse-cumulative weights so the mean transport is exactly
        # consistent with the filtered eta (:1758-1810)
        w_v = wt_vel_j[n]
        w_e = wt_eta_j[n]
        w_t = wt_trans_j[n]
        w_a = wt_accel_j[n]
        sums = dict(
            uhbt=sums["uhbt"] + w_t * uhbt2,
            vhbt=sums["vhbt"] + w_t * vhbt2,
            eta=sums["eta"] + w_e * eta2,
            accel_u=sums["accel_u"] + w_a * (cu + pf_u),
            accel_v=sums["accel_v"] + w_a * (cv + pf_v),
            ubt=sums["ubt"] + w_v * ubt2,
            vbt=sums["vbt"] + w_v * vbt2,
        )
        return eta2, ubt2, vbt2, sums

    def block(i, carry):
        eta, ubt, vbt, sums = carry
        for s in range(chunk):
            last = (s == chunk - 1) if period > 1 else True
            eta, ubt, vbt, sums = _one(eta, ubt, vbt, sums,
                                       i * chunk + s,
                                       u_first=(s % 2 == 0),
                                       do_fill=last)
        return (eta, ubt, vbt, sums)

    # fused Pallas march: same chunked schedule, kernel-resident
    # substeps, caller-side wide-halo exchange between chunks — works
    # for any layout (incl. inside shard_map) and reentrant y, the
    # configurations the single-device kernel cannot serve
    from mom6_tpu.core.barotropic_pallas import pallas_march_supported
    if (cfg.use_pallas and period > 1
            and pallas_march_supported(dom_run, obc, eta_r.dtype,
                                       use_curve, chunk)):
        import numpy as _np
        wt_rows = _np.stack([wt_vel_a, wt_eta_a, wt_trans_a,
                             wt_accel_a])
        curve_args = None
        if use_curve:
            curve_args = (consts["cu"], consts["cv"],
                          consts["uhbt0"], consts["vhbt0"])
        _, _, _, sums = subcycle_pallas(
            eta_r, ubt_r, vbt_r, consts, curve_args, wt_rows,
            dtbt, bebt, nblocks * chunk, dom_run.reentrant_x,
            dom_run.halo, dom_run.nil, dom_run.njl,
            march=True, fill_fn=_run_fill_bt3, chunk_force=chunk,
            vma=dom_run.axis_names() if dom_run.shmap else ())
        eta_f = ubt_f = vbt_f = None      # not consumed downstream
    else:
        zero2 = jnp.zeros_like(eta_r)
        sums0 = dict(uhbt=zero2, vhbt=zero2, eta=zero2,
                     accel_u=zero2, accel_v=zero2, ubt=zero2,
                     vbt=zero2)
        eta_f, ubt_f, vbt_f, sums = jax.lax.fori_loop(
            0, nblocks, block, (eta_r, ubt_r, vbt_r, sums0))

    if period > 1:
        # back to the narrow representation (fills included); the
        # final instantaneous (eta, ubt, vbt) are not consumed
        # downstream (outputs are the filter-weighted sums)
        sums = _narrow(domain, dom_run, sums)
    else:
        # The per-substep accumulations were made before that substep's
        # halo refresh; downstream consumers (continuity's Newton
        # matching at wrap/shard faces, accel_layer's ip1/jp1) need ≥1
        # valid ring — refresh them here.
        sums = fill(sums, width=_bt_w(domain))

    u_accel_bt = sums["accel_u"]
    v_accel_bt = sums["accel_v"]
    e_anom = sums["eta"] - eta_pf

    # distribute to layers with the pbce-gtot correction (:2578)
    accel_layer_u = u_accel_bt[None] - (
        ip1((pbce - gtot_W[None]) * e_anom[None])
        - (pbce - gtot_E[None]) * e_anom[None]) * grid.IdxCu[None]
    accel_layer_v = v_accel_bt[None] - (
        jp1((pbce - gtot_S[None]) * e_anom[None])
        - (pbce - gtot_N[None]) * e_anom[None]) * grid.IdyCv[None]
    accel_layer_u = accel_layer_u * grid.mask2dCu
    accel_layer_v = accel_layer_v * grid.mask2dCv

    # the returned eta is the filtered estimate (eta_out = eta_wtd,
    # MOM_barotropic.F90:2523); with DT_BT_FILTER = 0 the weights
    # collapse to the final substep and this is the raw final eta
    return BTResult(eta=sums["eta"], eta_av=sums["eta"],
                    uhbtav=sums["uhbt"], vhbtav=sums["vhbt"],
                    accel_layer_u=accel_layer_u,
                    accel_layer_v=accel_layer_v,
                    ubt_av=sums["ubt"], vbt_av=sums["vbt"])
