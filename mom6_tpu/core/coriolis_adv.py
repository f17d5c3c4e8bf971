"""Coriolis force and momentum advection (vector-invariant form).

Re-design of /root/reference/src/core/MOM_CoriolisAdv.F90:125 CorAdCalc:
layer potential vorticity q at B (corner) points from the circulation
around each corner, PV-flux Coriolis/advection accelerations in one of
several published discretizations, plus the kinetic-energy gradient:

    CAu =  <q vh> - d(KE)/dx ,   CAv = - <q uh> - d(KE)/dy .

Schemes implemented: SADOURNY75_ENERGY (default), SADOURNY75_ENSTRO,
ARAKAWA_HSU90, ARAKAWA_LAMB81, ARAKAWA_LAMB_BLEND (:543 per-point
blending of AL81/AH90/Sadourny-energy by effective-Coriolis ratio),
ROBUST_ENSTRO (:687 enstrophy form robust to vanishing layers, with
PV_ADV_SCHEME centered/upwind1), and BOUND_CORIOLIS (:734 clamp of
the PV flux to the surrounding f*v range).  KE schemes: KE_ARAKAWA
(default), KE_SIMPLE_GUDONOV, KE_GUDONOV.  CORIOLIS_EN_DIS (Hallberg
200x, :590-664,:764-784) biases the Sadourny-energy PV flux between
the continuity transports and a centered second estimate so the
Coriolis term dissipates energy where they disagree.

Positional convention: q[j, i] sits at the NE corner of cell (j, i);
shifts I-1 → im1, J-1 → jm1 on the trailing axes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["CoriolisCfg", "coriolis_adv", "relative_vorticity"]

_VOL_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class CoriolisCfg:
    scheme: str = "SADOURNY75_ENERGY"   # CORIOLIS_SCHEME
    ke_scheme: str = "KE_ARAKAWA"       # KE_SCHEME
    no_slip: bool = False               # NOSLIP
    bound_coriolis: bool = False        # BOUND_CORIOLIS
    pv_adv_upwind: bool = False         # PV_ADV_SCHEME = PV_ADV_UPWIND1
    # CORIOLIS_EN_DIS (MOM_CoriolisAdv.F90:1087): energy-dissipating
    # biased Sadourny-energy PV flux using min/max of the continuity
    # transport and a centered estimate, selected by sign(q*u)
    coriolis_en_dis: bool = False
    blend_wt_lin: float = 0.125         # CORIOLIS_BLEND_WT_LIN
    blend_f_eff_max: float = 4.0        # CORIOLIS_BLEND_F_EFF_MAX
    h_tiny: float = 1e-10               # Angstrom thickness [m]


class CoriolisResult(NamedTuple):
    CAu: jnp.ndarray
    CAv: jnp.ndarray
    rel_vort: jnp.ndarray      # relative vorticity at q points
    pv: jnp.ndarray            # potential vorticity q at q points


def relative_vorticity(grid: Grid, u, v, no_slip: bool = False):
    """Relative vorticity at corner points from circulation/areaBu."""
    dvdx = ip1(grid.dyCv * v) - grid.dyCv * v
    dudy = jp1(grid.dxCu * u) - grid.dxCu * u
    if no_slip:
        fac = (2.0 - grid.mask2dBu)
    else:
        fac = grid.mask2dBu
    return fac * (dvdx - dudy) * grid.IareaBu


@jax.named_scope("coriolis_adv")
def coriolis_adv(grid: Grid, u, v, h, uh, vh,
                 cfg: CoriolisCfg = CoriolisCfg()) -> CoriolisResult:
    """CorAdCalc: (CAu, CAv) accelerations [m s-2].

    Inputs need valid halos: u,v,h at ≥2 rings; uh,vh at ≥1 ring.
    """
    rv = relative_vorticity(grid, u, v, cfg.no_slip)
    abs_vort = grid.CoriolisBu + rv

    # thickness-weighted areas about the corner (vol_neglect regularized)
    Area_h = grid.mask2dT * grid.areaT
    Area_q = (Area_h + ip1(jp1(Area_h))) + (ip1(Area_h) + jp1(Area_h))
    Ahh = Area_h * h
    hArea_u = 0.5 * (Ahh + ip1(Ahh))       # at u faces
    hArea_v = 0.5 * (Ahh + jp1(Ahh))       # at v faces
    hArea_q = (hArea_u + jp1(hArea_u)) + (hArea_v + ip1(hArea_v))
    Ih_q = Area_q / (hArea_q + _VOL_NEGLECT)
    q = abs_vort * Ih_q

    # --- PV flux term ---
    if cfg.scheme == "SADOURNY75_ENERGY" and cfg.coriolis_en_dis:
        # Hallberg's energy-dissipating bias (:590-664): the centered
        # transport estimate is clip-blended against the continuity
        # transport (RANGE=0.5 ladder), sorted into min/max, and each
        # corner PV-flux term picks the branch that dissipates energy
        # for the local sign of q*u (q*v for CAv)
        def min_max(c, m, dlen):
            c = jnp.where(dlen == 0.0, m, c)
            ac, am = jnp.abs(c), jnp.abs(m)
            m_adj = jnp.where(ac < 0.1 * am, 10.0 * c, m)
            c_adj = jnp.where(
                ac <= 0.25 * am, c,
                jnp.where(ac < 0.5 * am, 3.0 * c - 0.5 * m,
                          jnp.where(ac <= 2.0 * am, m, 0.5 * c)))
            c_adj = jnp.where(ac < 0.1 * am, c, c_adj)
            return (jnp.minimum(c_adj, m_adj),
                    jnp.maximum(c_adj, m_adj))

        uh_c = 0.5 * grid.dyCu * u * (h + ip1(h))
        vh_c = 0.5 * grid.dxCv * v * (h + jp1(h))
        uh_min, uh_max = min_max(uh_c, uh, grid.dyCu)
        vh_min, vh_max = min_max(vh_c, vh, grid.dxCv)

        def pick(qq, sel, pr_min, pr_max):
            # sel<0 -> max branch, sel>0 -> min, ==0 -> average
            return jnp.where(
                sel == 0.0, qq * 0.5 * (pr_max + pr_min),
                jnp.where(sel < 0.0, qq * pr_max, qq * pr_min))

        vmin_p = vh_min + ip1(vh_min)
        vmax_p = vh_max + ip1(vh_max)
        t1 = pick(q, q * u, vmin_p, vmax_p)
        t2 = pick(jm1(q), jm1(q) * u, jm1(vmin_p), jm1(vmax_p))
        CAu = 0.25 * (t1 + t2) * grid.IdxCu
        umin_p = uh_min + jp1(uh_min)
        umax_p = uh_max + jp1(uh_max)
        # CAv = -q*uh: the dissipative branch flips (q*v>0 -> max)
        s1 = pick(im1(q), -(im1(q) * v), im1(umin_p), im1(umax_p))
        s2 = pick(q, -(q * v), umin_p, umax_p)
        CAv = -0.25 * (s1 + s2) * grid.IdyCv
    elif cfg.scheme == "SADOURNY75_ENERGY":
        A = q * (vh + ip1(vh))
        CAu = 0.25 * (A + jm1(A)) * grid.IdxCu
        B = q * (uh + jp1(uh))
        CAv = -0.25 * (B + im1(B)) * grid.IdyCv
    elif cfg.scheme == "SADOURNY75_ENSTRO":
        CAu = (0.125 * grid.IdxCu * (q + jm1(q))
               * ((vh + ip1(vh)) + (jm1(vh) + ip1(jm1(vh)))))
        CAv = (-0.125 * grid.IdyCv * (q + im1(q))
               * ((uh + jp1(uh)) + (im1(uh) + im1(jp1(uh)))))
    elif cfg.scheme in ("ARAKAWA_HSU90", "ARAKAWA_LAMB81",
                        "ARAKAWA_LAMB_BLEND", "AL_BLEND"):
        c12 = 1.0 / 12.0
        c24 = 1.0 / 24.0
        ep_u = ep_v = None
        if cfg.scheme == "ARAKAWA_HSU90":
            a_w = (q + (ip1(q) + jm1(q))) * c12
            d_w = ((q + ip1(jm1(q))) + jm1(q)) * c12
            b_w = (q + (im1(q) + jm1(q))) * c12
            c_w = ((q + im1(jm1(q))) + jm1(q)) * c12
        elif cfg.scheme == "ARAKAWA_LAMB81":
            # MOM_CoriolisAdv.F90:534-541, reindexed to faces
            a_w = (2.0 * (ip1(q) + jm1(q)) + (q + ip1(jm1(q)))) * c24
            d_w = ((ip1(q) + jm1(q)) + 2.0 * (q + ip1(jm1(q)))) * c24
            b_w = ((q + im1(jm1(q))) + 2.0 * (im1(q) + jm1(q))) * c24
            c_w = (2.0 * (q + im1(jm1(q))) + (im1(q) + jm1(q))) * c24
            ep_u = ((q - im1(jm1(q))) + (im1(q) - jm1(q))) * c24
            ep_v = (-(q - im1(jm1(q))) + (im1(q) - jm1(q))) * c24
        else:
            # ARAKAWA_LAMB_BLEND (:543-588): per-cell weights from the
            # spread of 1/h around each cell keep the effective
            # Coriolis amplification under F_eff_max, blending AL81 →
            # AH90 → Sadourny energy as the spread grows.
            fe_m2 = cfg.blend_f_eff_max - 2.0
            wt_lin = min(1.0, max(cfg.blend_wt_lin, 1e-16))
            rat_lin = 1.5 * fe_m2 / max(wt_lin, 1e-16)
            if cfg.blend_f_eff_max <= 2.0:
                fe_m2, rat_lin = -1.0, -1.0
            q00, q10 = im1(jm1(Ih_q)), jm1(Ih_q)
            q01, q11 = im1(Ih_q), Ih_q
            min_ihq = jnp.minimum(jnp.minimum(q00, q10),
                                  jnp.minimum(q01, q11))
            max_ihq = jnp.maximum(jnp.maximum(q00, q10),
                                  jnp.maximum(q01, q11))
            rat_m1 = jnp.where(max_ihq < 1e15 * min_ihq,
                               max_ihq / jnp.maximum(min_ihq, 1e-300)
                               - 1.0, 1e15)
            al_wt = jnp.where(
                rat_m1 <= fe_m2, 1.0,
                jnp.where(rat_m1 < 1.5 * fe_m2,
                          3.0 * fe_m2 / jnp.maximum(rat_m1, 1e-300)
                          - 2.0, 0.0))
            sad_wt = jnp.where(
                rat_m1 <= 1.5 * fe_m2, 0.0,
                jnp.where(
                    rat_m1 <= rat_lin,
                    1.0 - (1.5 * fe_m2) / jnp.maximum(rat_m1, 1e-300),
                    jnp.where(rat_m1 < 2.0 * rat_lin,
                              1.0 - (wt_lin / rat_lin)
                              * (rat_m1 - 2.0 * rat_lin), 1.0)))
            swp, alp = ip1(sad_wt), ip1(al_wt)   # weights of east cell
            a_w = (swp * 0.25 * q + (1.0 - swp)
                   * (((2.0 - alp) * q + alp * ip1(jm1(q)))
                      + 2.0 * (ip1(q) + jm1(q))) * c24)
            d_w = (swp * 0.25 * jm1(q) + (1.0 - swp)
                   * (((2.0 - alp) * jm1(q) + alp * ip1(q))
                      + 2.0 * (q + ip1(jm1(q)))) * c24)
            b_w = (sad_wt * 0.25 * q + (1.0 - sad_wt)
                   * (((2.0 - al_wt) * q + al_wt * im1(jm1(q)))
                      + 2.0 * (im1(q) + jm1(q))) * c24)
            c_w = (sad_wt * 0.25 * jm1(q) + (1.0 - sad_wt)
                   * (((2.0 - al_wt) * jm1(q) + al_wt * im1(q))
                      + 2.0 * (q + im1(jm1(q)))) * c24)
            ep_u = al_wt * ((q - im1(jm1(q)))
                            + (im1(q) - jm1(q))) * c24
            ep_v = al_wt * (-(q - im1(jm1(q)))
                            + (im1(q) - jm1(q))) * c24
        CAu = ((a_w * ip1(vh) + c_w * jm1(vh))
               + (b_w * vh + d_w * ip1(jm1(vh)))) * grid.IdxCu
        # CAv(i,J) = -((a(I-1,j) uh(I-1,j) + c(I,j+1) uh(I,j+1)) +
        #              (b(I,j) uh(I,j) + d(I-1,j+1) uh(I-1,j+1))) IdyCv
        CAv = -((im1(a_w) * im1(uh) + jp1(c_w) * jp1(uh))
                + (b_w * uh + im1(jp1(d_w)) * im1(jp1(uh)))) * grid.IdyCv
        if ep_u is not None:
            # Arakawa & Lamb divergence-correction terms (:717, :841)
            CAu = CAu + (ep_u * im1(uh)
                         - ip1(ep_u) * ip1(uh)) * grid.IdxCu
            CAv = CAv + (ep_v * jm1(vh)
                         - jp1(ep_v) * jp1(vh)) * grid.IdyCv
    elif cfg.scheme == "ROBUST_ENSTRO":
        # enstrophy-conserving form robust to vanishing layers (:687):
        # the PV flux divides by effective thicknesses diagnosed from
        # transport/velocity, clamped into the neighbor-h range
        eps_vel = 1e-10
        h_tiny = cfg.h_tiny

        def heff(tr, vel, h_a, h_b, idx):
            he = jnp.abs(tr * idx) / (eps_vel + jnp.abs(vel))
            he = jnp.maximum(he, jnp.minimum(h_a, h_b))
            return jnp.minimum(he, jnp.maximum(h_a, h_b))

        # u equation: v-transports around the u face
        he1 = heff(vh, v, h, jp1(h), grid.IdxCv)
        he2 = heff(jm1(vh), jm1(v), jm1(h), h, jm1(grid.IdxCv))
        he3, he4 = ip1(he1), ip1(he2)
        vheff = (vh + ip1(jm1(vh))) + (jm1(vh) + ip1(vh))
        denom_u = h_tiny + ((he1 + he4) + (he2 + he3))
        if cfg.pv_adv_upwind:
            qvh = 0.5 * ((abs_vort + jm1(abs_vort)) * vheff
                         - (abs_vort - jm1(abs_vort)) * jnp.abs(vheff))
            CAu = qvh / denom_u * grid.IdxCu
        else:
            CAu = (0.5 * (abs_vort + jm1(abs_vort)) * vheff
                   / denom_u * grid.IdxCu)
        # v equation: u-transports around the v face
        hf1 = heff(uh, u, h, ip1(h), grid.IdyCu)
        hf2 = heff(im1(uh), im1(u), im1(h), h, im1(grid.IdyCu))
        hf3, hf4 = jp1(hf1), jp1(hf2)
        uheff = (uh + im1(jp1(uh))) + (im1(uh) + jp1(uh))
        denom_v = h_tiny + ((hf1 + hf4) + (hf2 + hf3))
        if cfg.pv_adv_upwind:
            quh = 0.5 * ((abs_vort + im1(abs_vort)) * uheff
                         - (abs_vort - im1(abs_vort)) * jnp.abs(uheff))
            CAv = -quh / denom_v * grid.IdyCv
        else:
            CAv = (-0.5 * (abs_vort + im1(abs_vort)) * uheff
                   / denom_v * grid.IdyCv)
    else:
        raise ValueError(f"Unsupported CORIOLIS_SCHEME {cfg.scheme}")

    if cfg.bound_coriolis and cfg.scheme != "ROBUST_ENSTRO":
        # clamp the PV flux to the range of f_eff*v (f_eff*u) at the
        # four surrounding points (:734, :859)
        fv1 = abs_vort * ip1(v)
        fv2 = abs_vort * v
        fv3 = jm1(abs_vort) * ip1(jm1(v))
        fv4 = jm1(abs_vort) * jm1(v)
        CAu = jnp.clip(CAu,
                       jnp.minimum(jnp.minimum(fv1, fv2),
                                   jnp.minimum(fv3, fv4)),
                       jnp.maximum(jnp.maximum(fv1, fv2),
                                   jnp.maximum(fv3, fv4)))
        fu1 = -abs_vort * jp1(u)
        fu2 = -abs_vort * u
        fu3 = -im1(abs_vort) * im1(jp1(u))
        fu4 = -im1(abs_vort) * im1(u)
        CAv = jnp.clip(CAv,
                       jnp.minimum(jnp.minimum(fu1, fu2),
                                   jnp.minimum(fu3, fu4)),
                       jnp.maximum(jnp.maximum(fu1, fu2),
                                   jnp.maximum(fu3, fu4)))

    # --- KE gradient (gradKE) ---
    if cfg.ke_scheme == "KE_ARAKAWA":
        au2 = grid.areaCu * u * u
        av2 = grid.areaCv * v * v
        KE = ((au2 + im1(au2)) + (av2 + jm1(av2))) * 0.25 * grid.IareaT
    elif cfg.ke_scheme == "KE_SIMPLE_GUDONOV":
        up = 0.5 * (im1(u) + jnp.abs(im1(u)))
        um = 0.5 * (u - jnp.abs(u))
        vp = 0.5 * (jm1(v) + jnp.abs(jm1(v)))
        vm = 0.5 * (v - jnp.abs(v))
        KE = (jnp.maximum(up * up, um * um)
              + jnp.maximum(vp * vp, vm * vm)) * 0.5
    elif cfg.ke_scheme == "KE_GUDONOV":
        up = 0.5 * (im1(u) + jnp.abs(im1(u)))
        um = 0.5 * (u - jnp.abs(u))
        vp = 0.5 * (jm1(v) + jnp.abs(jm1(v)))
        vm = 0.5 * (v - jnp.abs(v))
        KE = (jnp.maximum(up * up * im1(grid.areaCu),
                          um * um * grid.areaCu)
              + jnp.maximum(vp * vp * jm1(grid.areaCv),
                            vm * vm * grid.areaCv)) * 0.5 * grid.IareaT
    else:
        raise ValueError(f"Unsupported KE_SCHEME {cfg.ke_scheme}")

    KEx = (ip1(KE) - KE) * grid.IdxCu
    KEy = (jp1(KE) - KE) * grid.IdyCv

    CAu = (CAu - KEx) * grid.mask2dCu
    CAv = (CAv - KEy) * grid.mask2dCv
    return CoriolisResult(CAu=CAu, CAv=CAv, rel_vort=rv, pv=q)
