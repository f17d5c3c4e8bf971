"""Coriolis force and momentum advection (vector-invariant form).

Re-design of /root/reference/src/core/MOM_CoriolisAdv.F90:125 CorAdCalc:
layer potential vorticity q at B (corner) points from the circulation
around each corner, PV-flux Coriolis/advection accelerations in one of
several published discretizations, plus the kinetic-energy gradient:

    CAu =  <q vh> - d(KE)/dx ,   CAv = - <q uh> - d(KE)/dy .

Schemes implemented: SADOURNY75_ENERGY (default), SADOURNY75_ENSTRO,
ARAKAWA_HSU90.  (ARAKAWA_LAMB81, AL_BLEND, ROBUST_ENSTRO and the
energy-dissipating bias remain to be added.)  KE schemes: KE_ARAKAWA
(default), KE_SIMPLE_GUDONOV, KE_GUDONOV.

Positional convention: q[j, i] sits at the NE corner of cell (j, i);
shifts I-1 → im1, J-1 → jm1 on the trailing axes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

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
    bound_coriolis: bool = False        # BOUND_CORIOLIS (not yet applied)


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
    if cfg.scheme == "SADOURNY75_ENERGY":
        A = q * (vh + ip1(vh))
        CAu = 0.25 * (A + jm1(A)) * grid.IdxCu
        B = q * (uh + jp1(uh))
        CAv = -0.25 * (B + im1(B)) * grid.IdyCv
    elif cfg.scheme == "SADOURNY75_ENSTRO":
        CAu = (0.125 * grid.IdxCu * (q + jm1(q))
               * ((vh + ip1(vh)) + (jm1(vh) + ip1(jm1(vh)))))
        CAv = (-0.125 * grid.IdyCv * (q + im1(q))
               * ((uh + jp1(uh)) + (im1(uh) + im1(jp1(uh)))))
    elif cfg.scheme == "ARAKAWA_HSU90":
        c12 = 1.0 / 12.0
        a_w = (q + (ip1(q) + jm1(q))) * c12
        d_w = ((q + ip1(jm1(q))) + jm1(q)) * c12
        b_w = (q + (im1(q) + jm1(q))) * c12
        c_w = ((q + im1(jm1(q))) + jm1(q)) * c12
        CAu = ((a_w * ip1(vh) + c_w * jm1(vh))
               + (b_w * vh + d_w * ip1(jm1(vh)))) * grid.IdxCu
        # CAv(i,J) = -((a(I-1,j) uh(I-1,j) + c(I,j+1) uh(I,j+1)) +
        #              (b(I,j) uh(I,j) + d(I-1,j+1) uh(I-1,j+1))) IdyCv
        CAv = -((im1(a_w) * im1(uh) + jp1(c_w) * jp1(uh))
                + (b_w * uh + im1(jp1(d_w)) * im1(jp1(uh)))) * grid.IdyCv
    else:
        raise ValueError(f"Unsupported CORIOLIS_SCHEME {cfg.scheme}")

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
