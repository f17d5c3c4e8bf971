"""Thickness (Gent-McWilliams) diffusion.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_thickness_diffuse.F90: interface-height diffusion expressed through
a streamfunction at interfaces, so that layer transports are exactly
the streamfunction differences and the scheme moves no net column mass:

    psi(K)  = KhTh * dy_face * (e(i+1,K) − e(i,K)) / dx      [m3 s-1]
    uhD(k)  = psi(K) − psi(K+1)

The coefficient may be a constant (KHTH) or a 2D field assembled by
the caller from the MEKE → VarMix chain (KHTH + MEKE_KHTH_FAC·K_MEKE,
scaled by the resolution function; MOM_thickness_diffuse.F90:204-260).
The column potential-energy release rate feeding the MEKE budget
(MEKE_GMCOEFF, MOM_MEKE.F90) is returned as ``gm_work``.

(The full neutral-slope/streamfunction machinery with Visbeck scaling,
slope limits and the Ferrari-Young advective form arrives with
isopycnal_slopes; this is the layered KHTH form which reduces to it
for stacked isopycnal coordinates.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import interface_heights
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["ThicknessDiffuseCfg", "thickness_diffuse"]


@dataclasses.dataclass(frozen=True)
class ThicknessDiffuseCfg:
    khth: float = 0.0              # KHTH [m2 s-1]
    khth_max_cfl: float = 0.1      # stability bound on the applied Kh
    khth_max: float = 0.0          # KHTH_MAX cap on 2D coefficients
                                   # (0 → no cap)


class ThicknessDiffuseResult(NamedTuple):
    h: jnp.ndarray
    uhD: jnp.ndarray     # diffusive layer transports [m3 s-1]
    vhD: jnp.ndarray
    # column PE release rate per unit area / rho0 [m3 s-3], the GM
    # energy source of the MEKE budget (MOM_MEKE.F90 src_GM)
    gm_work: Optional[jnp.ndarray] = None


@jax.named_scope("thickness_diffuse")
def thickness_diffuse(grid: Grid, vgrid: VerticalGrid, h, dt,
                      cfg: ThicknessDiffuseCfg, khth_2d=None,
                      gprime_int=None, res_u=None, res_v=None):
    """Apply interface-height diffusion over dt.  Needs h halos ≥2.

    khth_2d: optional (njh, nih) coefficient at h points replacing the
    constant (interpolated to faces here); the caller assembles it
    from MEKE/VarMix.  res_u/res_v: optional face-centered resolution
    functions multiplying the face coefficients (RESOLN_SCALED_KHTH
    applies VarMix%Res_fn_u/v at the faces, MOM_thickness_diffuse.F90
    KH_u scaling; the face Res_fn is evaluated directly unless
    INTERPOLATE_RES_FN).  gprime_int: optional (nk+1, njh, nih)
    interface reduced gravities for the PE-release diagnostic
    (e.g. N²·Δz from the actual stratification); defaults to the Rlay
    target-density jumps (degenerate for z*-type coordinates)."""
    if cfg.khth <= 0.0 and khth_2d is None:
        z = jnp.zeros_like(h)
        return ThicknessDiffuseResult(h=h, uhD=z, vhD=z,
                                      gm_work=jnp.zeros_like(h[0]))

    e = interface_heights(vgrid, h, grid.bathyT)
    if khth_2d is not None:
        kh = khth_2d
        if cfg.khth_max > 0.0:
            kh = jnp.minimum(kh, cfg.khth_max)
        kh_u0 = 0.5 * (kh + ip1(kh))
        kh_v0 = 0.5 * (kh + jp1(kh))
    else:
        kh_u0 = cfg.khth
        kh_v0 = cfg.khth
    if res_u is not None:
        kh_u0 = kh_u0 * res_u
    if res_v is not None:
        kh_v0 = kh_v0 * res_v
    kh_u = jnp.minimum(kh_u0, cfg.khth_max_cfl
                       * grid.dxCu * grid.dxCu / dt)
    kh_v = jnp.minimum(kh_v0, cfg.khth_max_cfl
                       * grid.dyCv * grid.dyCv / dt)

    # streamfunction at interfaces K=0..nk (zero at surface & bottom so
    # the column-integrated transport vanishes).  Since
    # de(K)/dt = −div(psi(K)), psi = −Kh ∇e gives downgradient
    # interface-height diffusion.
    de_u = (ip1(e) - e) * grid.mask2dCu
    de_v = (jp1(e) - e) * grid.mask2dCv
    psi_u = -kh_u * grid.dyCu * grid.IdxCu * de_u
    psi_v = -kh_v * grid.dxCv * grid.IdyCv * de_v
    psi_u = psi_u.at[0].set(0.0).at[-1].set(0.0)
    psi_v = psi_v.at[0].set(0.0).at[-1].set(0.0)

    uhD = psi_u[:-1] - psi_u[1:]
    vhD = psi_v[:-1] - psi_v[1:]

    # limit each face transport by the upwind layer's content so
    # vanished layers are never drained below zero (the reference
    # bounds the streamfunction by available thickness; without this
    # the positivity clamp would CREATE mass at bowl/shelf edges)
    frac = 0.2
    lim = frac * grid.areaT * h / dt
    uhD = jnp.clip(uhD, -ip1(lim), lim)
    vhD = jnp.clip(vhD, -jp1(lim), lim)

    # PE release rate: −Σ_K g'_K psi·∇e ≥ 0 per unit area (/rho0),
    # using the streamfunction REconstructed from the clipped
    # transports (psi_eff[K] = Σ_{k≥K} uhD_k, psi_eff[nk] = 0) so
    # massless-layer rims where transports were upwind-limited do not
    # inflate the MEKE source
    g_acc, rho0 = vgrid.g_Earth, vgrid.Rho0
    if gprime_int is not None:
        gp = jnp.maximum(gprime_int, 0.0)
    else:
        # interface reduced gravities from the layer target densities
        rl = vgrid.Rlay
        gprime = jnp.maximum(g_acc * (rl[1:] - rl[:-1]) / rho0, 0.0)
        gp = jnp.concatenate([jnp.zeros((1,)), gprime,
                              jnp.zeros((1,))])     # (nk+1,)
        gp = gp.reshape((-1,) + (1,) * (h.ndim - 1))
    psi_u_eff = jnp.cumsum(uhD[::-1], axis=0)[::-1]
    psi_v_eff = jnp.cumsum(vhD[::-1], axis=0)[::-1]
    zed = jnp.zeros_like(uhD[:1])
    psi_u_eff = jnp.concatenate([psi_u_eff, zed], axis=0)
    psi_v_eff = jnp.concatenate([psi_v_eff, zed], axis=0)
    wu = jnp.sum(-gp * psi_u_eff * de_u * grid.IdxCu, axis=0)
    wv = jnp.sum(-gp * psi_v_eff * de_v * grid.IdyCv, axis=0)
    gm_work = (jnp.maximum(0.5 * (wu + im1(wu)), 0.0)
               + jnp.maximum(0.5 * (wv + jm1(wv)), 0.0)) \
        * grid.mask2dT

    h_new = h - dt * grid.IareaT * ((uhD - im1(uhD)) + (vhD - jm1(vhD)))
    h_new = jnp.maximum(h_new, vgrid.angstrom)
    return ThicknessDiffuseResult(h=h_new, uhD=uhD, vhD=vhD,
                                  gm_work=gm_work)
