"""Mesoscale Eddy Kinetic Energy (MEKE) budget.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_MEKE.F90 (step_forward_MEKE :170, MEKE_lengthScales_0d :1016,
MEKE_equilibrium :761): a prognostic 2D budget of parameterized
sub-grid eddy energy,

  dE/dt = γ_GM·(GM work) + γ_fric·(frictional work)
          − (λ_0 + γ_b²·drag_rate)·E + ∇·(K_E ∇E) − adv_fac·u̅·∇E

with the eddy mixing length blended from the deformation, frictional
arrest, Rhines, Eady and grid scales (inverse-sum or min blend), the
vertical-structure factors γ_b² (bottom) and γ_t² (barotropic)
damping/energizing the scales with depth, and the equilibrium
solution available for initialization.  The diffusivity handed to the
KHTH chain is K = c_K·γ_t·√(2E)·L_mix, or the GEOMETRIC form
K = α·E/max(S N, ε) (MEKE_GEOMETRIC).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["MEKECfg", "step_meke", "meke_khth", "meke_equilibrium",
           "meke_length_scales"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class MEKECfg:
    frcoeff: float = 0.1        # MEKE_FRCOEFF: fraction of friction work
    gmcoeff: float = 0.1        # MEKE_GMCOEFF: fraction of GM work
    damping: float = 0.0        # MEKE_DAMPING background rate [s-1]
    cdrag: float = 0.003        # MEKE_CDRAG
    cb: float = 25.0            # MEKE_CB (bottomFac2 shape)
    ct: float = 50.0            # MEKE_CT (barotrFac2 shape)
    cd_scale: float = 0.0       # MEKE_CD_SCALE (gamma_b floor term)
    min_gamma: float = 0.0001   # MEKE_MIN_GAMMA2
    khmeke_fac: float = 1.0     # MEKE_KHMEKE_FAC: diffusion of E itself
    ks_coeff: float = 1.0       # MEKE_KHCOEFF → K from E
    bgsrc: float = 0.0          # MEKE_BGSRC background source [W kg-1]
    # MEKE_VISCOSITY_COEFF_KU: Ku = coeff·sqrt(2E)·Lmix added to the
    # Laplacian viscosity (MOM_MEKE.F90 Ku update; consumed at
    # MOM_hor_visc.F90:1145-1149); negative = backscatter
    viscosity_coeff_ku: float = 0.0
    advection_factor: float = 0.0   # MEKE_ADVECTION_FACTOR
    # mixing-length blend (MEKE_ALPHA_*, MEKE_USE_MIN_LSCALE)
    a_deform: float = 0.0       # MEKE_ALPHA_DEFORM
    a_frict: float = 0.0        # MEKE_ALPHA_FRICT
    a_rhines: float = 0.0       # MEKE_ALPHA_RHINES
    a_eady: float = 0.0         # MEKE_ALPHA_EADY
    a_grid: float = 0.0         # MEKE_ALPHA_GRID
    l_fixed: float = 1e4        # MEKE_FIXED_MIXING_LENGTH [m]
    use_min_lscale: bool = False    # MEKE_USE_MIN_LSCALE
    lscale_max: float = 1e6
    # GEOMETRIC GM (MEKE_GEOMETRIC): KHTH = alpha * E / (S N)
    geometric: bool = False
    geometric_alpha: float = 0.05   # MEKE_GEOMETRIC_ALPHA
    sn_min: float = 1e-8            # Eady-rate floor [s-1]
    min_depth: float = 10.0


def meke_length_scales(cfg: MEKECfg, grid: Grid, e, depth, rd_dx=None,
                       sn=None, beta=None):
    """(LmixScale, bottomFac2, barotrFac2) per MEKE_lengthScales_0d."""
    l_grid = jnp.sqrt(grid.areaT)
    l_deform = l_grid * (rd_dx if rd_dx is not None
                         else jnp.zeros_like(l_grid))
    l_frict = jnp.maximum(depth, cfg.min_depth) / max(cfg.cdrag, _EPS)
    bottom2 = cfg.cd_scale ** 2 + 1.0 / (
        1.0 + cfg.cb * (l_deform / (l_frict + _EPS))) ** 0.8
    bottom2 = jnp.maximum(bottom2, cfg.min_gamma)
    barotr2 = 1.0 / (1.0 + cfg.ct * (l_deform
                                     / (l_frict + _EPS))) ** 0.25
    barotr2 = jnp.maximum(barotr2, cfg.min_gamma)

    ue = jnp.sqrt(2.0 * jnp.maximum(barotr2 * e, 0.0))
    l_rhines = jnp.sqrt(ue / jnp.maximum(
        beta if beta is not None else jnp.zeros_like(ue), 1e-30))
    l_eady = ue / jnp.maximum(sn if sn is not None
                              else jnp.zeros_like(ue), 1e-15)

    pairs = ((cfg.a_deform, l_deform), (cfg.a_frict, l_frict),
             (cfg.a_rhines, l_rhines), (cfg.a_eady, l_eady),
             (cfg.a_grid, l_grid))
    if cfg.use_min_lscale:
        lmix = jnp.full_like(l_grid, cfg.lscale_max)
        for a, l in pairs:
            if a > 0.0:
                lmix = jnp.minimum(lmix, a * l)
        if cfg.l_fixed > 0.0:
            lmix = jnp.minimum(lmix, cfg.l_fixed)
    else:
        inv = jnp.zeros_like(l_grid)
        any_term = False
        for a, l in pairs:
            if a > 0.0:
                inv = inv + 1.0 / jnp.maximum(a * l, _EPS)
                any_term = True
        if cfg.l_fixed > 0.0:
            inv = inv + 1.0 / cfg.l_fixed
            any_term = True
        lmix = jnp.where(inv > 0.0, 1.0 / jnp.maximum(inv, _EPS), 0.0) \
            if any_term else jnp.full_like(l_grid, cfg.l_fixed)
    return lmix, bottom2, barotr2


def step_meke(cfg: MEKECfg, grid: Grid, meke_e, dt,
              gm_work=None, fric_work=None, depth_tot=None,
              rd_dx=None, sn=None, u_bt=None, v_bt=None):
    """Advance E [m2 s-2] one step (step_forward_MEKE).

    gm_work/fric_work: column-integrated conversion rates
    [m3 s-3]; depth_tot: column depth [m]; rd_dx: deformation
    radius / grid spacing from VarMix; sn: Eady growth rate [s-1];
    u_bt/v_bt: depth-mean flow for the E advection term."""
    e = jnp.maximum(meke_e, 0.0)
    depth = depth_tot if depth_tot is not None \
        else jnp.maximum(grid.bathyT, cfg.min_depth)

    beta = None
    if hasattr(grid, "CoriolisBu"):
        fq = grid.CoriolisBu
        dfy = jnp.abs((fq - jm1(fq)) * grid.IdyCv)
        dfx = jnp.abs((fq - im1(fq)) * grid.IdxCu)
        beta = jnp.sqrt(dfx * dfx + dfy * dfy)
    lmix, bottom2, barotr2 = meke_length_scales(cfg, grid, e, depth,
                                                rd_dx=rd_dx, sn=sn,
                                                beta=beta)

    src = jnp.zeros_like(e)
    if gm_work is not None:
        src = src + cfg.gmcoeff * gm_work
    if fric_work is not None:
        src = src + cfg.frcoeff * fric_work
    src = src / jnp.maximum(depth, cfg.min_depth)
    # constant background source (MEKE_BGSRC, already per unit mass)
    src = src + cfg.bgsrc

    # bottom drag damping: lambda = cdrag*sqrt(2 gamma_b^2 E + Ub^2)/H
    ub2 = jnp.zeros_like(e)
    if u_bt is not None:
        u_h = 0.5 * (u_bt + im1(u_bt))
        v_h = 0.5 * (v_bt + jm1(v_bt))
        ub2 = u_h * u_h + v_h * v_h
    drag_vel = cfg.cdrag * jnp.sqrt(2.0 * bottom2 * e + ub2
                                    + cfg.cb * cfg.cdrag ** 2)
    lam = cfg.damping + drag_vel / jnp.maximum(depth, cfg.min_depth)

    # lateral diffusion of E with K_MEKE: flux form with face-mean,
    # CFL-limited diffusivity (MOM_MEKE.F90:498-530; the reference's
    # harmonic column-mass weighting is omitted — E here is already
    # per unit mass throughout this module)
    ke = meke_khth(cfg, e, lmix=lmix, barotr2=barotr2)
    kh_u = cfg.khmeke_fac * 0.5 * (ke + ip1(ke))
    kh_v = cfg.khmeke_fac * 0.5 * (ke + jp1(ke))
    geo_u = grid.dyCu * grid.IdxCu
    geo_v = grid.dxCv * grid.IdyCv
    inv_max_u = 2.0 * dt * geo_u * jnp.maximum(grid.IareaT,
                                               ip1(grid.IareaT))
    inv_max_v = 2.0 * dt * geo_v * jnp.maximum(grid.IareaT,
                                               jp1(grid.IareaT))
    kh_u = jnp.minimum(kh_u, 0.25 / jnp.maximum(inv_max_u, _EPS))
    kh_v = jnp.minimum(kh_v, 0.25 / jnp.maximum(inv_max_v, _EPS))
    fx = kh_u * geo_u * (e - ip1(e)) * grid.mask2dCu
    fy = kh_v * geo_v * (e - jp1(e)) * grid.mask2dCv
    diff = ((im1(fx) - fx) + (jm1(fy) - fy)) * grid.IareaT

    # advection of E by the depth-mean flow (MEKE_ADVECTION_FACTOR):
    # first-order upwind fluxes, conservative
    adv = jnp.zeros_like(e)
    if cfg.advection_factor > 0.0 and u_bt is not None:
        fu = jnp.where(u_bt > 0.0, e, ip1(e)) * u_bt * grid.dyCu \
            * grid.mask2dCu
        fv = jnp.where(v_bt > 0.0, e, jp1(e)) * v_bt * grid.dxCv \
            * grid.mask2dCv
        adv = -cfg.advection_factor * ((fu - im1(fu))
                                       + (fv - jm1(fv))) * grid.IareaT

    # semi-implicit damping for stability
    e_new = (e + dt * (src + diff + adv)) / (1.0 + dt * lam)
    return jnp.maximum(e_new, 0.0) * grid.mask2dT


def meke_khth(cfg: MEKECfg, meke_e, lmix=None, barotr2=None, sn=None):
    """Eddy diffusivity from the MEKE field [m2 s-1]:
    K = c_K * gamma_t * sqrt(2E) * L_mix, or the GEOMETRIC form
    K = alpha * E / max(SN, eps) when cfg.geometric."""
    e = jnp.maximum(meke_e, 0.0)
    if cfg.geometric and sn is not None:
        return cfg.geometric_alpha * e / jnp.maximum(sn, cfg.sn_min)
    gt = jnp.sqrt(barotr2) if barotr2 is not None else 1.0
    l = lmix if lmix is not None else cfg.l_fixed
    return cfg.ks_coeff * gt * jnp.sqrt(2.0 * e) * l


def meke_ku(cfg: MEKECfg, meke_e, lmix=None):
    """Additive Laplacian viscosity from the eddy energy
    (MOM_MEKE.F90: MEKE%Ku = viscosity_coeff_Ku·sqrt(2·max(0,E))·
    LmixScale; hor_visc adds it to Kh, MOM_hor_visc.F90:1145-1149).
    Negative coefficients give backscatter."""
    e = jnp.maximum(meke_e, 0.0)
    l = lmix if lmix is not None else cfg.l_fixed
    return cfg.viscosity_coeff_ku * jnp.sqrt(2.0 * e) * l


def meke_equilibrium(cfg: MEKECfg, grid: Grid, depth, sn,
                     gm_work=None):
    """Equilibrium E for initialization (MEKE_equilibrium :761).

    GEOMETRIC: E = (alpha SN H / cdrag)^2 / (2 gamma_b^2) collapses to
    the reference's (alpha SN H)^2/cd2 balance (:811); otherwise the
    source/drag balance E = (gamma_GM src H / cdrag)^(2/3)/2."""
    d = jnp.maximum(depth, cfg.min_depth)
    if cfg.geometric:
        e0 = (cfg.geometric_alpha * jnp.maximum(sn, 0.0) * d) ** 2 \
            / max(cfg.cdrag ** 2, _EPS)
        return e0 * grid.mask2dT
    if gm_work is None:
        return jnp.zeros_like(depth)
    src = cfg.gmcoeff * jnp.maximum(gm_work, 0.0) / d
    # src = cdrag*(2E)^{3/2}/H  →  E = ((src H/cdrag)^{2/3})/2
    e0 = 0.5 * (src * d / max(cfg.cdrag, _EPS)) ** (2.0 / 3.0)
    return e0 * grid.mask2dT
