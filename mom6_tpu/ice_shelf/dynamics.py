"""Ice-shelf/ice-sheet dynamics: shallow-shelf approximation (SSA).

Re-design of /root/reference/src/ice_shelf/MOM_ice_shelf_dynamics.F90
(SSA-type velocity solve): the depth-integrated momentum balance

  ∂x(2 ν̄ h (2∂x u + ∂y v)) + ∂y(ν̄ h (∂y u + ∂x v)) − β u
      = ρ_i g h ∂x s

with Glen-law effective viscosity ν̄ = ½ A^{-1/n} ε̇_e^{(1-n)/n} and a
linear basal drag β (zero over floating shelf).  Like the reference,
the linearized problem (per Picard viscosity refresh) is solved with
conjugate gradients; the symmetric positive-definite operator is
obtained for free as `jax.grad` of the SSA energy functional

  J = Σ_q ν̄h A_q [2u_x² + 2v_y² + 2u_x v_y + ½(u_y+v_x)²]
      + Σ_T A_T [½β(u²+v²) + t_d·u]

with strains evaluated at cell corners (compact B-grid stencil — a
fully centered collocated form has a checkerboard null space).
Fixed iteration counts, branch-free, jittable.  Callers should zero
shelf_mask on the outermost ring (or land) to pin the far-field
velocity; the stencils wrap, so an unmasked seam couples the two
ends of the domain.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["SSACfg", "ssa_velocity_solve", "basal_traction"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class SSACfg:
    glen_a: float = 2.4e-24        # Glen's law A [Pa-3 s-1]
    glen_n: float = 3.0
    rho_ice: float = 918.0
    rho_sw: float = 1028.0
    g: float = 9.81
    basal_beta: float = 0.0        # linear basal drag [Pa s m-1]
    n_outer: int = 24              # Picard viscosity refreshes
    n_inner: int = 200             # CG iterations per refresh
    eps_strain: float = 1e-10      # strain regularization [s-1]
    picard_damping: float = 0.0    # 0 = undamped, 0.5 = geometric mean
    # --- basal friction law over grounded ice (calc_shelf_taub,
    # MOM_ice_shelf_dynamics.F90:498-508) ---
    # tau_b = C |u|^(n_b-1) u  (Weertman power law; n_b = 1 linear),
    # optionally Coulomb-limited (Schoof 2005, Gagliardini et al 2007):
    # tau_b = C |u|^(n_b-1) u / (1 + fB |u|^p)^(n_b) with
    # fB = alpha (C / (CF_Max N))^(p/n_b), N = max(rho_i g (h-H_f),
    # CF_MinN) the effective pressure above flotation.
    c_basal: float = 0.0           # C_basal_friction [Pa (m s-1)^-n_b]
    n_basal: float = 1.0           # BASAL_FRICTION_EXP
    coulomb: bool = False          # USE_COULOMB_FRICTION
    cf_min_n: float = 1.0          # CF_MinN [Pa]
    cf_post_peak: float = 1.0      # CF_PostPeak exponent p
    cf_max: float = 0.5            # CF_Max coefficient


class SSAResult(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    visc: jnp.ndarray


def _surface(cfg: SSACfg, h_shelf, floating):
    """Upper surface height s: flotation over ocean, grounded = h."""
    s_float = (1.0 - cfg.rho_ice / cfg.rho_sw) * h_shelf
    return jnp.where(floating > 0, s_float, h_shelf)


def basal_traction(cfg: SSACfg, grid: Grid, u, v, h_shelf,
                   ground_frac, bed_elev=None):
    """Area-weighted basal traction coefficient beta [Pa s m-1 · m²]
    such that tau_b·A = beta·u (calc_shelf_taub,
    MOM_ice_shelf_dynamics.F90): Weertman power law, Coulomb-limited
    when cfg.coulomb, applied only over grounded ice."""
    speed2 = u * u + v * v + (cfg.eps_strain ** 2
                              * (grid.dxT ** 2 + grid.dyT ** 2))
    unorm = jnp.sqrt(speed2)
    coef = cfg.c_basal * unorm ** (cfg.n_basal - 1.0)
    if cfg.coulomb:
        p = cfg.cf_post_peak
        alpha = ((p - 1.0) ** (p - 1.0) / p ** p) if p != 1.0 else 1.0
        # flotation thickness from the bed depth below sea level
        hf = jnp.maximum((cfg.rho_sw / cfg.rho_ice)
                         * (bed_elev if bed_elev is not None
                            else jnp.zeros_like(h_shelf)), 0.0)
        fN = jnp.maximum(cfg.rho_ice * cfg.g * (h_shelf - hf),
                         cfg.cf_min_n)
        fB = alpha * (cfg.c_basal / (cfg.cf_max * fN)) \
            ** (p / cfg.n_basal)
        coef = coef / (1.0 + fB * unorm ** p) ** cfg.n_basal
    return coef * grid.areaT * ground_frac


def glen_a_arrhenius(t_shelf, a_ref: float = 2.4e-24,
                     t_ref: float = -10.0):
    """Temperature-dependent Glen's-law rate factor A(T) by the
    standard Arrhenius relation (Cuffey & Paterson 2010 §3.4.6):
    A = A* exp(-Qc/R (1/T_h - 1/T_h*)) with the creep activation
    energy Qc = 60 kJ/mol below -10 °C and 115 kJ/mol above, and the
    pressure-melting-adjusted temperature approximated by T itself.
    Normalized so A(t_ref) = a_ref.  This is how the evolving
    vertically-integrated shelf temperature (t_shelf,
    MOM_ice_shelf_dynamics.F90:84,3694 ice_shelf_temp) feeds back on
    the rheology."""
    R = 8.314
    tk = t_shelf + 273.15
    tk_ref = t_ref + 273.15
    q_ref = 60.0e3 if t_ref < -10.0 else 115.0e3
    # continuous at -10 °C: anchor both branches there
    tk10 = 263.15
    loga = jnp.where(
        t_shelf < -10.0,
        -(60.0e3 / R) * (1.0 / tk - 1.0 / tk10),
        -(115.0e3 / R) * (1.0 / tk - 1.0 / tk10))
    loga_ref = -(q_ref / R) * (1.0 / tk_ref - 1.0 / tk10)
    return a_ref * jnp.exp(loga - loga_ref)


def ssa_velocity_solve(cfg: SSACfg, grid: Grid, h_shelf, shelf_mask,
                       floating=None, u0=None, v0=None,
                       ground_frac=None, bed_elev=None,
                       a_glen_2d=None) -> SSAResult:
    """Solve the SSA for shelf velocities at h points.

    h_shelf: ice thickness [m]; shelf_mask: 1 where ice is present;
    floating: 1 where afloat (defaults to all floating);
    ground_frac: fraction of the cell grounded (basal friction acts
    there; update_OD_ffrac analog), bed_elev: bed depth below sea
    level [m] (for the Coulomb effective pressure); a_glen_2d: an
    optional spatially-varying Glen rate factor [Pa-n s-1] (from the
    evolving shelf temperature via :func:`glen_a_arrhenius`, or an
    observational AGlen_visc file — calc_shelf_visc's OBS/MODEL
    paths, MOM_ice_shelf_dynamics.F90:2932-3050)."""
    if floating is None:
        floating = shelf_mask if ground_frac is None \
            else shelf_mask * (1.0 - ground_frac)
    if u0 is None:
        u0 = jnp.zeros_like(h_shelf)
    if v0 is None:
        v0 = jnp.zeros_like(h_shelf)
    if ground_frac is None:
        ground_frac = jnp.zeros_like(h_shelf)

    # grounded ice rests on the bed: s = h − bed_depth
    s = _surface(cfg, h_shelf, floating)
    if bed_elev is not None:
        s = jnp.where(ground_frac > 0.5, h_shelf - bed_elev, s)
    # driving stress ρ_i g h ∂s/∂x at h points (centered)
    tdx = cfg.rho_ice * cfg.g * h_shelf * 0.5 \
        * (ip1(s) - im1(s)) * grid.IdxT
    tdy = cfg.rho_ice * cfg.g * h_shelf * 0.5 \
        * (jp1(s) - jm1(s)) * grid.IdyT

    n = cfg.glen_n

    def strains_q(u, v):
        """Compact strains at cell corners (NE of cell (j,i))."""
        dx_u = ip1(u) - u
        dx_v = ip1(v) - v
        ux = 0.5 * (dx_u + jp1(dx_u)) * grid.IdxBu
        vx = 0.5 * (dx_v + jp1(dx_v)) * grid.IdxBu
        dy_u = jp1(u) - u
        dy_v = jp1(v) - v
        uy = 0.5 * (dy_u + ip1(dy_u)) * grid.IdyBu
        vy = 0.5 * (dy_v + ip1(dy_v)) * grid.IdyBu
        return ux, vy, uy, vx

    def corner_avg(a):
        return 0.25 * (a + ip1(a) + jp1(a) + ip1(jp1(a)))

    def dot(a, b):
        return (jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1]))

    # Glen rate factor at corners: scalar, or the evolving 2D field
    a_q = cfg.glen_a if a_glen_2d is None \
        else jnp.maximum(corner_avg(a_glen_2d), 1e-32)
    B = a_q ** (-1.0 / n)

    u, v = u0 * shelf_mask, v0 * shelf_mask
    beta_lin = cfg.basal_beta * grid.areaT * shelf_mask
    b = (-tdx * grid.areaT * shelf_mask,
         -tdy * grid.areaT * shelf_mask)

    # initial viscosity from the Glen free-spreading rate at the
    # extensional stress scale ρ'gh/4 (van der Veen ice tongue) — a
    # cold start from the ε-strain floor is ~4 decades too viscous
    # and costs that many extra Picard refreshes
    tau0 = 0.25 * cfg.rho_ice * (1.0 - cfg.rho_ice / cfg.rho_sw) \
        * cfg.g * jnp.maximum(corner_avg(h_shelf), 1.0)
    ee0 = a_q * tau0 ** n + cfg.eps_strain
    visc_q = 0.5 * B * ee0 ** ((1.0 - n) / n)

    for _ in range(cfg.n_outer):
        ux, vy, uy, vx = strains_q(u, v)
        ee = jnp.sqrt(ux * ux + vy * vy + ux * vy
                      + 0.25 * (uy + vx) ** 2 + cfg.eps_strain ** 2)
        visc_new = 0.5 * B * ee ** ((1.0 - n) / n)
        # damped Picard: log-space relaxation toward the new viscosity
        # (undamped Picard can oscillate for shear-thinning rheology)
        w = cfg.picard_damping
        visc_q = visc_q ** w * visc_new ** (1.0 - w)
        # nonlinear basal traction refreshed with the viscosity
        # (calc_shelf_taub is called per outer iteration in the
        # reference's Picard loop, MOM_ice_shelf_dynamics.F90:1028)
        beta_a = beta_lin
        if cfg.c_basal > 0.0:
            beta_a = beta_a + basal_traction(cfg, grid, u, v, h_shelf,
                                             ground_frac, bed_elev) \
                * shelf_mask
        nu_h = visc_q * jnp.maximum(corner_avg(h_shelf), 1.0) \
            * corner_avg(shelf_mask)

        def energy(uv):
            uu, vv = uv
            ux, vy, uy, vx = strains_q(uu, vv)
            ev = jnp.sum(nu_h * grid.areaBu
                         * (2.0 * ux * ux + 2.0 * vy * vy
                            + 2.0 * ux * vy
                            + 0.5 * (uy + vx) ** 2))
            ed = 0.5 * jnp.sum(beta_a * (uu * uu + vv * vv))
            return ev + ed

        grad_e = jax.grad(energy)

        def apply_op(uv):
            gu, gv = grad_e(uv)
            return (gu * shelf_mask, gv * shelf_mask)

        # exact Jacobi diagonal: diag_i = 2 J(e_i); a unit u at (j,i)
        # strains only its 4 surrounding corners with ux = ±IdxBu/2,
        # uy = ±IdyBu/2
        def csum(a):
            return a + im1(a) + jm1(a) + im1(jm1(a))

        wq_x = nu_h * grid.areaBu * grid.IdxBu ** 2
        wq_y = nu_h * grid.areaBu * grid.IdyBu ** 2
        diag_u = csum(wq_x + 0.25 * wq_y) + beta_a
        diag_v = csum(wq_y + 0.25 * wq_x) + beta_a
        idu = shelf_mask / jnp.maximum(diag_u, _EPS)
        idv = shelf_mask / jnp.maximum(diag_v, _EPS)

        def precond(r):
            return (r[0] * idu, r[1] * idv)

        # preconditioned CG on the SPD system  A x = b
        x = (u, v)
        ax = apply_op(x)
        r = (b[0] - ax[0], b[1] - ax[1])
        z = precond(r)
        p = z
        rz = dot(r, z)

        def cg_step(_, carry):
            x, r, p, rz = carry
            ap = apply_op(p)
            alpha = rz / jnp.maximum(dot(p, ap), _EPS)
            x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
            r = (r[0] - alpha * ap[0], r[1] - alpha * ap[1])
            z = precond(r)
            rz_new = dot(r, z)
            bet = rz_new / jnp.maximum(rz, _EPS)
            p = (z[0] + bet * p[0], z[1] + bet * p[1])
            return (x, r, p, rz_new)

        (x, _, _, _) = jax.lax.fori_loop(0, cfg.n_inner, cg_step,
                                         (x, r, p, rz))
        u, v = x[0] * shelf_mask, x[1] * shelf_mask
    # viscosity at h points for diagnostics
    visc = 0.25 * (visc_q + im1(visc_q) + jm1(visc_q)
                   + im1(jm1(visc_q)))
    return SSAResult(u=u, v=v, visc=visc)
