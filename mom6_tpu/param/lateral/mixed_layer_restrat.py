"""Mixed-layer restratification by submesoscale eddies.

Re-design of /root/reference/src/parameterizations/lateral/
MOM_mixed_layer_restrat.F90: the Fox-Kemper, Ferrari & Hallberg (2008)
mixed-layer eddy overturning streamfunction

  Ψ = C_e · (H_ml² ∇_H b̄) / √(f² + τ⁻²) · μ(z)

with the vertical structure μ(z) = max(0, (1−(2z/H+1)²)(1+(5/21)(2z/H+1)²))
applied as layer transports within the mixed layer; the buoyancy
gradient uses the mixed-layer mean density from the EOS.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["MLRestratCfg", "mixed_layer_restrat"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class MLRestratCfg:
    fox_kemper_ml_restrat_coef: float = 20.0   # FOX_KEMPER_ML_RESTRAT_COEF
    ml_restrat_timescale: float = 86400.0      # MLE front timescale τ [s]
    hml_const: float = 50.0                    # fallback Hml [m]


class MLRestratResult(NamedTuple):
    h: jnp.ndarray
    uhml: jnp.ndarray
    vhml: jnp.ndarray


@jax.named_scope("mle_restrat")
def mixed_layer_restrat(cfg: MLRestratCfg, grid: Grid,
                        vgrid: VerticalGrid, h, dt, T=None, S=None,
                        eos=None, hml=None):
    """Apply MLE overturning transports over dt.  Needs h/T/S halos≥1.
    hml: mixed layer depth (njh, nih) (e.g. KPP BLD); default const."""
    nk = h.shape[0]
    g_acc, rho0 = vgrid.g_Earth, vgrid.Rho0
    if hml is None:
        hml = jnp.full_like(h[0], cfg.hml_const)

    # mixed-layer mean buoyancy: average rho over layers within hml
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    frac_in = jnp.clip((hml[None] - z_int[:-1]) / (h + _EPS), 0.0, 1.0)
    w = frac_in * h
    if T is not None and eos is not None:
        # surface-referenced POTENTIAL density: the buoyancy gradient
        # must not see compressibility, else columns with different
        # mixed-layer depths acquire enormous fake fronts (the
        # reference uses EOS with the surface pressure here)
        rho = eos.density(T, S, jnp.zeros_like(T))
    else:
        rho = jnp.broadcast_to(
            vgrid.Rlay.reshape((-1,) + (1,) * (h.ndim - 1)), h.shape)
    rho_ml = jnp.sum(rho * w, axis=0) / (jnp.sum(w, axis=0) + _EPS)
    b_ml = -g_acc * rho_ml / rho0

    # |f| at faces
    absf_u = 0.5 * (jnp.abs(grid.CoriolisBu) + jm1(jnp.abs(grid.CoriolisBu)))
    absf_v = 0.5 * (jnp.abs(grid.CoriolisBu) + im1(jnp.abs(grid.CoriolisBu)))
    itau2 = (1.0 / cfg.ml_restrat_timescale) ** 2

    hml_u = 0.5 * (hml + ip1(hml))
    hml_v = 0.5 * (hml + jp1(hml))
    dbdx = (ip1(b_ml) - b_ml) * grid.IdxCu
    dbdy = (jp1(b_ml) - b_ml) * grid.IdyCv
    psi_u_max = (cfg.fox_kemper_ml_restrat_coef * hml_u * hml_u * dbdx
                 / jnp.sqrt(absf_u * absf_u + itau2)) * grid.mask2dCu
    psi_v_max = (cfg.fox_kemper_ml_restrat_coef * hml_v * hml_v * dbdy
                 / jnp.sqrt(absf_v * absf_v + itau2)) * grid.mask2dCv

    # vertical structure μ at interfaces (0 at surface and below Hml)
    def mu(zi, hbl):
        zn = jnp.clip(2.0 * zi / jnp.maximum(hbl[None], _EPS) - 1.0,
                      -1.0, 1.0)
        # integral-form structure: Ψ(K) ∝ (1-zn²)(1+(5/21)zn²) scaled
        return jnp.maximum((1.0 - zn * zn) * (1.0 + (5.0 / 21.0)
                                              * zn * zn), 0.0)

    z_u = 0.5 * (z_int + ip1(z_int))
    z_v = 0.5 * (z_int + jp1(z_int))
    mu_u = mu(z_u, hml_u)
    mu_v = mu(z_v, hml_v)
    # transports = Ψ differences across layers → zero column sum
    uhml = (mu_u[:-1] - mu_u[1:]) * psi_u_max[None] * grid.dyCu[None]
    vhml = (mu_v[:-1] - mu_v[1:]) * psi_v_max[None] * grid.dxCv[None]

    # limit by available layer volume
    frac = 0.2
    lim = frac * grid.areaT * h / dt
    uhml = jnp.clip(uhml, -ip1(lim), lim)
    vhml = jnp.clip(vhml, -jp1(lim), lim)

    h_new = h - dt * grid.IareaT * ((uhml - im1(uhml))
                                    + (vhml - jm1(vhml)))
    h_new = jnp.maximum(h_new, vgrid.angstrom)
    return MLRestratResult(h=h_new, uhml=uhml, vhml=vhml)
