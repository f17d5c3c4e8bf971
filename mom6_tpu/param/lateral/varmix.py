"""Variable mixing coefficient scalings (VarMix).

Re-design of /root/reference/src/parameterizations/lateral/
MOM_lateral_mixing_coeffs.F90: the resolution function
Res(x) = 1/(1 + (Rd/(dx·fn_power))⁻ᵖ)⁻¹-style damping of eddy
parameterizations where the deformation radius is resolved
(calc_resolution_function :214), plus the Visbeck-style |S|N scaling
hooks (slope/Eady-growth pieces are follow-ons sharing this module).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.diagnostics.wave_speed import wave_speed_wkb

__all__ = ["VarMixCfg", "calc_resolution_function", "VarMixResult"]

_EPS = 1e-14


@dataclasses.dataclass(frozen=True)
class VarMixCfg:
    use_variable_mixing: bool = False   # USE_VARIABLE_MIXING
    res_scale_meke: bool = False
    res_fn_power: int = 2               # KH_RES_FN_POWER
    res_coef: float = 1.0               # KH_RES_SCALE_COEF


class VarMixResult(NamedTuple):
    res_fn: jnp.ndarray       # (njh, nih) in [0,1]: 1 → apply full eddy
    rd_dx: jnp.ndarray        # deformation radius / grid spacing


def calc_resolution_function(cfg: VarMixCfg, grid: Grid,
                             vgrid: VerticalGrid, h, T=None, S=None,
                             eos=None, f_min: float = 1e-6):
    """res_fn = 1/(1 + (coef·Rd/dx)^p): ≈1 where eddies are
    unresolved (apply the parameterization), →0 where resolved."""
    c1 = wave_speed_wkb(vgrid, h, T, S, eos)
    # |f| at h points from the corner values
    from mom6_tpu.parallel.stencil import im1, jm1
    f_h = 0.25 * ((jnp.abs(grid.CoriolisBu)
                   + im1(jm1(jnp.abs(grid.CoriolisBu))))
                  + (im1(jnp.abs(grid.CoriolisBu))
                     + jm1(jnp.abs(grid.CoriolisBu))))
    rd = c1 / jnp.maximum(f_h, f_min)
    dx = jnp.sqrt(grid.dxT * grid.dyT)
    rd_dx = rd / jnp.maximum(dx, _EPS)
    res = 1.0 / (1.0 + (cfg.res_coef * rd_dx) ** cfg.res_fn_power)
    return VarMixResult(res_fn=res, rd_dx=rd_dx)
