"""Stanley et al. (2020) subgrid temperature variance for the EOS.

Re-design of /root/reference/src/core/MOM_stoch_eos.F90
(MOM_calc_varT :197) and the density adjustment it feeds
(``calculate_density`` with tv%varT: rho += 0.5 varT d2rho/dT2, used
by the FV pressure force with USE_STANLEY_PGF,
MOM_PressureForce_FV.F90:997-1004).

TPU framing: the variance is a pure stencil over the (already
halo-filled) temperature field, and the second EOS derivative comes
from nested forward-mode AD over the *analytic* density function —
exact for every EOS form without hand-derived coefficient tables.
(The stochastic multiplier exp(a*pattern) of STOCH_EOS — an AR(1)
random pattern carried across steps — is not wired; the deterministic
Stanley closure is.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["calc_varT", "density_second_dT2", "stanley_density"]

_H_SUB = 1e-20


def calc_varT(grid: Grid, h, T, stanley_coeff: float):
    """Subgrid temperature variance varT = c ((dx ∂T/∂x)² + (dy
    ∂T/∂y)²) using centered-mean gradients, damped by the min/max
    thickness ratio of the local 5-point stencil (MOM_calc_varT,
    MOM_stoch_eos.F90:225-245).

    h, T need one valid halo ring."""
    dTdx = (grid.mask2dCu * grid.IdxCu * (ip1(T) - T)
            + im1(grid.mask2dCu * grid.IdxCu) * (T - im1(T)))
    dTdy = (grid.mask2dCv * grid.IdyCv * (jp1(T) - T)
            + jm1(grid.mask2dCv * grid.IdyCv) * (T - jm1(T)))
    dTdi2 = (0.5 * grid.dxT * dTdx) ** 2
    dTdj2 = (0.5 * grid.dyT * dTdy) ** 2
    hl = [h * grid.mask2dT, im1(h) * im1(grid.mask2dCu),
          ip1(h) * grid.mask2dCu, jm1(h) * jm1(grid.mask2dCv),
          jp1(h) * grid.mask2dCv]
    hmin = hl[0]
    hmax = hl[0]
    for x in hl[1:]:
        hmin = jnp.minimum(hmin, x)
        hmax = jnp.maximum(hmax, x)
    return stanley_coeff * (dTdi2 + dTdj2) * hmin / (hmax + _H_SUB)


def density_second_dT2(eos, T, S, p):
    """d²rho/dT² by forward-over-forward AD of the EOS density —
    elementwise exact (the calculate_density_second_derivs analog
    without per-form coefficient tables)."""
    def d1(t):
        return jax.jvp(lambda tt: eos.density(tt, S, p), (t,),
                       (jnp.ones_like(t),))[1]
    return jax.jvp(d1, (T,), (jnp.ones_like(T),))[1]


def stanley_density(eos, T, S, p, varT):
    """Density with the Stanley variance correction:
    rho(T,S,p) + 0.5 varT d²rho/dT²."""
    return eos.density(T, S, p) + 0.5 * varT * density_second_dT2(
        eos, T, S, p)
