"""Implicit vertical diffusion of tracers.

Re-design of /root/reference/src/tracer/MOM_tracer_diabatic.F90
tracer_vertdiff: a fully implicit tridiagonal diffusion solve per
column with optional surface/bottom flux boundary conditions, sharing
the thickness-weighted Thomas recursion of the viscosity solver
(entrainment-free Eulerian form used by the ALE diabatic path,
MOM_diabatic_driver.F90:1511).
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.core.vert_friction import implicit_visc_solve

__all__ = ["tracer_vertdiff"]

_H_NEGLECT = 1e-30


def tracer_vertdiff(t, h, kd_int, dt, sfc_flux=None, bot_flux=None):
    """Implicit vertical diffusion: (h + dt L) t' = h t + dt*fluxes.

    kd_int: (nk+1, ...) interface diffusivities [m2 s-1];
    sfc_flux: tracer flux into the top layer [conc·m s-1]."""
    dz = 0.5 * (h[:-1] + h[1:]) + _H_NEGLECT
    a_int = kd_int[1:-1] / dz
    a = jnp.concatenate([jnp.zeros_like(h[:1]), a_int,
                         jnp.zeros_like(h[:1])], axis=0)
    rhs_extra = None
    if sfc_flux is not None:
        rhs_extra = dt * sfc_flux
    t_new = implicit_visc_solve(t, h + _H_NEGLECT, a, dt,
                                rhs_extra=rhs_extra)
    if bot_flux is not None:
        t_new = t_new.at[-1].add(dt * bot_flux / (h[-1] + _H_NEGLECT))
    return t_new
