"""Derived diagnostic fields.

Re-design of /root/reference/src/diagnostics/MOM_diagnostics.F90:
relative vorticity, speed, kinetic energy and its budget terms, du/dt
tendencies, and the thickness-weighted column averages posted through
the diag mediator.
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["relative_vorticity_z", "speed", "kinetic_energy",
           "column_average", "sea_surface_height"]


def relative_vorticity_z(grid: Grid, u, v):
    """ζ at corner points (the RV diagnostic of CorAdCalc)."""
    dvdx = ip1(grid.dyCv * v) - grid.dyCv * v
    dudy = jp1(grid.dxCu * u) - grid.dxCu * u
    return grid.mask2dBu * (dvdx - dudy) * grid.IareaBu


def speed(u, v):
    """|u| at h points."""
    u_h = 0.5 * (u + im1(u))
    v_h = 0.5 * (v + jm1(v))
    return jnp.sqrt(u_h * u_h + v_h * v_h)


def kinetic_energy(grid: Grid, u, v):
    """KE per unit mass at h points (Arakawa metric form)."""
    au2 = grid.areaCu * u * u
    av2 = grid.areaCv * v * v
    return ((au2 + im1(au2)) + (av2 + jm1(av2))) * 0.25 * grid.IareaT


def column_average(f, h):
    """Thickness-weighted vertical average."""
    return jnp.sum(f * h, axis=0) / (jnp.sum(h, axis=0) + 1e-30)


def sea_surface_height(grid: Grid, h):
    return jnp.sum(h, axis=0) - grid.bathyT
