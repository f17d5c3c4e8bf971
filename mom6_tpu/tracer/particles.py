"""Lagrangian particles (drifters).

The reference ships only interface stubs for its particles package
(/root/reference/config_src/external/drifters/MOM_particles.F90,
called from MOM.F90:1357); this is a working implementation: particle
positions advected by bilinearly-interpolated layer velocities with
RK2 stepping, periodic/clamped domain handling, vectorized over all
particles.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import Grid

__all__ = ["Particles", "init_particles", "advect_particles"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Particles:
    x: jnp.ndarray        # fractional global i-coordinate (cell units)
    y: jnp.ndarray        # fractional global j-coordinate
    k: jnp.ndarray        # layer index (int)


def init_particles(xs, ys, ks=None) -> Particles:
    xs = jnp.asarray(xs, dtype=jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    ys = jnp.asarray(ys, dtype=xs.dtype)
    if ks is None:
        ks = jnp.zeros(xs.shape, jnp.int32)
    return Particles(x=xs, y=ys, k=jnp.asarray(ks, jnp.int32))


def _interp_u(domain: Domain, u, p: Particles):
    """Bilinear interpolation of the u field at particle positions.

    u[j,i] sits at the east face of cell (i,j): position (i+1, j+0.5)
    in global fractional coordinates measured in cell units."""
    H = domain.halo
    # u-grid coordinates of the particle
    xu = p.x - 1.0
    yu = p.y - 0.5
    i0 = jnp.floor(xu).astype(jnp.int32)
    j0 = jnp.floor(yu).astype(jnp.int32)
    fx = xu - i0
    fy = yu - j0
    uk = u[p.k]

    def at(jj, ii):
        jj = jnp.clip(jj + H, 0, u.shape[-2] - 1)
        ii = jnp.clip(ii + H, 0, u.shape[-1] - 1)
        return uk[jnp.arange(p.x.shape[0]), jj, ii] if uk.ndim == 3 \
            else uk[jj, ii]

    v00 = at(j0, i0)
    v01 = at(j0, i0 + 1)
    v10 = at(j0 + 1, i0)
    v11 = at(j0 + 1, i0 + 1)
    return ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
            + (1 - fx) * fy * v10 + fx * fy * v11)


def _interp_v(domain: Domain, v, p: Particles):
    H = domain.halo
    xv = p.x - 0.5
    yv = p.y - 1.0
    i0 = jnp.floor(xv).astype(jnp.int32)
    j0 = jnp.floor(yv).astype(jnp.int32)
    fx = xv - i0
    fy = yv - j0
    vk = v[p.k]

    def at(jj, ii):
        jj = jnp.clip(jj + H, 0, v.shape[-2] - 1)
        ii = jnp.clip(ii + H, 0, v.shape[-1] - 1)
        return vk[jnp.arange(p.x.shape[0]), jj, ii] if vk.ndim == 3 \
            else vk[jj, ii]

    v00 = at(j0, i0)
    v01 = at(j0, i0 + 1)
    v10 = at(j0 + 1, i0)
    v11 = at(j0 + 1, i0 + 1)
    return ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
            + (1 - fx) * fy * v10 + fx * fy * v11)


def advect_particles(domain: Domain, grid: Grid, p: Particles, u, v,
                     dt: float) -> Particles:
    """RK2 (midpoint) advection in grid-fractional coordinates."""
    def vel(pp: Particles):
        us = _interp_u(domain, u, pp)
        vs = _interp_v(domain, v, pp)
        # convert m/s → cells/s with the local grid spacing
        H = domain.halo
        ic = jnp.clip(jnp.floor(pp.x).astype(jnp.int32) + H, 0,
                      grid.dxT.shape[-1] - 1)
        jc = jnp.clip(jnp.floor(pp.y).astype(jnp.int32) + H, 0,
                      grid.dxT.shape[-2] - 1)
        dx = grid.dxT[jc, ic]
        dy = grid.dyT[jc, ic]
        return us / dx, vs / dy

    cu1, cv1 = vel(p)
    mid = Particles(x=p.x + 0.5 * dt * cu1, y=p.y + 0.5 * dt * cv1,
                    k=p.k)
    mid = _wrap(domain, mid)
    cu2, cv2 = vel(mid)
    out = Particles(x=p.x + dt * cu2, y=p.y + dt * cv2, k=p.k)
    return _wrap(domain, out)


def _wrap(domain: Domain, p: Particles) -> Particles:
    x, y = p.x, p.y
    if domain.reentrant_x:
        x = jnp.mod(x, domain.ni)
    else:
        x = jnp.clip(x, 0.0, float(domain.ni))
    if domain.reentrant_y:
        y = jnp.mod(y, domain.nj)
    else:
        y = jnp.clip(y, 0.0, float(domain.nj))
    return Particles(x=x, y=y, k=p.k)
