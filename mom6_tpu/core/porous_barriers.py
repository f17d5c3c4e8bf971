"""Porous topographic barriers.

Re-design of /root/reference/src/core/MOM_porous_barriers.F90: faces
partially blocked by unresolved sills expose only a fraction of their
area to flow.  Each face carries the (Dmin, Dmax, Davg) statistics of
its subgrid bathymetry (heights, negative down, read from the
TOPO_AT_VEL file, MOM_shared_initialization.F90:1202); the cumulative
open face area below an interface height follows the Adcroft fit of
``calc_por_layer`` (:352), and a layer's open fraction is the
difference of that cumulative area across the layer divided by its
thickness.  All interfaces and faces evaluate at once (branchless
``where`` chains instead of the reference's bottom-up early-exit
loop).
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["cumulative_open_area", "porous_widths_layer",
           "porous_widths_from_h"]

_EPS = 1e-14


def cumulative_open_area(D_min, D_max, D_avg, eta):
    """A(eta): open face width-integral below interface height ``eta``
    (calc_por_layer, MOM_porous_barriers.F90:352).  Heights are
    negative down; D_min is the deepest subgrid point, D_max the
    shallowest crest."""
    rng = jnp.maximum(D_max - D_min, _EPS)
    m = jnp.clip((D_avg - D_min) / rng, 1e-12, 1.0 - 1e-12)
    zeta = jnp.clip((eta - D_min) / rng, 0.0, 1.0)
    low = rng * ((1.0 - m) * zeta ** (1.0 / (1.0 - m)))
    high = rng * (zeta - m + m * (1.0 - zeta) ** (1.0 / m))
    mid = jnp.where(m < 0.5, low, high)
    return jnp.where(eta <= D_min, 0.0,
                     jnp.where(eta > D_max, eta - D_avg, mid))


def porous_widths_layer(grid: Grid, e, stagger: str = "U"):
    """Per-layer open fractions (por_face_areaU or V) from interface
    heights ``e`` (nk+1, ...) at T points.  Faces with no subgrid data
    (Davg unset) are fully open."""
    if stagger == "U":
        Dmin, Dmax, Davg = (grid.porous_DminU, grid.porous_DmaxU,
                            grid.porous_DavgU)
        e_face = 0.5 * (e + ip1(e))
    else:
        Dmin, Dmax, Davg = (grid.porous_DminV, grid.porous_DmaxV,
                            grid.porous_DavgV)
        e_face = 0.5 * (e + jp1(e))
    if Davg is None:
        return None
    A = cumulative_open_area(Dmin[None], Dmax[None], Davg[None], e_face)
    dh = jnp.maximum(e_face[:-1] - e_face[1:], _EPS)
    frac = jnp.clip((A[:-1] - A[1:]) / dh, 0.0, 1.0)
    # fully-open faces keep fraction one (interfaces above the crest
    # difference already gives dh/dh = 1 up to roundoff)
    return frac


def porous_widths_from_h(grid: Grid, h):
    """(porU, porV) per-layer open fractions from layer thicknesses,
    with interface heights e[K] = (htot - bathy) - sum_{l<K} h_l.
    Returns (None, None) when the grid has no subgrid topography."""
    if grid.porous_DavgU is None and grid.porous_DavgV is None:
        return None, None
    htot = jnp.sum(h, axis=0)
    eta = htot - grid.bathyT
    e = eta[None] - jnp.concatenate(
        [jnp.zeros_like(h[:1]), jnp.cumsum(h, axis=0)], axis=0)
    porU = porous_widths_layer(grid, e, "U") \
        if grid.porous_DavgU is not None else None
    porV = porous_widths_layer(grid, e, "V") \
        if grid.porous_DavgV is not None else None
    return porU, porV
