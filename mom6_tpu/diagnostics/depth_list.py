"""Hypsometric depth list for the APE-vs-depth ocean.stats machinery.

Re-design of /root/reference/src/diagnostics/MOM_sum_output.F90
depth_list_setup/create_depth_list/write_depth_list/read_depth_list
(:1067-1364): an ordered list of bottom depths with, at each depth,
the open cross-sectional area and the ocean volume below.  The stats
writer uses it to find the resting height Z_0APE of every interface
(the depth at which the fluid below that interface would sit if
levelled over the real hypsometry) and from that the available
potential energy — the reference's Energy/Mass column and the
``H0`` "Zero APE Depth" diagnostic.

TPU-first shape: the list is built once on the host (a numpy sort of
the gathered bathymetry — initialization-time work), then lives on
device as three replicated 1D arrays; the per-stats-interval Z_0APE
search is an in-graph ``searchsorted`` over those arrays, so the
whole stats computation stays a single jitted, shard_map-compatible
function with bitwise layout-invariant results (the per-layer volumes
feeding it come from EFP limb sums).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class DepthList(NamedTuple):
    """Sorted deepest-first: ``depth[0]`` is the deepest point and
    ``vol_below`` grows along the list (vol_below[i] = ocean volume
    strictly below depth[i]; area[i] = open area at depth[i])."""
    depth: jnp.ndarray
    area: jnp.ndarray
    vol_below: jnp.ndarray


def create_depth_list(domain, grid, min_depth_inc: float = 0.0
                      ) -> DepthList:
    """Build the list from the model bathymetry (create_depth_list,
    MOM_sum_output.F90:1108-1235).  ``min_depth_inc`` culls entries
    closer in depth than this increment (D_LIST_MIN_INC)."""
    D = np.asarray(domain.interior(grid.bathyT), np.float64).ravel()
    A = np.asarray(domain.interior(grid.areaT * grid.mask2dT),
                   np.float64).ravel()
    order = np.argsort(-D, kind="stable")     # deepest first
    Ds, As = D[order], A[order]

    depths, areas, vols = [], [], []
    vol = 0.0
    area = 0.0
    d_prev = Ds[0]
    d_listed = Ds[0]
    n = Ds.size
    for k in range(n):
        vol += area * (d_prev - Ds[k])
        area += As[k]
        if not depths or k == n - 1 \
                or (k + 1 < n and Ds[k + 1] < d_listed - min_depth_inc):
            depths.append(Ds[k])
            areas.append(area)
            vols.append(vol)
            if k + 1 < n:
                d_listed = Ds[k + 1]
        d_prev = Ds[k]
    # sentinel entry: an effectively-infinite volume so interface
    # searches always bracket (MOM_sum_output.F90:1227-1233)
    depths.append(depths[-1])
    areas.append(areas[-1])
    vols.append(vols[-1] * 1000.0 + 1.0)
    return DepthList(depth=jnp.asarray(np.asarray(depths)),
                     area=jnp.asarray(np.asarray(areas)),
                     vol_below=jnp.asarray(np.asarray(vols)))


def _grid_chksum(domain, grid) -> int:
    """Bitcount checksum tying a depth-list file to its topography
    (the reference stores depth/area/vol checksums in Depth_list.nc
    and refuses a stale file, MOM_sum_output.F90:1253-1300)."""
    d = np.ascontiguousarray(
        np.asarray(domain.interior(grid.bathyT), np.float64))
    return int(np.unpackbits(np.frombuffer(d.tobytes(),
                                           dtype=np.uint8)).sum())


def write_depth_list(path: str, dl: DepthList, domain, grid) -> None:
    from mom6_tpu.framework.io import write_fields
    write_fields(path,
                 {"depth": np.asarray(dl.depth),
                  "area": np.asarray(dl.area),
                  "vol_below": np.asarray(dl.vol_below)},
                 dims={"depth": ("list",), "area": ("list",),
                       "vol_below": ("list",)},
                 global_attrs={"depth_chksum": _grid_chksum(domain,
                                                            grid)})


def depth_list_setup(domain, grid, *, read_file: bool = False,
                     path: str = "Depth_list.nc",
                     min_depth_inc: float = 0.0,
                     require_chksum: bool = True) -> DepthList:
    """READ_DEPTH_LIST flow (depth_list_setup): read the cached file
    if present and its checksum matches the current topography, else
    compute and (when reading was requested) write it."""
    if read_file and os.path.exists(path):
        from mom6_tpu.framework.io import read_field, read_attrs
        try:
            attrs = read_attrs(path)
            stored = int(attrs.get("depth_chksum", -1))
            now = _grid_chksum(domain, grid)
            if stored == now:
                return DepthList(
                    depth=jnp.asarray(np.asarray(
                        read_field(path, "depth"), np.float64)),
                    area=jnp.asarray(np.asarray(
                        read_field(path, "area"), np.float64)),
                    vol_below=jnp.asarray(np.asarray(
                        read_field(path, "vol_below"), np.float64)))
            if require_chksum:
                from mom6_tpu.framework.error_handler import (MOM_error,
                                                              WARNING)
                MOM_error(WARNING,
                          f"Depth list file {path} checksum {stored} "
                          f"does not match topography {now}; "
                          "regenerating")
        except Exception:
            pass
    dl = create_depth_list(domain, grid, min_depth_inc)
    if read_file:
        try:
            write_depth_list(path, dl, domain, grid)
        except Exception:
            pass
    return dl
