"""Z-space initial conditions (INIT_LAYERS_FROM_Z_FILE).

Re-design of MOM_temp_salt_initialize_from_Z
(/root/reference/src/initialization/MOM_state_initialization.F90:2407)
for the Z_INIT_ALE_REMAPPING=True path: the file's z-level T/S
profiles are treated as cell means on a column of z-cells (edges
midway between the stated depths, extended to the local bottom),
horizontally regridded to the model grid, and conservatively remapped
onto the model's target thicknesses with the ALE remapping core.

Host-side numpy + jax remap; runs once at initialization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mom6_tpu.ale.remapping import RemapCfg, remap_column_means
from mom6_tpu.initialization.horizontal_regrid import (bilinear_regrid,
                                                       fill_missing)

__all__ = ["z_edges_from_centers", "thickness_from_z_edges",
           "temp_salt_from_z", "tracer_from_z"]


def z_edges_from_centers(z_centers: np.ndarray,
                         max_depth: float) -> np.ndarray:
    """Interface depths for file z-levels given at cell centers:
    edge 0 at the surface, interior edges midway between centers, the
    bottom edge at max(max_depth, deepest center) so the last cell
    reaches the seafloor (find_interfaces-style extension)."""
    z = np.asarray(z_centers, np.float64)
    if np.any(np.diff(z) <= 0):
        raise ValueError("file depths must increase monotonically")
    edges = np.empty(z.size + 1)
    edges[0] = 0.0
    edges[1:-1] = 0.5 * (z[:-1] + z[1:])
    edges[-1] = max(max_depth, z[-1] + (z[-1] - edges[-2]))
    return edges


def thickness_from_z_edges(z_edges: np.ndarray, bathy: np.ndarray,
                           angstrom: float) -> np.ndarray:
    """Per-column thicknesses of fixed z-cells clipped by the local
    bottom depth: h[k] = max(min(e[k+1], D) - min(e[k], D), angstrom)."""
    e = np.asarray(z_edges, np.float64).reshape(
        (-1,) + (1,) * np.ndim(bathy))
    ecap = np.minimum(e, np.asarray(bathy)[None])
    return np.maximum(ecap[1:] - ecap[:-1], angstrom)


def tracer_from_z(tr_z: np.ndarray, src_lon: np.ndarray,
                  src_lat: np.ndarray, z_centers: np.ndarray,
                  dst_lon: np.ndarray, dst_lat: np.ndarray,
                  bathy: np.ndarray, h_target: jnp.ndarray,
                  angstrom: float,
                  remap_cfg: RemapCfg = RemapCfg(),
                  missing_value: float = -1e10) -> jnp.ndarray:
    """One tracer on model layers from a z-space file profile
    (MOM_tracer_Z_init.F90 tracer_Z_init): per-level missing fill,
    bilinear horizontal regrid, then conservative vertical remap onto
    the model thicknesses."""
    tr_z = np.asarray(tr_z, np.float64)
    valid = np.isfinite(tr_z) & (tr_z > missing_value)
    tr_f = fill_missing(tr_z, valid)
    tr_m = bilinear_regrid(tr_f, src_lon, src_lat, dst_lon, dst_lat)
    max_depth = float(np.max(bathy))
    z_edges = z_edges_from_centers(z_centers, max_depth)
    h_src = thickness_from_z_edges(z_edges, bathy, angstrom)
    return remap_column_means(jnp.asarray(h_src), jnp.asarray(tr_m),
                              jnp.asarray(h_target), remap_cfg)


def temp_salt_from_z(T_z: np.ndarray, S_z: np.ndarray,
                     src_lon: np.ndarray, src_lat: np.ndarray,
                     z_centers: np.ndarray,
                     dst_lon: np.ndarray, dst_lat: np.ndarray,
                     bathy: np.ndarray, h_target: jnp.ndarray,
                     angstrom: float,
                     remap_cfg: RemapCfg = RemapCfg(),
                     missing_value: float = -1e10):
    """T/S on model layers from z-space file profiles.

    T_z/S_z: (nz, ny_src, nx_src) file fields (values <= missing_value
    or non-finite are treated as missing and filled); z_centers: their
    depths [m]; dst_lon/dst_lat: model T-point coordinates (may be the
    halo-padded arrays); bathy: matching positive depths; h_target:
    (nk, ...) model thicknesses on the same points.

    Returns (T, S) as (nk, ...) jnp arrays.
    """
    T_z = np.asarray(T_z, np.float64)
    S_z = np.asarray(S_z, np.float64)
    valid = np.isfinite(T_z) & (T_z > missing_value) \
        & np.isfinite(S_z) & (S_z > missing_value)
    # fill per level so coastal values extend under land, then regrid
    T_f = fill_missing(T_z, valid)
    S_f = fill_missing(S_z, valid)
    T_m = bilinear_regrid(T_f, src_lon, src_lat, dst_lon, dst_lat)
    S_m = bilinear_regrid(S_f, src_lon, src_lat, dst_lon, dst_lat)

    max_depth = float(np.max(bathy))
    z_edges = z_edges_from_centers(z_centers, max_depth)
    h_src = thickness_from_z_edges(z_edges, bathy, angstrom)

    T = remap_column_means(jnp.asarray(h_src), jnp.asarray(T_m),
                           jnp.asarray(h_target), remap_cfg)
    S = remap_column_means(jnp.asarray(h_src), jnp.asarray(S_m),
                           jnp.asarray(h_target), remap_cfg)
    return T, S
