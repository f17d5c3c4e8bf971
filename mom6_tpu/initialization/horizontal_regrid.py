"""Horizontal regridding of lat-lon source data onto the model grid.

Re-design of /root/reference/src/framework/MOM_horizontal_regridding.F90
(horiz_interp_and_extrap_tracer, :786): bilinear interpolation from a
regular source grid with nearest-edge extrapolation outside its extent,
plus an iterative Laplacian fill of masked (land / missing-value)
source points replacing the reference's fill_miss_2d smoother.

Host-side numpy: this runs once at initialization, outside jit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bilinear_regrid", "fill_missing"]


def fill_missing(field: np.ndarray, valid: np.ndarray,
                 n_iter: int = 200, tol: float = 1e-8) -> np.ndarray:
    """Fill points where ``valid`` is False by iterated neighbor
    averaging (Jacobi sweeps of a Laplacian fill, the fill_miss_2d
    analog).  ``field`` (..., ny, nx); ``valid`` broadcastable bool.

    Valid points are held fixed; missing points relax to the average
    of their defined 4-neighbors, so enclosed basins converge to the
    surrounding coastal values and fully-missing rows inherit from the
    nearest defined latitude.
    """
    f = np.array(field, dtype=np.float64)
    valid = np.broadcast_to(valid, f.shape)
    if valid.all():
        return f
    if not valid.any():
        raise ValueError("fill_missing: no valid source points")
    # seed missing points with the mean of the valid ones
    f = np.where(valid, f, f[valid].mean())
    for _ in range(n_iter):
        fp = np.pad(f, [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)],
                    mode="edge")
        nb = 0.25 * (fp[..., :-2, 1:-1] + fp[..., 2:, 1:-1]
                     + fp[..., 1:-1, :-2] + fp[..., 1:-1, 2:])
        new = np.where(valid, f, nb)
        delta = np.abs(new - f).max()
        f = new
        if delta < tol:
            break
    return f


def bilinear_regrid(src: np.ndarray, src_lon: np.ndarray,
                    src_lat: np.ndarray, dst_lon: np.ndarray,
                    dst_lat: np.ndarray) -> np.ndarray:
    """Bilinear interpolation of ``src`` (..., ny, nx) sampled at 1D
    monotonic ``src_lon`` / ``src_lat`` onto arbitrary destination
    points (dst_lon/dst_lat broadcast to the same 2D shape).

    Destination points outside the source extent clamp to the edge
    (nearest-edge extrapolation), matching the reference's use of
    clipped source indices for limited-area inputs.
    """
    src_lon = np.asarray(src_lon, np.float64)
    src_lat = np.asarray(src_lat, np.float64)
    dst_lon, dst_lat = np.broadcast_arrays(
        np.asarray(dst_lon, np.float64), np.asarray(dst_lat, np.float64))

    def axis_weights(src_c, dst_c):
        n = src_c.size
        if n == 1:
            i0 = np.zeros(dst_c.shape, np.intp)
            return i0, i0, np.zeros(dst_c.shape)
        sign = 1.0 if src_c[-1] >= src_c[0] else -1.0
        c = sign * src_c
        d = sign * dst_c
        i1 = np.clip(np.searchsorted(c, d), 1, n - 1)
        i0 = i1 - 1
        w = (d - c[i0]) / (c[i1] - c[i0])
        return i0, i1, np.clip(w, 0.0, 1.0)

    ix0, ix1, wx = axis_weights(src_lon, dst_lon)
    iy0, iy1, wy = axis_weights(src_lat, dst_lat)
    f00 = src[..., iy0, ix0]
    f01 = src[..., iy0, ix1]
    f10 = src[..., iy1, ix0]
    f11 = src[..., iy1, ix1]
    return ((1 - wy) * ((1 - wx) * f00 + wx * f01)
            + wy * ((1 - wx) * f10 + wx * f11))
