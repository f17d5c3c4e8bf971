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


def _nbrs(a: np.ndarray, const: float = 0.0):
    """4-neighbor views of (..., ny, nx) with constant out-of-domain
    padding (the closed-boundary pass_var semantics): (E, W, N, S)."""
    ap = np.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)],
                mode="constant", constant_values=const)
    return (ap[..., 1:-1, 2:], ap[..., 1:-1, :-2],
            ap[..., 2:, 1:-1], ap[..., :-2, 1:-1])


def fill_missing(field: np.ndarray, valid: np.ndarray,
                 n_iter: int = 10000, tol: float = 1e-8,
                 relax: float = 0.25, prev: np.ndarray | None = None,
                 fill_mask: np.ndarray | None = None) -> np.ndarray:
    """Creeping-sea fill + Laplacian relaxation of missing points
    (fill_miss_2d, MOM_horizontal_regridding.F90:99-272).

    Stage 1 (creeping): the valid mask expands outward one ring per
    pass — each missing point adjacent to ≥1 currently-valid neighbor
    takes the average of ONLY those valid neighbors, so coastal values
    creep into unresolved bays and marginal seas instead of a basin
    mean diffusing in.  Points unreachable from any valid data
    (enclosed fully-missing basins) take ``prev`` — the
    previous-vertical-level first guess of the reference (:208-210) —
    or the valid-data mean when no prev exists.

    Stage 2: Laplacian smoothing of the filled points only (valid
    data held fixed) with relaxation coefficient ``relax`` (the
    reference's relc=0.25 default), iterated until the max change is
    ≤ ``tol`` (acrit) or ``n_iter`` (num_pass) passes, using the
    post-2019 rotationally-symmetric operand grouping.

    ``fill_mask`` restricts which missing points are filled/smoothed
    (the reference's separate fill argument; e.g. model-land points
    excluded); default: every invalid point.
    """
    f = np.array(field, dtype=np.float64)
    valid = np.broadcast_to(valid, f.shape).astype(bool)
    if valid.all():
        return f
    if not valid.any():
        raise ValueError("fill_missing: no valid source points")
    fill = (~valid if fill_mask is None
            else np.broadcast_to(fill_mask, f.shape).astype(bool))
    fill = fill & ~valid
    f = np.where(valid, f, 0.0)

    # ---- stage 1: creeping fill ----
    good = valid.copy()
    remaining = fill.copy()
    for _ in range(f.shape[-1] + f.shape[-2]):
        if not remaining.any():
            break
        gE, gW, gN, gS = _nbrs(good.astype(np.float64))
        fE, fW, fN, fS = _nbrs(f)
        ngood = (gE + gW) + (gN + gS)
        nb = ((gE * fE + gW * fW) + (gN * fN + gS * fS)) \
            / np.maximum(ngood, 1.0)
        newly = remaining & (ngood > 0)
        f = np.where(newly, nb, f)
        good |= newly
        remaining &= ~newly
    if remaining.any():
        # disconnected from all valid data: previous-level guess
        if prev is not None:
            f = np.where(remaining, np.broadcast_to(prev, f.shape), f)
        else:
            f = np.where(remaining, f[valid].mean(), f)

    # ---- stage 2: Laplacian relaxation of the filled points ----
    wgt = (valid | fill).astype(np.float64)
    for _ in range(n_iter):
        wE, wW, wN, wS = _nbrs(wgt)
        fE, fW, fN, fS = _nbrs(f)
        chg = relax * (((wS * fS + wN * fN) + (wW * fW + wE * fE))
                       - ((wS + wN) + (wW + wE)) * f)
        chg = np.where(fill, chg, 0.0)
        f = f + chg
        if np.abs(chg).max() <= tol:
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
