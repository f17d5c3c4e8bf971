"""Horizontal grid metrics on the Arakawa C-grid.

Re-design of ``ocean_grid_type`` and the analytic grid generators
(/root/reference/src/core/MOM_grid.F90:26,
/root/reference/src/initialization/MOM_grid_initialize.F90:58): a
frozen pytree of halo-padded metric arrays.  All metrics are computed
analytically on the *padded* index space (including halo rings outside
the physical domain), so boundary halos hold smooth extrapolations and
no metric halo exchange is ever needed.

Positional staggering (see parallel/domain.py): for cell (j, i) —
h/T points at centers; Cu quantities on the *east* face; Cv on the
*north* face; Bu at the *north-east* corner.

Masks follow the reference convention: ``mask2dT`` is 1 over ocean,
0 over land; face masks are products of the adjacent cell masks
(MOM_grid.F90 mask2dCu/Cv/Bu).  Reciprocal metrics use the Adcroft
rule: 1/x where x>0 else 0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain

__all__ = ["Grid", "cartesian_grid", "spherical_grid", "mercator_grid",
           "blockify"]

RADIUS_EARTH = 6.378e6     # m, matches reference default RAD_EARTH
OMEGA = 7.2921e-5          # s-1


def _adcroft_recip(x: np.ndarray) -> np.ndarray:
    return np.where(x > 0, 1.0 / np.where(x > 0, x, 1.0), 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Halo-padded metric pytree. All fields (njh, nih) float arrays."""

    domain: Domain = dataclasses.field(metadata=dict(static=True))

    # cell-center (T) metrics
    dxT: jnp.ndarray
    dyT: jnp.ndarray
    IdxT: jnp.ndarray
    IdyT: jnp.ndarray
    areaT: jnp.ndarray
    IareaT: jnp.ndarray
    # u-point (east face) metrics
    dxCu: jnp.ndarray
    dyCu: jnp.ndarray
    IdxCu: jnp.ndarray
    IdyCu: jnp.ndarray
    areaCu: jnp.ndarray
    IareaCu: jnp.ndarray
    # v-point (north face) metrics
    dxCv: jnp.ndarray
    dyCv: jnp.ndarray
    IdxCv: jnp.ndarray
    IdyCv: jnp.ndarray
    areaCv: jnp.ndarray
    IareaCv: jnp.ndarray
    # corner (B) metrics
    dxBu: jnp.ndarray
    dyBu: jnp.ndarray
    IdxBu: jnp.ndarray
    IdyBu: jnp.ndarray
    areaBu: jnp.ndarray
    IareaBu: jnp.ndarray
    # masks
    mask2dT: jnp.ndarray
    mask2dCu: jnp.ndarray
    mask2dCv: jnp.ndarray
    mask2dBu: jnp.ndarray
    # physics
    CoriolisBu: jnp.ndarray       # f at corners [s-1]
    bathyT: jnp.ndarray           # positive depth at T points [m]
    # coordinates (degrees or km, for diagnostics/forcing)
    geoLatT: jnp.ndarray
    geoLonT: jnp.ndarray
    geoLatCu: jnp.ndarray
    geoLonCu: jnp.ndarray
    geoLatCv: jnp.ndarray
    geoLonCv: jnp.ndarray
    geoLatBu: jnp.ndarray
    geoLonBu: jnp.ndarray
    # porous-barrier subgrid topography at faces (SUBGRID_TOPO_AT_VEL;
    # heights, negative down, like the reference's porous_D*): None
    # unless a TOPO_AT_VEL file was read
    porous_DminU: Optional[jnp.ndarray] = None
    porous_DmaxU: Optional[jnp.ndarray] = None
    porous_DavgU: Optional[jnp.ndarray] = None
    porous_DminV: Optional[jnp.ndarray] = None
    porous_DmaxV: Optional[jnp.ndarray] = None
    porous_DavgV: Optional[jnp.ndarray] = None

    @property
    def H(self) -> int:
        return self.domain.halo


def _padded_index(domain: Domain):
    """Global padded fractional index arrays (can be <0 or >n)."""
    H = domain.halo
    i = np.arange(-H, domain.ni + H)
    j = np.arange(-H, domain.nj + H)
    return j, i


def _build(domain: Domain, lon_c, lat_c, lon_f, lat_f, dx_fn, dy_fn,
           f_fn, depth_fn, min_depth: float) -> Grid:
    """Assemble a Grid from coordinate arrays and metric callables.

    lon_c/lat_c: 1D padded center coords; lon_f/lat_f: 1D padded
    *east/north face* coords (face i = east face of cell i).
    dx_fn(lon_spacing, lat) → physical dx; likewise dy_fn.
    """
    # 2D coordinate fields (y varies along rows, x along columns)
    LaT, LoT = np.meshgrid(lat_c, lon_c, indexing="ij")
    LaCu, LoCu = np.meshgrid(lat_c, lon_f, indexing="ij")
    LaCv, LoCv = np.meshgrid(lat_f, lon_c, indexing="ij")
    LaBu, LoBu = np.meshgrid(lat_f, lon_f, indexing="ij")

    dlon = lon_c[1] - lon_c[0]    # uniform spacing assumed
    dlat = lat_c[1] - lat_c[0]

    dxT = dx_fn(dlon, LaT)
    dyT = dy_fn(dlat, LaT)
    dxCu = dx_fn(dlon, LaCu)
    dyCu = dy_fn(dlat, LaCu)
    dxCv = dx_fn(dlon, LaCv)
    dyCv = dy_fn(dlat, LaCv)
    dxBu = dx_fn(dlon, LaBu)
    dyBu = dy_fn(dlat, LaBu)

    areaT = dxT * dyT
    depth = depth_fn(LoT, LaT)
    f = f_fn(LoBu, LaBu)
    return _assemble(
        domain, depth, min_depth, f,
        dict(dxT=dxT, dyT=dyT, areaT=areaT,
             dxCu=dxCu, dyCu=dyCu, areaCu=dxCu * dyCu,
             dxCv=dxCv, dyCv=dyCv, areaCv=dxCv * dyCv,
             dxBu=dxBu, dyBu=dyBu, areaBu=dxBu * dyBu),
        dict(geoLatT=LaT, geoLonT=LoT, geoLatCu=LaCu, geoLonCu=LoCu,
             geoLatCv=LaCv, geoLonCv=LoCv, geoLatBu=LaBu,
             geoLonBu=LoBu))


def _assemble(domain: Domain, depth, min_depth: float, f_Bu,
              metrics: dict, coords: dict) -> Grid:
    """Masks, Adcroft reciprocals and Grid packing from halo-padded
    metric/coordinate arrays."""
    # Apply the domain's boundary semantics to the topography before
    # deriving masks: halo cells beyond a solid wall become land
    # (depth 0), reentrant halos wrap — so wall faces get mask 0, just
    # as the reference obtains land halos from pass_var on the depth
    # field (MOM_shared_initialization / mpp halo semantics).
    d1 = dataclasses.replace(domain, layout=(1, 1), shmap=False)
    depth = np.asarray(d1.fill_halos(jnp.asarray(depth)))
    maskT = (depth > min_depth).astype(np.float64)
    maskCu = maskT * np.roll(maskT, -1, axis=-1)
    maskCv = maskT * np.roll(maskT, -1, axis=-2)
    maskBu = maskCu * np.roll(maskCu, -1, axis=-2)
    # land depth clamped to 0 for cleanliness
    depth = np.where(maskT > 0, depth, 0.0)

    a = jnp.asarray
    m = metrics
    return Grid(
        domain=domain,
        dxT=a(m["dxT"]), dyT=a(m["dyT"]),
        IdxT=a(_adcroft_recip(m["dxT"])),
        IdyT=a(_adcroft_recip(m["dyT"])),
        areaT=a(m["areaT"]), IareaT=a(_adcroft_recip(m["areaT"])),
        dxCu=a(m["dxCu"]), dyCu=a(m["dyCu"]),
        IdxCu=a(_adcroft_recip(m["dxCu"])),
        IdyCu=a(_adcroft_recip(m["dyCu"])), areaCu=a(m["areaCu"]),
        IareaCu=a(_adcroft_recip(m["areaCu"])),
        dxCv=a(m["dxCv"]), dyCv=a(m["dyCv"]),
        IdxCv=a(_adcroft_recip(m["dxCv"])),
        IdyCv=a(_adcroft_recip(m["dyCv"])), areaCv=a(m["areaCv"]),
        IareaCv=a(_adcroft_recip(m["areaCv"])),
        dxBu=a(m["dxBu"]), dyBu=a(m["dyBu"]),
        IdxBu=a(_adcroft_recip(m["dxBu"])),
        IdyBu=a(_adcroft_recip(m["dyBu"])),
        areaBu=a(m["areaBu"]),
        IareaBu=a(_adcroft_recip(m["areaBu"])),
        mask2dT=a(maskT), mask2dCu=a(maskCu), mask2dCv=a(maskCv),
        mask2dBu=a(maskBu),
        CoriolisBu=a(f_Bu), bathyT=a(depth),
        **{k: a(v) for k, v in coords.items()},
    )


def cartesian_grid(domain: Domain, lenlon_km: float, lenlat_km: float,
                   f0: float = 0.0, beta: float = 0.0,
                   depth_fn=None, max_depth: float = 4000.0,
                   min_depth: float = 0.0,
                   south_lat: float = 0.0, west_lon: float = 0.0,
                   beta_lat_ref: float = 0.0) -> Grid:
    """Uniform Cartesian grid (AXIS_UNITS='k' of MOM_grid_initialize).

    Coordinates are in km; metrics in meters.  Coriolis is an f/beta
    plane about BETA_LAT_REF (default 0, i.e. absolute latitude —
    set_rotation_beta_plane,
    /root/reference/src/initialization/MOM_shared_initialization.F90:522-528).
    """
    j, i = _padded_index(domain)
    dxi = lenlon_km / domain.ni
    deta = lenlat_km / domain.nj
    lon_c = west_lon + (i + 0.5) * dxi
    lat_c = south_lat + (j + 0.5) * deta
    lon_f = west_lon + (i + 1.0) * dxi     # east face of cell i
    lat_f = south_lat + (j + 1.0) * deta   # north face of cell j

    def dx_fn(dlon, lat):
        return np.full_like(lat, dlon * 1e3)

    def dy_fn(dlat, lat):
        return np.full_like(lat, dlat * 1e3)

    def f_fn(lon, lat):
        return f0 + beta * (lat - beta_lat_ref) * 1e3

    if depth_fn is None:
        def depth_fn(lon, lat):
            return np.full_like(lat, max_depth)

    return _build(domain, lon_c, lat_c, lon_f, lat_f, dx_fn, dy_fn,
                  f_fn, depth_fn, min_depth)


def spherical_grid(domain: Domain, west_lon: float, lenlon: float,
                   south_lat: float, lenlat: float,
                   depth_fn=None, max_depth: float = 4000.0,
                   min_depth: float = 0.0,
                   radius: float = RADIUS_EARTH) -> Grid:
    """Uniform lat-lon grid (set_grid_metrics_spherical,
    MOM_grid_initialize.F90)."""
    j, i = _padded_index(domain)
    dlon = lenlon / domain.ni
    dlat = lenlat / domain.nj
    lon_c = west_lon + (i + 0.5) * dlon
    lat_c = south_lat + (j + 0.5) * dlat
    lon_f = west_lon + (i + 1.0) * dlon
    lat_f = south_lat + (j + 1.0) * dlat

    deg2rad = np.pi / 180.0

    def dx_fn(dlon_, lat):
        return radius * deg2rad * dlon_ * np.cos(deg2rad * lat)

    def dy_fn(dlat_, lat):
        return np.full_like(lat, radius * deg2rad * dlat_)

    def f_fn(lon, lat):
        return 2.0 * OMEGA * np.sin(deg2rad * lat)

    if depth_fn is None:
        def depth_fn(lon, lat):
            return np.full_like(lat, max_depth)

    return _build(domain, lon_c, lat_c, lon_f, lat_f, dx_fn, dy_fn,
                  f_fn, depth_fn, min_depth)


def mercator_grid(domain: Domain, west_lon: float, lenlon: float,
                  south_lat: float, north_lat: float | None = None,
                  depth_fn=None, max_depth: float = 4000.0,
                  min_depth: float = 0.0,
                  radius: float = RADIUS_EARTH) -> Grid:
    """Isotropic Mercator grid (set_grid_metrics_mercator,
    MOM_grid_initialize.F90): uniform spacing in the Mercator
    coordinate y = ln(tan(π/4 + φ/2)), so dx = dy locally and
    dy ∝ sec(φ)·dφ."""
    deg2rad = np.pi / 180.0

    def to_merc(lat_deg):
        return np.log(np.tan(np.pi / 4.0 + 0.5 * deg2rad * lat_deg))

    def from_merc(y):
        return (2.0 * np.arctan(np.exp(y)) - np.pi / 2.0) / deg2rad

    dlon = lenlon / domain.ni
    y_s = to_merc(south_lat)
    if north_lat is None:
        # exact isotropy: Mercator spacing equals the longitude spacing
        dy_m = deg2rad * dlon
        y_n = y_s + domain.nj * dy_m
    else:
        y_n = to_merc(north_lat)
        dy_m = (y_n - y_s) / domain.nj
    j, i = _padded_index(domain)
    lon_c = west_lon + (i + 0.5) * dlon
    lon_f = west_lon + (i + 1.0) * dlon
    lat_c = from_merc(y_s + (j + 0.5) * dy_m)
    lat_f = from_merc(y_s + (j + 1.0) * dy_m)

    def dx_fn(dlon_, lat):
        return radius * deg2rad * dlon_ * np.cos(deg2rad * lat)

    def dy_fn(dlat_, lat):
        # the Mercator dy varies with latitude: dy = R cos(φ) dy_merc
        return radius * np.cos(deg2rad * lat) * dy_m

    def f_fn(lon, lat):
        return 2.0 * OMEGA * np.sin(deg2rad * lat)

    if depth_fn is None:
        def depth_fn(lon, lat):
            return np.full_like(lat, max_depth)

    return _build(domain, lon_c, lat_c, lon_f, lat_f, dx_fn, dy_fn,
                  f_fn, depth_fn, min_depth)


def _pad_metric(domain: Domain, interior: np.ndarray) -> np.ndarray:
    """Halo-pad an interior (nj, ni) metric: wrap along reentrant axes,
    edge-replicate at solid walls (metrics must stay positive in halos
    so Adcroft reciprocals behave; masks handle land)."""
    H = domain.halo
    out = np.pad(interior, ((H, H), (0, 0)),
                 mode="wrap" if domain.reentrant_y else "edge")
    return np.pad(out, ((0, 0), (H, H)),
                  mode="wrap" if domain.reentrant_x else "edge")


def mosaic_grid(domain: Domain, grid_file: str, depth_fn=None,
                min_depth: float = 0.0) -> Grid:
    """Read the horizontal grid from an FMS mosaic supergrid file
    (GRID_CONFIG='mosaic'; set_grid_metrics_from_mosaic,
    /root/reference/src/initialization/MOM_grid_initialize.F90:127).

    The supergrid holds coordinates x,y at (2nj+1, 2ni+1) points,
    segment lengths dx (2nj+1, 2ni) / dy (2nj, 2ni+1) and cell areas
    (2nj, 2ni) at double resolution: model cell (j,i) spans supergrid
    cells [2j:2j+2, 2i:2i+2], its center sits at supergrid point
    (2j+1, 2i+1) and its NE corner at (2j+2, 2i+2).  Cell metrics sum
    the two supergrid segments crossing the point; halos wrap along
    reentrant axes and edge-replicate at walls.
    """
    from mom6_tpu.framework.io import read_field
    x = np.asarray(read_field(grid_file, "x"), np.float64)
    y = np.asarray(read_field(grid_file, "y"), np.float64)
    sdx = np.asarray(read_field(grid_file, "dx"), np.float64)
    sdy = np.asarray(read_field(grid_file, "dy"), np.float64)
    sarea = np.asarray(read_field(grid_file, "area"), np.float64)
    nj, ni = domain.nj, domain.ni
    if x.shape != (2 * nj + 1, 2 * ni + 1):
        raise ValueError(
            f"supergrid x shape {x.shape} incompatible with "
            f"NIGLOBAL={ni}, NJGLOBAL={nj} (want {(2*nj+1, 2*ni+1)})")

    jc = 2 * np.arange(nj) + 1          # center rows/cols
    ic = 2 * np.arange(ni) + 1
    jf = 2 * np.arange(nj) + 2          # north-face / NE-corner rows
    if_ = 2 * np.arange(ni) + 2         # east-face cols
    # supergrid segment indices straddling a face position p are p-1,p;
    # the last face's second segment (index 2n) does not exist in the
    # file — wrap for reentrant axes, duplicate the last segment at
    # walls (the face is masked land there anyway)
    ix2 = np.where(if_ < 2 * ni, if_, 0 if domain.reentrant_x
                   else 2 * ni - 1)
    jy2 = np.where(jf < 2 * nj, jf, 0 if domain.reentrant_y
                   else 2 * nj - 1)

    dxT = sdx[jc][:, 2 * np.arange(ni)] + sdx[jc][:, ic]
    dyT = sdy[2 * np.arange(nj)][:, ic] + sdy[jc - 1 + 1][:, ic] \
        if False else sdy[2 * np.arange(nj)][:, ic] + sdy[jc][:, ic]
    dxCu = sdx[jc][:, ic] + sdx[jc][:, ix2]
    dyCu = sdy[2 * np.arange(nj)][:, if_] + sdy[jc][:, if_]
    dxCv = sdx[jf][:, 2 * np.arange(ni)] + sdx[jf][:, ic]
    dyCv = sdy[jc][:, ic] + sdy[jy2][:, ic]
    dxBu = sdx[jf][:, ic] + sdx[jf][:, ix2]
    dyBu = sdy[jc][:, if_] + sdy[jy2][:, if_]
    areaT = (sarea[::2, ::2] + sarea[1::2, ::2]
             + sarea[::2, 1::2] + sarea[1::2, 1::2])

    lonT, latT = x[jc[:, None], ic], y[jc[:, None], ic]
    lonCu, latCu = x[jc[:, None], if_], y[jc[:, None], if_]
    lonCv, latCv = x[jf[:, None], ic], y[jf[:, None], ic]
    lonBu, latBu = x[jf[:, None], if_], y[jf[:, None], if_]

    P = lambda arr: _pad_metric(domain, arr)
    metrics = dict(dxT=P(dxT), dyT=P(dyT), areaT=P(areaT),
                   dxCu=P(dxCu), dyCu=P(dyCu),
                   areaCu=P(dxCu) * P(dyCu),
                   dxCv=P(dxCv), dyCv=P(dyCv),
                   areaCv=P(dxCv) * P(dyCv),
                   dxBu=P(dxBu), dyBu=P(dyBu),
                   areaBu=P(dxBu) * P(dyBu))
    coords = dict(geoLatT=P(latT), geoLonT=P(lonT),
                  geoLatCu=P(latCu), geoLonCu=P(lonCu),
                  geoLatCv=P(latCv), geoLonCv=P(lonCv),
                  geoLatBu=P(latBu), geoLonBu=P(lonBu))

    deg2rad = np.pi / 180.0
    f = 2.0 * OMEGA * np.sin(deg2rad * coords["geoLatBu"])
    if depth_fn is None:
        def depth_fn(lon, lat):
            return np.full_like(lat, 4000.0)
    depth = depth_fn(coords["geoLonT"], coords["geoLatT"])
    return _assemble(domain, depth, min_depth, f, metrics, coords)


def blockify(domain: Domain, padded_global: jnp.ndarray) -> jnp.ndarray:
    """Padded-global (..., nj+2H, ni+2H) → blocked (..., py*njh, px*nih).

    Unlike pad_field (which zero-fills halos), each tile's halos carry
    the true neighboring values from the padded global array, wrapping
    at reentrant edges.  Used to distribute grid metrics whose halos
    are analytic.
    """
    px, py = domain.layout
    H = domain.halo
    njl, nil = domain.njl, domain.nil
    x = np.asarray(padded_global)
    lead = x.shape[:-2]
    out = np.zeros(lead + (py, njl + 2 * H, px, nil + 2 * H), x.dtype)
    for by in range(py):
        for bx in range(px):
            j0, i0 = by * njl, bx * nil          # tile origin (compute)
            out[..., by, :, bx, :] = x[..., j0:j0 + njl + 2 * H,
                                       i0:i0 + nil + 2 * H]
    return jnp.asarray(out.reshape(lead + (py * (njl + 2 * H),
                                           px * (nil + 2 * H))))


def blockify_grid(domain_sharded: Domain, grid: Grid) -> Grid:
    """Re-block every metric of a single-device Grid for a sharded run."""
    def conv(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 2:
            return blockify(domain_sharded, x)
        return x
    kw = {f.name: getattr(grid, f.name) for f in dataclasses.fields(Grid)}
    for k, v in list(kw.items()):
        if k != "domain":
            kw[k] = conv(v)
    kw["domain"] = domain_sharded
    return Grid(**kw)
