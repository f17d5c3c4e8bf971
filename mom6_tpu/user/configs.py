"""Idealized test-case configurations.

Re-design of the reference's user-configuration library
(/root/reference/src/user/): named topography / thickness / velocity /
T-S initializations selected by config strings, covering the classic
process studies:

* ``phillips``  — Phillips 2-layer baroclinic-instability channel
  (Phillips_initialization.F90): sloped interface in thermal-wind
  balance with a zonal jet + small perturbation.
* ``sloshing``  — free-oscillation interface displacement
  (sloshing_initialization.F90).
* ``seamount``  — Gaussian seamount (seamount_initialization.F90).
* ``dumbbell``  — two reservoirs joined by a strait
  (dumbbell_initialization.F90).
* ``dome2d``    — 2D overflow ramp (DOME2d_initialization.F90).

Each entry provides ``depth_fn`` and/or state initializers consumed by
model.build_model when THICKNESS_CONFIG/TOPO_CONFIG name them.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

__all__ = ["topo_registry", "thickness_registry"]


# ---------------------------------------------------------------------
# topography generators: fn(lon, lat, ctx) → depth (positive down)
# ---------------------------------------------------------------------

def topo_seamount(lon, lat, ctx):
    """Gaussian seamount in the domain center."""
    d0 = ctx["max_depth"]
    h0 = ctx.get("seamount_height", 0.5 * d0)
    Lsm = ctx.get("seamount_length", 0.2 * ctx["lenlon"])
    x0 = ctx["west"] + 0.5 * ctx["lenlon"]
    y0 = ctx["south"] + 0.5 * ctx["lenlat"]
    r2 = ((lon - x0) / Lsm) ** 2 + ((lat - y0) / Lsm) ** 2
    return d0 - h0 * np.exp(-r2)


def topo_dome2d(lon, lat, ctx):
    """2D DOME overflow: shallow bay in the west, linear slope, deep
    basin in the east (DOME2d_initialize_topography,
    /root/reference/src/user/DOME2d_initialization.F90:40)."""
    d0 = ctx["max_depth"]
    l1 = ctx.get("dome2d_shelf_width", 0.1)
    l2 = 1.0 - ctx.get("dome2d_basin_width", 0.3)
    bay = ctx.get("dome2d_shelf_depth", 0.2)
    x = (lon - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    ramp = bay * d0 + (1.0 - bay) * d0 * (x - l1) / max(l2 - l1, 1e-30)
    return np.where(x <= l1, bay * d0,
                    np.where(x < l2, ramp, d0))


def topo_dumbbell(lon, lat, ctx):
    """Two wide reservoirs connected by a narrow strait
    (dumbbell_initialize_topography, dumbbell_initialization.F90:30):
    land where |x/dblen| <= 1/4 and |y/lenlat| >= dbfrac/2, with
    coordinates centered on the domain."""
    d0 = ctx["max_depth"]
    dblen = ctx.get("dumbbell_len", 600.0)
    dbfrac = ctx.get("dumbbell_fraction", 0.5)
    rotate = ctx.get("dumbbell_rotation", False)
    xc = ctx["west"] + 0.5 * ctx["lenlon"]
    yc = ctx["south"] + 0.5 * ctx["lenlat"]
    if rotate:
        x = (lat - yc) / max(dblen, 1e-30)
        y = (lon - xc) / max(ctx["lenlon"], 1e-30)
    else:
        x = (lon - xc) / max(dblen, 1e-30)
        y = (lat - yc) / max(ctx["lenlat"], 1e-30)
    land = (np.abs(x) <= 0.25) & (np.abs(y) >= 0.5 * dbfrac)
    return np.where(land, 0.0, d0)


def topo_benchmark(lon, lat, ctx):
    """The benchmark test-case topography
    (benchmark_initialization.F90:benchmark_initialize_topography):
    D = −D0·(y(1+0.6cos4πx) + 0.75e^{−6y} + 0.05cos10πx − 0.7) with
    D0 = 2·max_depth, clipped to [min_depth→0, max_depth]."""
    d0 = ctx["max_depth"] / 0.5
    x = (lon - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    y = (lat - ctx["south"]) / max(ctx["lenlat"], 1e-30)
    D = -d0 * (y * (1.0 + 0.6 * np.cos(4.0 * np.pi * x))
               + 0.75 * np.exp(-6.0 * y)
               + 0.05 * np.cos(10.0 * np.pi * x) - 0.7)
    D = np.minimum(D, ctx["max_depth"])
    return np.where(D < ctx["min_depth"], 0.0, D)


def topo_halfpipe(lon, lat, ctx):
    """Zonally uniform channel with a half-sine meridional profile
    (initialize_topography_named 'halfpipe',
    MOM_shared_initialization.F90:358)."""
    dedge = ctx.get("edge_depth", 100.0)
    y = (lat - ctx["south"]) / max(ctx["lenlat"], 1e-30)
    return dedge + (ctx["max_depth"] - dedge) \
        * np.abs(np.sin(np.pi * y))


def topo_dome(lon, lat, ctx):
    """DOME: a deep basin with a continental slope rising to a shelf
    along the north, cut by an embayment channel in the northwest
    (DOME_initialization.F90 DOME_initialize_topography)."""
    H = ctx["max_depth"]
    south, lenlat = ctx["south"], ctx["lenlat"]
    west, lenlon = ctx["west"], ctx["lenlon"]
    yn = (lat - south) / max(lenlat, 1e-30)
    shelf = ctx.get("shelf_depth", 600.0)
    # slope from full depth at yn=0.5 up to the shelf at yn=0.8
    d = H - (H - shelf) * np.clip((yn - 0.5) / 0.3, 0.0, 1.0)
    # embayment: a channel through the shelf near the west
    x0 = west + 0.15 * lenlon
    chan = np.abs(lon - x0) < 0.05 * lenlon
    d = np.where(chan & (yn > 0.8), shelf, d)
    return np.maximum(d, ctx.get("min_depth", 1.0))


def topo_isomip(lon, lat, ctx):
    """ISOMIP bedrock: deepens linearly into the cavity
    (ISOMIP_initialization.F90 essence: flat far field + sloped
    bedrock under the shelf)."""
    H = ctx["max_depth"]
    west, lenlon = ctx["west"], ctx["lenlon"]
    xn = np.clip((lon - west) / max(lenlon, 1e-30), 0.0, 1.0)
    return H * (0.6 + 0.4 * xn)


def topo_dense_water(lon, lat, ctx):
    """Dense-water shelf/slope: shallow shelf on the south third,
    linear slope to the deep basin (dense_water_initialization.F90)."""
    H = ctx["max_depth"]
    south, lenlat = ctx["south"], ctx["lenlat"]
    yn = np.clip((lat - south) / max(lenlat, 1e-30), 0.0, 1.0)
    shelf = ctx.get("shelf_depth", 500.0)
    return shelf + (H - shelf) * np.clip((yn - 0.3) / 0.4, 0.0, 1.0)


def _spike(x, L):
    """sin-spike: 1 at x=0 falling to 0 at |x|=L
    (Neverworld_initialization.F90:96)."""
    xn = np.minimum(np.abs(x) / L, 1.0)
    return (1.0 - np.sin(0.5 * np.pi * xn))


def _cosbell(x, L):
    """Cosine bell of unit height and half-width L
    (Neverworld_initialization.F90:86)."""
    xn = np.minimum(np.abs(x) / L, 1.0)
    return 0.5 * (1.0 + np.cos(np.pi * xn))


def topo_neverworld(lon, lat, ctx):
    """Neverworld2 topography: northern wall + Antarctica spikes,
    idealized South America / Africa / Antarctic Peninsula continents,
    Drake Passage ridge, Scotia Arc bells, and wavy roughness
    (Neverworld_initialize_topography,
    /root/reference/src/user/Neverworld_initialization.F90:34-84)."""
    H = ctx["max_depth"]
    amp = ctx.get("nl_continent_amp", 1.0)
    rough = ctx.get("nl_roughness_amp", 0.05)
    x = (lon - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    y = (lat - ctx["south"]) / max(ctx["lenlat"], 1e-30)
    d = (1.0 - 1.1 * _spike(y - 1.0, 0.12) - 1.1 * _spike(y, 0.12)
         - amp * (
             (1.2 * _spike(x, 0.2) + 1.2 * _spike(x - 1.0, 0.2))
             * _spike(np.minimum(0.0, y - 0.3), 0.2)       # S. America
             + 1.2 * _spike(x - 0.5, 0.2)
             * _spike(np.minimum(0.0, y - 0.55), 0.2)      # Africa
             + 1.2 * (_spike(x, 0.12) + _spike(x - 1.0, 0.12))
             * _spike(np.maximum(0.0, y - 0.06), 0.12)     # Peninsula
             + 0.1 * (_cosbell(x, 0.1) + _cosbell(x - 1.0, 0.1))
             + 0.5 * _cosbell(x - 0.16, 0.05)
             * _cosbell(y - 0.18, 0.13) ** 0.4
             + 0.4 * _cosbell(x - 0.09, 0.08) ** 0.4
             * _cosbell(y - 0.26, 0.05)
             + 0.4 * _cosbell(x - 0.08, 0.08) ** 0.4
             * _cosbell(y - 0.1, 0.05))
         - rough * np.cos(14 * np.pi * x) * np.sin(14 * np.pi * y)
         - rough * np.cos(20 * np.pi * x) * np.cos(20 * np.pi * y))
    # limit_topography clips to MAXIMUM_DEPTH after the user config
    # (MOM_shared_initialization.F90)
    return np.minimum(np.maximum(d, 0.0), 1.0) * H


def topo_shelfwave(lon, lat, ctx):
    """Exponential cross-shore shelf: D = H0·exp(2y/Ly)
    (shelfwave_initialize_topography,
    /root/reference/src/user/shelfwave_initialization.F90:105)."""
    H0 = max(ctx["min_depth"], 10.0)
    Ly = ctx.get("shelfwave_y_length_scale", 50.0)
    y = lat - ctx["south"]
    return np.minimum(H0 * np.exp(2.0 * y / max(Ly, 1e-30)),
                      ctx["max_depth"])


topo_registry = {
    "seamount": topo_seamount,
    "dome2d": topo_dome2d,
    "dumbbell": topo_dumbbell,
    "benchmark": topo_benchmark,
    "halfpipe": topo_halfpipe,
    "dome": topo_dome,
    "isomip": topo_isomip,
    "dense_water": topo_dense_water,
    "neverworld": topo_neverworld,
    "shelfwave": topo_shelfwave,
}


# ---------------------------------------------------------------------
# thickness/velocity initializers:
#   fn(ctx) → dict(h=..., u=..., v=..., T=..., S=...)  (padded arrays)
# ctx provides grid/domain/vgrid plus parsed parameters
# ---------------------------------------------------------------------

def init_phillips(ctx):
    """Phillips 2-layer channel: interface eta = -H/2 + slope*(y-y0)
    with the thermal-wind jet u1-u2 = -(g'/f) d(eta)/dy, plus a small
    wave perturbation to seed the instability."""
    grid, vgrid, domain = ctx["grid"], ctx["vgrid"], ctx["domain"]
    nk = vgrid.nk
    assert nk == 2, "phillips config requires NK=2"
    f0 = ctx.get("f0", 1e-4)
    gp = float(vgrid.g_prime[1])
    H0 = ctx["max_depth"]
    lenlat = ctx["lenlat"]
    south = ctx["south"]
    slope = ctx.get("phillips_slope", 0.0005)      # interface slope
    amp = ctx.get("phillips_amp", 10.0)            # perturbation [m]

    latT = np.asarray(grid.geoLatT)
    lonT = np.asarray(grid.geoLonT)
    y = (latT - south - 0.5 * lenlat) * 1e3        # meters from center
    lam = ctx["lenlon"] * 1e3 / 2.0                # wavelength/2
    pert = amp * np.sin(2 * np.pi * (lonT * 1e3) / lam) \
        * np.exp(-(y / (0.25 * lenlat * 1e3)) ** 2)
    eta1 = -0.5 * H0 + slope * y + pert            # interface height
    eta1 = np.clip(eta1, -H0 + 1.0, -1.0)
    h1 = -eta1                                     # top layer
    h2 = H0 + eta1
    h = jnp.asarray(np.stack([h1, h2]))

    # thermal wind: u1 − u2 = −(g'/f) dη/dy ; put shear in layer 1
    latCu = np.asarray(grid.geoLatCu)
    yC = (latCu - south - 0.5 * lenlat) * 1e3
    u1 = -(gp / f0) * slope * np.ones_like(yC)
    u = jnp.asarray(np.stack([u1, np.zeros_like(u1)]))
    v = jnp.zeros_like(u)
    return dict(h=h, u=u * np.asarray(grid.mask2dCu), v=v)


def init_sloshing(ctx):
    """Tilted-interface free oscillation (sloshing)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    amp = ctx.get("sloshing_amp", 75.0)
    lonT = np.asarray(grid.geoLonT)
    xn = (lonT - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    # displace interior interfaces by a half-cosine in x
    disp = amp * np.cos(np.pi * xn)
    z_nom = np.linspace(0.0, H0, nk + 1)
    e = -(z_nom[:, None, None] * np.ones_like(lonT)[None])
    for K in range(1, nk):
        e[K] -= disp * np.sin(np.pi * z_nom[K] / H0)
    h = np.maximum(e[:-1] - e[1:], 1e-3)
    return dict(h=jnp.asarray(h))


def _benchmark_t0(ctx):
    """Layer temperatures hitting the target densities Rlay at P_Ref
    by Newton iteration (benchmark_initialize_thickness,
    benchmark_initialization.F90:150-170)."""
    vgrid, eos = ctx["vgrid"], ctx["eos"]
    nk = vgrid.nk
    k1 = ctx.get("nk_rho_varies", 0)        # index of lightest
    rlay = np.asarray(vgrid.Rlay)
    s_ref = ctx.get("s_ref", 35.0)
    t_light = ctx.get("benchmark_t_light", 29.0)
    p_ref = ctx.get("p_ref", 2e7)
    S0 = np.full(nk, s_ref)
    pres = np.full(nk, p_ref)
    rho1 = float(eos.density(jnp.asarray([t_light]),
                             jnp.asarray([s_ref]),
                             jnp.asarray([p_ref]))[0])
    drdt1 = float(eos.density_derivs(jnp.asarray([t_light]),
                                     jnp.asarray([s_ref]),
                                     jnp.asarray([p_ref]))[0][0])
    T0 = t_light + (rlay - rho1) / drdt1
    for _ in range(6):
        rho = np.asarray(eos.density(jnp.asarray(T0), jnp.asarray(S0),
                                     jnp.asarray(pres)))
        drdt = np.asarray(eos.density_derivs(
            jnp.asarray(T0), jnp.asarray(S0), jnp.asarray(pres))[0])
        T0 = T0 + (rlay - rho) / drdt
    return T0, S0, k1


def init_benchmark(ctx):
    """Benchmark thickness + T/S: exponential-plus-linear thermocline
    interfaces found by Newton from the layer temperatures, with a
    50 m mixed layer and the meridional cosine SST profile
    (benchmark_initialize_thickness / benchmark_init_temperature_
    salinity, benchmark_initialization.F90:171-300)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    T0, S0, k1 = _benchmark_t0(ctx)
    ml_depth = ctx.get("benchmark_ml_depth_ic", 50.0)
    ts_scale = ctx.get("benchmark_thermocline_scale", 500.0)
    max_depth = ctx["max_depth"]
    a_exp = 0.9
    latT = np.asarray(grid.geoLatT)
    depth = np.asarray(grid.bathyT)
    sst = 0.5 * (T0[k1] + T0[nk - 1]) \
        - 0.45 * (T0[k1] - T0[nk - 1]) * np.cos(
            np.pi * (latT - ctx["south"]) / max(ctx["lenlat"], 1e-30))

    i_ts, i_md = 1.0 / ts_scale, 1.0 / max_depth
    angstrom = vgrid.angstrom
    eta = np.zeros((nk + 1,) + latT.shape)
    eta[nk] = -depth
    h = np.zeros((nk,) + latT.shape)
    for k in range(nk - 1, 0, -1):     # interfaces K = nk-1..1
        t_int = 0.5 * (T0[k] + T0[k - 1])
        t_frac = (t_int - T0[nk - 1]) / np.maximum(sst - T0[nk - 1],
                                                   1e-12)
        z = np.zeros_like(latT)
        for _ in range(6):
            err = a_exp * np.exp(z * i_ts) \
                + (1.0 - a_exp) * (z * i_md + 1.0) - t_frac
            derr = a_exp * i_ts * np.exp(z * i_ts) \
                + (1.0 - a_exp) * i_md
            z = z - err / derr
        ek = np.minimum(z, -ml_depth)
        ek = np.maximum(ek, eta[k + 1] + angstrom)
        eta[k] = ek
        h[k] = np.maximum(eta[k] - eta[k + 1], angstrom)
    h[0] = np.maximum(0.0 - eta[1], angstrom)

    out = dict(h=jnp.asarray(h))
    if ctx.get("thermo", False):
        T = np.broadcast_to(T0[:, None, None], h.shape).copy()
        for k in range(k1):          # mixed/buffer layers get the SST
            T[k] = sst
        S = np.full(h.shape, S0[0])
        out["T"] = jnp.asarray(T)
        out["S"] = jnp.asarray(S)
    return out


def init_benchmark_ts(ctx, shape):
    """Standalone benchmark T/S (benchmark_init_temperature_salinity)
    for configurations whose thicknesses come from elsewhere (e.g.
    ALE 'uniform'): per-layer temperatures hitting Rlay, with the
    meridional cosine SST in the mixed/buffer layers."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    T0, S0, k1 = _benchmark_t0(ctx)
    latT = np.asarray(grid.geoLatT)
    sst = 0.5 * (T0[k1] + T0[nk - 1]) \
        - 0.45 * (T0[k1] - T0[nk - 1]) * np.cos(
            np.pi * (latT - ctx["south"]) / max(ctx["lenlat"], 1e-30))
    T = np.broadcast_to(T0[:, None, None], shape).copy()
    for k in range(k1):
        T[k] = sst
    S = np.full(shape, S0[0])
    return jnp.asarray(T), jnp.asarray(S)


def init_circle_obcs(ctx):
    """Uniform z-interfaces plus a cosine-bell interface displacement
    disk in the center (circle_obcs_initialization.F90)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    depth = np.asarray(grid.bathyT)
    max_depth = ctx["max_depth"]
    diskrad = ctx.get("disk_radius", 0.25 * ctx["lenlon"])
    ic_amp = ctx.get("disk_ic_amplitude", 5.0)
    angstrom = vgrid.angstrom
    lonT = np.asarray(grid.geoLonT)
    latT = np.asarray(grid.geoLatT)

    e0 = -(max_depth * np.arange(nk) / nk)
    eta = np.zeros((nk + 1,) + depth.shape)
    eta[nk] = -depth
    h = np.zeros((nk,) + depth.shape)
    for k in range(nk - 1, -1, -1):
        ek = np.maximum(e0[k] * np.ones_like(depth),
                        eta[k + 1] + angstrom)
        eta[k] = ek
        h[k] = np.maximum(ek - eta[k + 1], angstrom)

    lonc = ctx["west"] + 0.5 * ctx["lenlon"]
    latc = ctx["south"] + 0.5 * ctx["lenlat"]
    rad = np.sqrt((lonT - lonc) ** 2 + (latT - latc) ** 2) / diskrad
    rad = np.minimum(rad, 1.0) * np.pi
    bell = 0.5 * (1.0 + np.cos(rad))
    if nk == 1:
        h[0] = h[0] + ic_amp * bell
    else:
        for k in range(nk):
            h[k] = h[k] - bell * ic_amp * (2 * (k + 1) - nk)
        h = np.maximum(h, angstrom)
    return dict(h=jnp.asarray(h))


def init_adjustment(ctx):
    """Baroclinic adjustment front (adjustment_initialization.F90 /
    baroclinic_zone_initialization.F90): uniform layers with a tanh
    temperature front across the channel."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    latT = np.asarray(grid.geoLatT)
    south, lenlat = ctx["south"], ctx["lenlat"]
    yn = (latT - south) / max(lenlat, 1e-30) - 0.5
    width = ctx.get("front_width", 0.05)          # fraction of LENLAT
    dT = ctx.get("delta_t", 2.0)
    t_ref = ctx.get("t_ref", 10.0)
    shape = (nk,) + latT.shape
    h = np.full(shape, H0 / nk)
    T = (t_ref + 0.5 * dT * np.tanh(yn / width))[None] \
        * np.ones(shape)
    S = np.full(shape, ctx.get("s_ref", 35.0))
    return dict(h=jnp.asarray(h), T=jnp.asarray(T), S=jnp.asarray(S))


def init_rossby_front(ctx):
    """Rossby adjustment front (Rossby_front_2d_initialization.F90):
    a surface temperature front over a mixed layer, with the
    geostrophically balanced along-front jet."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    f0 = ctx.get("f0", 1e-4)
    latT = np.asarray(grid.geoLatT)
    south, lenlat = ctx["south"], ctx["lenlat"]
    yn = (latT - south) / max(lenlat, 1e-30) - 0.5
    dT = ctx.get("delta_t", 2.0)
    t_ref = ctx.get("t_ref", 10.0)
    hml = ctx.get("ml_depth", 0.25 * H0)
    shape = (nk,) + latT.shape
    h = np.full(shape, H0 / nk)
    z_mid = (np.arange(nk) + 0.5) * (H0 / nk)
    in_ml = (z_mid < hml).astype(np.float64)
    T = t_ref + dT * np.sin(np.pi * np.clip(yn + 0.5, 0, 1)) \
        * in_ml[:, None, None]
    S = np.full(shape, ctx.get("s_ref", 35.0))
    # thermal-wind zonal jet: du/dz = -(g α / f) dT/dy with α≈2e-4
    latCu = np.asarray(grid.geoLatCu)
    ynC = (latCu - south) / max(lenlat, 1e-30) - 0.5
    dTdy = dT * np.pi * np.cos(np.pi * np.clip(ynC + 0.5, 0, 1)) \
        / max(lenlat * 1e3, 1.0)
    alpha = 2e-4
    u_sfc = (9.8 * alpha / f0) * dTdy * hml
    u = u_sfc[None] * in_ml[:, None, None] \
        * np.asarray(grid.mask2dCu)[None]
    return dict(h=jnp.asarray(h), T=jnp.asarray(T), S=jnp.asarray(S),
                u=jnp.asarray(u))


def init_lock_exchange(ctx):
    """Lock exchange: dense water on the west half of the tank
    (the classic ALE overturning test)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    lonT = np.asarray(grid.geoLonT)
    xn = (lonT - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    shape = (nk,) + lonT.shape
    h = np.full(shape, H0 / nk)
    dT = ctx.get("delta_t", 2.0)
    T = (ctx.get("t_ref", 10.0) - dT * (xn < 0.5))[None] \
        * np.ones(shape)
    S = np.full(shape, ctx.get("s_ref", 35.0))
    return dict(h=jnp.asarray(h), T=jnp.asarray(T), S=jnp.asarray(S))


def init_external_gwave(ctx):
    """External gravity wave: a free-surface cosine bump
    (external_gwave_initialization.F90) — columns scaled so
    eta = A·cos(πx/L)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    amp = ctx.get("ssh_anomaly_height", 1.0)
    lonT = np.asarray(grid.geoLonT)
    xn = (lonT - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    eta = amp * np.cos(np.pi * xn)
    scale = (H0 + eta) / H0
    h = np.full((nk,) + lonT.shape, H0 / nk) * scale[None]
    return dict(h=jnp.asarray(h))


def init_dome(ctx):
    """DOME layered IC (DOME_initialization.F90): exponentially
    thinning layers toward the bottom so the dense classes start
    nearly massless outside the inflow."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    bathy = np.asarray(grid.bathyT)
    # exponentially spaced nominal interface depths, clipped by the
    # local topography (dense classes nearly massless off the slope)
    zi = np.minimum(np.exp(np.linspace(
        0.0, np.log(np.maximum(bathy.max(), 1.0) + 1.0),
        nk + 1))[:, None, None] - 1.0, bathy[None])
    h = np.maximum(zi[1:] - zi[:-1], 1e-3)
    return dict(h=jnp.asarray(h))


def init_dense_water(ctx):
    """Dense shelf water (dense_water_initialization.F90): a salinity
    anomaly in the upper water column over the southern shelf."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    latT = np.asarray(grid.geoLatT)
    south, lenlat = ctx["south"], ctx["lenlat"]
    yn = (latT - south) / max(lenlat, 1e-30)
    shape = (nk,) + latT.shape
    h = np.full(shape, H0 / nk)
    z_mid = (np.arange(nk) + 0.5) * (H0 / nk)
    in_ml = (z_mid < ctx.get("ml_depth", 0.2 * H0))
    dS = ctx.get("delta_s", 1.5)
    S = ctx.get("s_ref", 35.0) \
        + dS * (yn < 0.3)[None] * in_ml[:, None, None]
    T = np.full(shape, ctx.get("t_ref", 5.0))
    return dict(h=jnp.asarray(h), T=jnp.asarray(T), S=jnp.asarray(S))




def init_soliton(ctx):
    """Equatorial Rossby soliton (soliton_initialization.F90): the
    Boyd (1980) analytic sech²-envelope height and velocity fields on
    an equatorial beta plane, nondimensionalized by the equatorial
    deformation radius L_eq = sqrt(c_g/beta)."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    beta = ctx.get("beta", 0.0) or 2.0e-11
    g = vgrid.g_Earth
    cg_max = math.sqrt(g * H0)
    L_eq = math.sqrt(cg_max / abs(beta))
    # axis units are km in this idealized setup
    unit_m = 1.0e3
    scale_pos = unit_m / L_eq
    lenlon = ctx["lenlon"]
    x0 = 2.0 * lenlon / 3.0
    y0 = ctx["south"] + 0.5 * ctx["lenlat"]

    def fields(lon, lat, amp):
        x = (np.asarray(lon) - x0) * scale_pos
        y = (np.asarray(lat) - y0) * scale_pos
        v3 = np.exp(-0.395 * x)
        v4 = amp * (2.0 * v3 / (1.0 + v3 * v3)) ** 2
        return x, y, v4

    val2_h = H0 * 0.771 * 0.395 ** 2
    _, yT, v4h = fields(grid.geoLonT, grid.geoLatT, val2_h)
    eta = 0.25 * v4h * (6.0 * yT * yT + 3.0) * np.exp(-0.5 * yT * yT)
    h = np.broadcast_to(((eta + H0) / nk)[None], 
                        (nk,) + eta.shape).copy()

    val2_u = cg_max * 0.771 * 0.395 ** 2
    _, yU, v4u = fields(grid.geoLonCu, grid.geoLatCu, val2_u)
    u1 = 0.25 * v4u * (6.0 * yU * yU - 9.0) * np.exp(-0.5 * yU * yU)
    xV, yV, v4v = fields(grid.geoLonCv, grid.geoLatCv, val2_u)
    v1 = 2.0 * v4v * yV * (-2.0 * 0.395 * np.tanh(0.395 * xV)) \
        * np.exp(-0.5 * yV * yV)
    u = np.broadcast_to(u1[None], (nk,) + u1.shape).copy()
    v = np.broadcast_to(v1[None], (nk,) + v1.shape).copy()
    return dict(h=jnp.asarray(h),
                u=jnp.asarray(u) * np.asarray(grid.mask2dCu),
                v=jnp.asarray(v) * np.asarray(grid.mask2dCv))

def _stack_interfaces(e0, depth, floor):
    """Clip nominal interface heights e0 (nk, up-positive) by the
    local bathymetry with a minimum layer thickness ``floor`` —
    vectorized version of the reference's ubiquitous
    ``eta1D(k) < eta1D(k+1) + Angstrom`` stacking loop."""
    nk = e0.shape[0]
    eta = np.empty((nk + 1,) + depth.shape)
    eta[nk] = -depth
    h = np.empty((nk,) + depth.shape)
    for k in range(nk - 1, -1, -1):
        ek = np.maximum(e0[k] * np.ones_like(depth),
                        eta[k + 1] + floor)
        h[k] = ek - eta[k + 1]
        eta[k] = ek
    return h


def init_dome2d(ctx):
    """DOME2d thickness + T/S (DOME2d_initialize_thickness /
    _temperature_salinity, DOME2d_initialization.F90:96-360):
    uniform-z interfaces (vanished over the bay in layer/rho mode),
    linear salinity stratification, with the western bay filled with
    salty cold water whose extent depends on the coordinate mode."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    mode = ctx.get("coord_mode", "LAYER").upper()
    min_th = ctx.get("min_thickness", 1.0e-3)
    wbay = ctx.get("dome2d_shelf_width", 0.1)
    dbay = ctx.get("dome2d_depth_bay", ctx.get("dome2d_shelf_depth",
                                               0.2))
    depth = np.asarray(grid.bathyT)
    lonT = np.asarray(grid.geoLonT)
    x = (lonT - ctx["west"]) / max(ctx["lenlon"], 1e-30)
    e0 = -H0 * np.arange(nk) / nk
    ang = vgrid.angstrom

    if mode in ("LAYER", "RHO"):
        h = _stack_interfaces(e0, depth, ang)
        in_bay = (x <= wbay)
        h[:-1] = np.where(in_bay[None], ang, h[:-1])
        h[-1] = np.where(in_bay, dbay * H0 - (nk - 1) * ang, h[-1])
    elif mode == "SIGMA":
        h = np.broadcast_to(depth / nk, (nk,) + depth.shape).copy()
    else:                                   # ZSTAR
        h = _stack_interfaces(e0, depth, min_th)

    out = dict(h=jnp.asarray(h))
    if ctx.get("thermo", False):
        s_surf = ctx.get("initial_sss", 34.0)
        s_range = ctx.get("s_range", 2.0)
        s_ref = ctx.get("s_ref", 35.0)
        t_bay = ctx.get("dome2d_t_bay", 1.0)
        # fractional depth at layer centers from the actual h
        xi1 = np.cumsum(h, axis=0) / H0
        xi0 = xi1 - h / H0
        T = np.zeros_like(h)
        if mode in ("ZSTAR", "SIGMA"):
            S = s_surf + 0.5 * s_range * (xi0 + xi1)
            if mode == "ZSTAR":
                kbay = int(round(dbay * nk))
                in_bay3 = (x <= wbay)[None] \
                    & (np.arange(nk) < kbay)[:, None, None]
            else:
                in_bay3 = np.broadcast_to((x <= wbay)[None], h.shape)
            S = np.where(in_bay3, s_ref + s_range, S)
            T = np.where(in_bay3, t_bay, T)
        else:                               # RHO / LAYER
            if mode == "RHO":
                S = s_surf + 0.5 * s_range * (xi0 + xi1)
            else:
                S = (s_ref + s_range * np.arange(nk) / max(nk - 1, 1)
                     )[:, None, None] * np.ones_like(h)
            S[-1] = np.where(x <= wbay, s_surf + s_range, S[-1])
            T[-1] = np.where(x <= wbay, t_bay, T[-1])
        out["T"] = jnp.asarray(T)
        out["S"] = jnp.asarray(S)
    return out


def init_dumbbell(ctx):
    """Dumbbell thickness + T/S (dumbbell_initialize_thickness /
    _temperature_salinity, dumbbell_initialization.F90:94-330):
    salinity S_surf ± S_range/2 on the two sides of the strait, with
    mode-dependent initial interfaces."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    H0 = ctx["max_depth"]
    mode = ctx.get("coord_mode", "LAYER").upper()
    min_th = ctx.get("min_thickness", 1.0e-3)
    dblen = ctx.get("dumbbell_len", 600.0)
    rotate = ctx.get("dumbbell_rotation", False)
    depth = np.asarray(grid.bathyT)
    coord = np.asarray(grid.geoLatT if rotate else grid.geoLonT)
    center = (ctx["south"] + 0.5 * ctx["lenlat"]) if rotate \
        else (ctx["west"] + 0.5 * ctx["lenlon"])
    x = (coord - center) / max(dblen, 1e-30)
    ang = vgrid.angstrom

    if mode == "LAYER":
        # left side: layers piled at the bottom; right side: at the top
        h = np.empty((nk,) + depth.shape)
        rest = np.maximum(depth - (nk - 1) * min_th, min_th)
        for k in range(nk):
            left = rest if k == 0 else min_th
            right = rest if k == nk - 1 else min_th
            h[k] = np.where(x < 0.0, left, right)
    elif mode in ("RHO", "HYCOM1"):
        s_surf = ctx.get("initial_sss", 34.0)
        s_range = ctx.get("s_range", 2.0)
        s_light = ctx.get("ts_range_s_light", ctx.get("s_ref", 35.0))
        s_dense = ctx.get("ts_range_s_dense", ctx.get("s_ref", 35.0))
        quanta = ctx.get("interface_ic_quanta", 2048.0)
        Kk = np.arange(nk + 1, dtype=np.float64)
        e0 = -H0 * ((s_light - s_surf) + (s_dense - s_light)
                    * ((Kk + 1.0 - 1.5) / max(nk - 1, 1))) \
            / max(s_range, 1e-30)
        if quanta > 0.0:
            e0 = np.rint(quanta * e0) / quanta
        e0 = np.minimum(-Kk * ang, e0)
        e0 = np.maximum(-H0, e0)
        h = _stack_interfaces(e0[:nk], depth, ang)
    elif mode == "SIGMA":
        h = np.broadcast_to(depth / nk, (nk,) + depth.shape).copy()
    else:                                   # ZSTAR
        e0 = -H0 * np.arange(nk) / nk
        h = _stack_interfaces(e0, depth, min_th)

    out = dict(h=jnp.asarray(h))
    if ctx.get("thermo", False):
        t_surf = ctx.get("dumbbell_t_surf", 20.0)
        s_surf = ctx.get("dumbbell_sref", 34.0)
        s_range = ctx.get("dumbbell_s_range", 2.0)
        T = np.full_like(h, t_surf)
        S = np.where((x >= 0.0)[None], s_surf + 0.5 * s_range,
                     s_surf - 0.5 * s_range) * np.ones_like(h)
        out["T"] = jnp.asarray(T)
        out["S"] = jnp.asarray(S)
    return out


def init_neverworld(ctx):
    """Neverworld thicknesses (Neverworld_initialize_thickness,
    Neverworld_initialization.F90:242): prescribed resting profile
    stacked up from the bottom, with optional sech-spike interface
    perturbations."""
    grid, vgrid = ctx["grid"], ctx["vgrid"]
    nk = vgrid.nk
    profile = ctx.get("init_thickness_profile")
    if profile is None:
        profile = [ctx["max_depth"] / nk] * nk
    profile = np.asarray(profile, np.float64)
    if profile.size != nk:
        raise ValueError("INIT_THICKNESS_PROFILE must have NK entries")
    pert = ctx.get("nl_thickness_pert_amp", 0.0)
    depth = np.asarray(grid.bathyT)
    x = (np.asarray(grid.geoLonT) - ctx["west"]) \
        / max(ctx["lenlon"], 1e-30)
    y = (np.asarray(grid.geoLatT) - ctx["south"]) \
        / max(ctx["lenlat"], 1e-30)
    r1 = np.sqrt((x - 0.7) ** 2 + (y - 0.2) ** 2)
    r2 = np.sqrt((x - 0.3) ** 2 + (y - 0.25) ** 2)
    dspike = _spike(r1, 0.15) - _spike(r2, 0.15)
    e0 = np.concatenate([[0.0], -np.cumsum(profile)])
    ang = vgrid.angstrom
    h = np.empty((nk,) + depth.shape)
    e_int = -depth
    for k in range(nk - 1, 0, -1):
        hk = e0[k] - e_int
        hk = hk + pert * (e0[k] - e0[nk]) * dspike
        hk = np.maximum(ang, hk)
        h[k] = hk
        e_int = e_int + hk
    h[0] = np.maximum(ang, e0[0] - e_int)
    return dict(h=jnp.asarray(h))


def isomip_ts(ctx, h):
    """ISOMIP linear T/S profiles between surface and bottom values
    (ISOMIP_initialize_temperature_salinity,
    /root/reference/src/user/ISOMIP_initialization.F90:264, the
    ZSTAR/SIGMA/RHO branch: values at layer-center depths measured
    from the local bottom)."""
    H0 = ctx["max_depth"]
    t_sur = ctx.get("isomip_t_sur", -1.9)
    s_sur = ctx.get("isomip_s_sur", 33.8)
    t_bot = ctx.get("isomip_t_bot", -1.9)
    s_bot = ctx.get("isomip_s_bot", 34.55)
    hn = np.asarray(h)
    depth_tot = hn.sum(axis=0)
    # xi0 = height of layer center above the bottom minus depth_tot
    zc_from_bot = np.cumsum(hn[::-1], axis=0)[::-1] - 0.5 * hn
    xi0 = -depth_tot + zc_from_bot
    dS_dz = (s_sur - s_bot) / H0
    dT_dz = (t_sur - t_bot) / H0
    return (jnp.asarray(t_sur + dT_dz * xi0),
            jnp.asarray(s_sur + dS_dz * xi0))


def baroclinic_zone_ts(ctx, h):
    """Idealized baroclinic zone T/S
    (baroclinic_zone_init_temperature_salinity,
    /root/reference/src/user/baroclinic_zone_initialization.F90:82):
    linear vertical/zonal gradients plus a smooth sin front of width
    L_zone across the channel in x."""
    grid = ctx["grid"]
    t_ref, dtdz = ctx.get("t_ref", 10.0), ctx.get("bcz_dtdz", 0.0)
    delta_t, dtdx = ctx.get("bcz_delta_t", 0.0), ctx.get("bcz_dtdx",
                                                         0.0)
    s_ref, dsdz = ctx.get("s_ref", 35.0), ctx.get("bcz_dsdz", 0.0)
    delta_s, dsdx = ctx.get("bcz_delta_s", 0.0), ctx.get("bcz_dsdx",
                                                         0.0)
    L_zone = ctx.get("bcz_l_zone", 0.5 * ctx["lenlat"])
    hn = np.asarray(h)
    depth_tot = hn.sum(axis=0)
    zc = -depth_tot + np.cumsum(hn[::-1], axis=0)[::-1] - 0.5 * hn
    xx = np.asarray(grid.geoLonT) - (ctx["west"] + 0.5 * ctx["lenlon"])
    if L_zone != 0.0:
        fn = np.sin(0.5 * np.pi * np.clip(xx / L_zone, -1.0, 1.0))
    else:
        fn = np.sign(xx)
    T = t_ref + dtdz * zc + (dtdx * xx + delta_t * fn)[None]
    S = s_ref + dsdz * zc + (dsdx * xx + delta_s * fn)[None]
    return jnp.asarray(T), jnp.asarray(S)


thickness_registry = {
    "phillips": init_phillips,
    "sloshing": init_sloshing,
    "benchmark": init_benchmark,
    "circle_obcs": init_circle_obcs,
    "adjustment": init_adjustment,
    "rossby_front": init_rossby_front,
    "lock_exchange": init_lock_exchange,
    "external_gwave": init_external_gwave,
    "dome": init_dome,
    "dense_water": init_dense_water,
    "soliton": init_soliton,
    "DOME2D": init_dome2d,
    "dumbbell": init_dumbbell,
    "Neverworld": init_neverworld,
}


def scm_cvmix_ts(h, t_mld=0.0, s_mld=0.0, l2_temp=20.0, l2_salt=35.0,
                 dtdz=0.0, dsdz=0.0, min_temp=4.0):
    """Single-column CVMix-test T/S profile: uniform mixed layer over
    a linearly stratified interior (SCM_CVMix_tests_TS_init,
    /root/reference/src/user/SCM_CVMix_tests.F90:57-123).

    T = max(min_temp, L2_TEMP + dT/dz · min(0, z_center + MLD_T)) and
    likewise for S (without the floor)."""
    zbot = -jnp.cumsum(h, axis=0)
    ztop = jnp.concatenate([jnp.zeros_like(h[:1]), zbot[:-1]], axis=0)
    zc = 0.5 * (ztop + zbot)
    T = jnp.maximum(min_temp,
                    l2_temp + dtdz * jnp.minimum(0.0, zc + t_mld))
    S = l2_salt + dsdz * jnp.minimum(0.0, zc + s_mld)
    return T, S
