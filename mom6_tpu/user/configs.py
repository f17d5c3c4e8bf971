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
    """Shelf-ramp-basin overflow profile in y (DOME2d)."""
    d0, dmin = ctx["max_depth"], max(ctx["min_depth"], 0.05 * ctx["max_depth"])
    yn = (lat - ctx["south"]) / max(ctx["lenlat"], 1e-30)
    # shelf (top 1/3 shallow), ramp, deep basin
    frac_shelf, frac_ramp = 0.3, 0.4
    ramp = np.clip((yn - (1.0 - frac_shelf - frac_ramp)) / frac_ramp,
                   0.0, 1.0)
    return d0 + (dmin - d0) * ramp


def topo_dumbbell(lon, lat, ctx):
    """Two wide basins connected by a narrow strait in x."""
    d0 = ctx["max_depth"]
    xn = 2.0 * (lon - ctx["west"]) / max(ctx["lenlon"], 1e-30) - 1.0
    yn = 2.0 * (lat - ctx["south"]) / max(ctx["lenlat"], 1e-30) - 1.0
    in_strait = (np.abs(xn) < 0.25) & (np.abs(yn) > 0.25)
    return np.where(in_strait, 0.0, d0)


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


topo_registry = {
    "seamount": topo_seamount,
    "dome2d": topo_dome2d,
    "dumbbell": topo_dumbbell,
    "benchmark": topo_benchmark,
    "halfpipe": topo_halfpipe,
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


thickness_registry = {
    "phillips": init_phillips,
    "sloshing": init_sloshing,
    "benchmark": init_benchmark,
    "circle_obcs": init_circle_obcs,
}
