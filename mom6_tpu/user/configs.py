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


topo_registry = {
    "seamount": topo_seamount,
    "dome2d": topo_dome2d,
    "dumbbell": topo_dumbbell,
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


thickness_registry = {
    "phillips": init_phillips,
    "sloshing": init_sloshing,
}
