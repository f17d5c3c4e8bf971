"""Time-dependent user open-boundary updates.

Re-design of /root/reference/src/core/MOM_boundary_update.F90: a
registry of named updaters (OBC_USER_CONFIG) that refresh the open
boundaries' external data each step — Kelvin waves
(Kelvin_initialization.F90:181 Kelvin_set_OBC_data, external mode on
a straight coast), and the oscillating tidal bay
(tidal_bay_initialization.F90 tidal_bay_set_OBC_data).

TPU framing: an updater is a pure function
``fn(obc, grid, h, t) -> obc`` evaluated *inside* the jitted step on
the traced model time, replacing only the array leaves of the
OpenBoundaries pytree (ssh_*/u_*/v_*) — the static segment topology
is untouched, so time-dependent boundaries never retrace.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["register_obc_update", "build_obc_update",
           "kelvin_update", "tidal_bay_update", "shelfwave_update",
           "supercritical_update", "dyed_channel_update"]


@dataclasses.dataclass(frozen=True)
class KelvinCfg:
    f0: float = 1e-4              # F_0 [s-1]
    wave_period: float = 44567.0  # KELVIN_WAVE_PERIOD (M2) [s]
    ssh_amp: float = 1.0          # KELVIN_WAVE_SSH_AMP [m]
    g: float = 9.8
    lat_scale: float = 1000.0     # along-coast coordinate scale [m/unit]
    south: float = 0.0


def kelvin_update(cfg: KelvinCfg):
    """External-mode (mode 0) coastal Kelvin wave entering through the
    western/southern boundary: SSH = A exp(-f y/c) cos(ωt), with the
    barotropic inflow c·SSH/D (Kelvin_set_OBC_data :258-270, straight
    coast)."""
    omega = 2.0 * math.pi / cfg.wave_period

    def update(obc, grid, h, t):
        repl = {}
        H = obc.halo
        val1 = jnp.sin(omega * t)
        cos_t = jnp.cos(omega * t)
        if obc.open_w:
            D = jnp.maximum(jnp.sum(h[..., :, H], axis=0), 1e-3)
            c = jnp.sqrt(cfg.g * D)
            y = (grid.geoLatCu[..., :, H - 1] - cfg.south) \
                * cfg.lat_scale
            val2 = cfg.ssh_amp * jnp.exp(-cfg.f0 * y / c)
            ones = jnp.ones_like(grid.geoLatCu)
            repl["ssh_w"] = (val2 * cos_t)[..., :, None] * ones
            repl["u_w"] = (val2 * val1 * c / D)[..., :, None] * ones
        if obc.open_s:
            D = jnp.maximum(jnp.sum(h[..., H, :], axis=0), 1e-3)
            c = jnp.sqrt(cfg.g * D)
            x = (grid.geoLonCv[..., H - 1, :]) * cfg.lat_scale
            val2 = cfg.ssh_amp * jnp.exp(-cfg.f0 * x / c)
            ones = jnp.ones_like(grid.geoLonCv)
            repl["ssh_s"] = (val2 * cos_t)[..., None, :] * ones
            repl["v_s"] = (val2 * val1 * c / D)[..., None, :] * ones
        return dataclasses.replace(obc, **repl) if repl else obc
    return update


@dataclasses.dataclass(frozen=True)
class TidalBayCfg:
    tide_flow: float = 3.0e6      # TIDAL_BAY_FLOW [m3 s-1]
    tide_period: float = 43200.0  # 12 h
    tide_ssh_amp: float = 0.0     # optional SSH oscillation [m]


def tidal_bay_update(cfg: TidalBayCfg):
    """Oscillating barotropic flow through every open segment, evenly
    distributed over the instantaneous open face area
    (tidal_bay_set_OBC_data)."""
    omega = 2.0 * math.pi / cfg.tide_period

    def update(obc, grid, h, t):
        d = grid.domain
        H = obc.halo
        cff_eta = cfg.tide_ssh_amp * jnp.sin(omega * t)
        flux = -cfg.tide_flow * jnp.sin(omega * t)
        repl = {}

        def psum_all(s):
            import jax
            for ax in d.axis_names():
                s = jax.lax.psum(s, ax)
            return s

        # total open face area across all edges: strip ownership at
        # the boundary face times face length times the column depth
        # of the first interior cell
        area = jnp.zeros(())
        pieces = []
        if obc.open_w and obc.strip_w is not None:
            iW = H - 1
            area = area + psum_all(jnp.sum(
                obc.strip_w[..., :, iW] * grid.dyCu[..., :, iW]
                * jnp.sum(h[..., :, H], axis=0)))
            pieces.append("w")
        if obc.open_e and obc.strip_e is not None:
            iE = H + obc.nil - 1
            area = area + psum_all(jnp.sum(
                obc.strip_e[..., :, iE] * grid.dyCu[..., :, iE]
                * jnp.sum(h[..., :, iE], axis=0)))
            pieces.append("e")
        if obc.open_s and obc.strip_s is not None:
            jS = H - 1
            area = area + psum_all(jnp.sum(
                obc.strip_s[..., jS, :] * grid.dxCv[..., jS, :]
                * jnp.sum(h[..., H, :], axis=0)))
            pieces.append("s")
        if obc.open_n and obc.strip_n is not None:
            jN = H + obc.njl - 1
            area = area + psum_all(jnp.sum(
                obc.strip_n[..., jN, :] * grid.dxCv[..., jN, :]
                * jnp.sum(h[..., jN, :], axis=0)))
            pieces.append("n")
        vel = flux / jnp.maximum(area, 1e-10)
        for edge in pieces:
            if edge == "w":
                repl["u_w"] = vel
                repl["ssh_w"] = cff_eta
            elif edge == "e":
                repl["u_e"] = -vel
                repl["ssh_e"] = cff_eta
            elif edge == "s":
                repl["v_s"] = vel
                repl["ssh_s"] = cff_eta
            elif edge == "n":
                repl["v_n"] = -vel
                repl["ssh_n"] = cff_eta
        return dataclasses.replace(obc, **repl) if repl else obc
    return update


@dataclasses.dataclass(frozen=True)
class ShelfwaveCfg:
    f0: float = 1e-4        # F_0 [s-1]
    amp: float = 1.0        # SHELFWAVE_AMPLITUDE [m s-1]
    Lx: float = 100.0       # SHELFWAVE_X_WAVELENGTH [axis units]
    Ly: float = 50.0        # SHELFWAVE_Y_LENGTH_SCALE [axis units]
    jj: float = 1.0         # SHELFWAVE_Y_MODE
    lenlat: float = 100.0
    west: float = 0.0
    south: float = 0.0


def shelfwave_update(cfg: ShelfwaveCfg):
    """Continental-shelf wave entering the western boundary
    (shelfwave_set_OBC_data,
    /root/reference/src/user/shelfwave_initialization.F90:137):
    u_bt = A·e^{−αy}·cos(lx−ωt)·(α·sin(ky) + k·cos(ky)) with the
    shelf-wave dispersion ω = 2αf l/(k²+α²+l²)."""
    alpha = 1.0 / cfg.Ly
    ll = 2.0 * math.pi / cfg.Lx
    kk = cfg.jj * math.pi / cfg.lenlat
    omega = 2.0 * alpha * cfg.f0 * ll / (kk * kk + alpha * alpha
                                         + ll * ll)

    def update(obc, grid, h, t):
        if not obc.open_w:
            return obc
        x = grid.geoLonCu - cfg.west
        y = grid.geoLatCu - cfg.south
        cos_wt = jnp.cos(ll * x - omega * t)
        u = cfg.amp * jnp.exp(-alpha * y) * cos_wt \
            * (alpha * jnp.sin(kk * y) + kk * jnp.cos(kk * y))
        return dataclasses.replace(obc, u_w=u)
    return update


def supercritical_update(zonal_flow: float = 8.57):
    """Constant zonal inflow at the E/W open boundaries
    (supercritical_set_OBC_data,
    /root/reference/src/user/supercritical_initialization.F90:24);
    N/S boundaries get zero barotropic normal flow."""
    def update(obc, grid, h, t):
        repl = {}
        if obc.open_w:
            repl["u_w"] = jnp.full_like(grid.geoLonCu, zonal_flow)
        if obc.open_e:
            repl["u_e"] = jnp.full_like(grid.geoLonCu, zonal_flow)
        if obc.open_s:
            repl["v_s"] = jnp.zeros_like(grid.geoLonCv)
        if obc.open_n:
            repl["v_n"] = jnp.zeros_like(grid.geoLonCv)
        return dataclasses.replace(obc, **repl) if repl else obc
    return update


@dataclasses.dataclass(frozen=True)
class DyedChannelCfg:
    zonal_flow: float = 8.57   # CHANNEL_MEAN_FLOW [m s-1]
    tidal_amp: float = 0.0     # CHANNEL_TIDAL_AMP [m s-1]
    frequency: float = 0.0     # CHANNEL_FLOW_FREQUENCY [s-1]


def dyed_channel_update(cfg: DyedChannelCfg):
    """Long-channel mean + tidal flow through the E/W boundaries
    (dyed_channel_update_flow,
    /root/reference/src/user/dyed_channel_initialization.F90:134)."""
    def update(obc, grid, h, t):
        flow = cfg.zonal_flow
        if cfg.frequency != 0.0:
            flow = flow + cfg.tidal_amp * jnp.cos(
                2.0 * math.pi * cfg.frequency * t)
        repl = {}
        if obc.open_w:
            repl["u_w"] = flow * jnp.ones_like(grid.geoLonCu)
        if obc.open_e:
            repl["u_e"] = flow * jnp.ones_like(grid.geoLonCu)
        if obc.open_s:
            repl["v_s"] = jnp.zeros_like(grid.geoLonCv)
        if obc.open_n:
            repl["v_n"] = jnp.zeros_like(grid.geoLonCv)
        return dataclasses.replace(obc, **repl) if repl else obc
    return update


_REGISTRY = {}


def register_obc_update(name: str, builder):
    """Add a named updater builder(pf-like cfg dict) to the registry
    (register_OBC of MOM_boundary_update.F90)."""
    _REGISTRY[name.lower()] = builder


def build_obc_update(pf, south: float = 0.0, axis_units: str = "k"):
    """Read OBC_USER_CONFIG (MOM_boundary_update.F90:99) and return the
    update fn, or None."""
    name = pf.get("OBC_USER_CONFIG", str, "none").strip().lower()
    if name in ("", "none"):
        return None
    lat_scale = 1000.0 if axis_units.startswith("k") else 111194.9266
    if name == "kelvin":
        cfg = KelvinCfg(
            f0=pf.get("F_0", float, 1e-4, units="s-1"),
            wave_period=pf.get("KELVIN_WAVE_PERIOD", float, 44567.0,
                               units="s"),
            ssh_amp=pf.get("KELVIN_WAVE_SSH_AMP", float, 1.0,
                           units="m"),
            g=pf.get("G_EARTH", float, 9.8, units="m s-2"),
            lat_scale=lat_scale, south=south)
        if pf.get("KELVIN_WAVE_MODE", int, 0) != 0:
            raise ValueError("only the external (mode 0) Kelvin OBC "
                             "update is implemented")
        return kelvin_update(cfg)
    if name == "tidal_bay":
        cfg = TidalBayCfg(
            tide_flow=pf.get("TIDAL_BAY_FLOW", float, 3.0e6,
                             units="m3 s-1"),
            tide_period=pf.get("TIDAL_BAY_PERIOD", float, 43200.0,
                               units="s"),
            tide_ssh_amp=pf.get("TIDAL_BAY_SSH_AMP", float, 0.0,
                                units="m"))
        return tidal_bay_update(cfg)
    if name == "shelfwave":
        cfg = ShelfwaveCfg(
            f0=pf.get("F_0", float, 1e-4, units="s-1"),
            amp=pf.get("SHELFWAVE_AMPLITUDE", float, 1.0,
                       units="m s-1"),
            Lx=pf.get("SHELFWAVE_X_WAVELENGTH", float, 100.0),
            Ly=pf.get("SHELFWAVE_Y_LENGTH_SCALE", float, 50.0),
            jj=pf.get("SHELFWAVE_Y_MODE", float, 1.0),
            lenlat=pf.get("LENLAT", float, 100.0),
            west=pf.get("WESTLON", float, 0.0),
            south=south)
        return shelfwave_update(cfg)
    if name == "supercritical":
        return supercritical_update(
            pf.get("SUPERCRITICAL_ZONAL_FLOW", float, 8.57,
                   units="m s-1"))
    if name == "dyed_channel":
        cfg = DyedChannelCfg(
            zonal_flow=pf.get("CHANNEL_MEAN_FLOW", float, 8.57,
                              units="m s-1"),
            tidal_amp=pf.get("CHANNEL_TIDAL_AMP", float, 0.0,
                             units="m s-1"),
            frequency=pf.get("CHANNEL_FLOW_FREQUENCY", float, 0.0,
                             units="s-1"))
        return dyed_channel_update(cfg)
    if name in _REGISTRY:
        return _REGISTRY[name](pf)
    raise ValueError(f"Unknown OBC_USER_CONFIG '{name}'")
