"""Global energy/mass statistics — the ``ocean.stats`` oracle.

Re-design of /root/reference/src/diagnostics/MOM_sum_output.F90:301
write_energy: decomposition-invariant global sums of kinetic and
potential energy, mass, mean sea level, salt and heat, plus the
maximum CFL number, written in a fixed-format table.  All sums use the
EFP reproducing machinery (framework/efp.py) when float64 is enabled,
so the printed numbers are bitwise independent of the device layout —
the property the reference's test suite gates on
(.testing/README.rst:283-296).  Also hosts the energy-blowup abort.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.core.state import State
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import interface_heights

_SCALE32 = -24     # fp32-path pre-scale exponent (see efp_sum32)
from mom6_tpu.framework.efp import (efp_sum, efp_to_float, efp_sum32,
                                    efp32_to_float, efp_sum_layers,
                                    efp_sum32_layers,
                                    efp_limbs_to_float_ingraph)
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.stencil import im1, jm1

__all__ = ["stat_sums", "Stats", "format_stats_header", "format_stats_line",
           "EnergyBlowupError"]


from mom6_tpu.framework.error_handler import FatalError


class EnergyBlowupError(FatalError):
    pass


@dataclasses.dataclass
class Stats:
    step: int
    day: float
    truncs: int
    energy_per_mass: float      # [m2 s-2]
    max_cfl: float
    mean_sea_level: float       # [m]
    total_mass: float           # [kg]
    mean_salin: float
    mean_temp: float
    # depth-list APE extras (None without CALCULATE_APE):
    # H0 = resting depth of the top interface [m] (the reference's
    # "Zero APE Depth of Interface" H_0APE(1), printed negated as its
    # Mean Sea Level column)
    h0: Optional[float] = None


def stat_sums(domain: Domain, grid: Grid, vgrid: VerticalGrid,
              state: State, dt: float, depth_list=None):
    """Jittable piece: EFP limb sums + max CFL.  Returns a dict of limb
    arrays / scalars; host-side assembly happens in `collect_stats`."""
    h, u, v = state.h, state.u, state.v
    axes = domain.axis_names()
    areaT = grid.areaT * grid.mask2dT
    interior3 = lambda f: domain.interior(f)

    mask3 = jnp.broadcast_to(grid.mask2dT, h.shape)
    vol_w = domain.interior(h * areaT)

    # KE: 0.5 h areaT (u²+v²) with face→center averaging
    u2c = 0.5 * (u * u + im1(u * u))
    v2c = 0.5 * (v * v + jm1(v * v))
    ke_density = 0.5 * h * areaT * (u2c + v2c)

    # PE: sum over interfaces of 0.5 g'_K areaT e_K² (absolute datum)
    e = interface_heights(vgrid, h, grid.bathyT)
    # interfaces K=0..nk-1 carry reduced gravity g_prime[K]; the bottom
    # interface (bathymetry) is fixed and contributes no APE
    gp = vgrid.g_prime[:h.shape[0]].reshape(-1, 1, 1)
    pe_density = 0.5 * gp * (e[:-1] * e[:-1] - grid.bathyT[None] ** 2) * areaT

    use_efp = jax.config.jax_enable_x64

    def gsum(x):
        if use_efp:
            return efp_sum(x, axis_names=axes)
        # fp32 (TPU) path: order-invariant int32 limb sums with a
        # 2**-24 pre-scale so cell volumes/energies fit the window
        return efp_sum32(x, axis_names=axes, scale_pow2=_SCALE32)

    out = {
        "vol": gsum(vol_w),
        "area": gsum(domain.interior(areaT)),
        "ke": gsum(domain.interior(ke_density)),
        "pe": gsum(domain.interior(pe_density)),
        "eta": gsum(domain.interior(e[0] * areaT)),
    }

    if depth_list is not None:
        # APE vs the depth-list hypsometry (MOM_sum_output.F90:610-675
        # Boussinesq branch).  Per-layer global volumes come from EFP
        # limb sums so Z_0APE — the depth at which the fluid below
        # interface K would rest when levelled over the real
        # hypsometry — is bitwise layout-invariant; the search is an
        # in-graph searchsorted over the replicated list arrays.
        if use_efp:
            lay_limbs = efp_sum_layers(vol_w, axis_names=axes)
        else:
            lay_limbs = efp_sum32_layers(vol_w, axis_names=axes,
                                         scale_pow2=_SCALE32)
        vol_lay = efp_limbs_to_float_ingraph(
            lay_limbs, scale_pow2=0 if use_efp else _SCALE32)
        volbelow = jnp.cumsum(vol_lay[::-1])[::-1]      # below iface K
        li = jnp.clip(
            jnp.searchsorted(depth_list.vol_below, volbelow,
                             side="right") - 1,
            0, depth_list.vol_below.shape[0] - 2)
        z0 = depth_list.depth[li] - (volbelow
                                     - depth_list.vol_below[li]) \
            / depth_list.area[li]                       # positive down
        # hint = Z0(K) + e_K (e negative below the surface); hbot =
        # the part of the resting column truncated by the bottom
        z0b = z0.reshape(-1, 1, 1).astype(e.dtype)
        hint = z0b + e[:-1]
        hbot = jnp.maximum(z0b - grid.bathyT[None], 0.0)
        ape_density = 0.5 * gp * (hint * hint - hbot * hbot) * areaT
        out["ape"] = gsum(domain.interior(ape_density))
        out["h0"] = z0[0]
    if state.T is not None:
        out["heat"] = gsum(domain.interior(state.T * h * areaT))
        out["salt"] = gsum(domain.interior(state.S * h * areaT))

    cfl_u = jnp.abs(u) * dt * grid.IdxCu
    cfl_v = jnp.abs(v) * dt * grid.IdyCv
    max_cfl = jnp.maximum(jnp.max(domain.interior(cfl_u)),
                          jnp.max(domain.interior(cfl_v)))
    for ax in axes:
        max_cfl = jax.lax.pmax(max_cfl, ax)
    out["max_cfl"] = max_cfl
    return out


def collect_stats(raw: dict, vgrid: VerticalGrid, step: int, day: float,
                  truncs: int = 0, energy_cap: float = 1.0e6) -> Stats:
    """Host-side: limbs → floats → Stats; raises on energy blowup."""
    use_efp = jax.config.jax_enable_x64

    def val(x):
        if use_efp:
            return efp_to_float(x)
        if hasattr(x, "shape") and getattr(x, "shape", ()) != ():
            return efp32_to_float(x, scale_pow2=_SCALE32)
        return float(x)

    vol = val(raw["vol"])
    area = val(raw["area"])
    ke = val(raw["ke"])
    # with the depth list, the energy column uses the available PE
    # relative to the levelled-over-hypsometry state, matching the
    # reference's CALCULATE_APE=True default (MOM_sum_output.F90:823);
    # otherwise the absolute-datum PE
    pe = val(raw["ape"]) if "ape" in raw else val(raw["pe"])
    eta = val(raw["eta"])
    mass = vgrid.Rho0 * vol
    epm = (ke + pe) / max(mass / vgrid.Rho0, 1e-300)
    if not math.isfinite(epm) or abs(epm) > energy_cap:
        # route through the error channel (MOM_error FATAL analog)
        # before raising the typed abort
        from mom6_tpu.framework.error_handler import (MOM_error, WARNING)
        msg = (f"Energy per mass {epm:.6e} m2 s-2 exceeds cap "
               f"{energy_cap:g} at step {step} — model blowup detected")
        MOM_error(WARNING, msg)
        raise EnergyBlowupError(msg)
    heat = val(raw["heat"]) / max(vol, 1e-300) if "heat" in raw else 0.0
    salt = val(raw["salt"]) / max(vol, 1e-300) if "salt" in raw else 0.0
    return Stats(step=step, day=day, truncs=truncs,
                 energy_per_mass=epm,
                 max_cfl=float(raw["max_cfl"]),
                 mean_sea_level=eta / max(area, 1e-300),
                 total_mass=mass, mean_salin=salt, mean_temp=heat,
                 h0=float(raw["h0"]) if "h0" in raw else None)


def format_stats_header() -> str:
    """Header mirroring MOM_sum_output.F90:559 ocean.stats format."""
    return ("  Step,       Day,  Truncs,      Energy/Mass,      Maximum CFL,"
            "  Mean Sea Level,  Total Mass,  Mean Salin, Mean Temp, "
            "Frac Mass Err, Salin Err, Temp Err\n"
            "            [days]                 [m2 s-2]           [Nondim]"
            "       [m]             [kg]         [PSU]     [degC]"
            "       [Nondim]      [PSU]     [degC]\n")


def format_stats_line(s: Stats, mass0: float | None = None) -> str:
    mass_err = 0.0 if not mass0 else (s.total_mass - mass0) / mass0
    return (f"{s.step:6d},{s.day:11.3f},{s.truncs:8d},"
            f" En {s.energy_per_mass:.10E}, CFL {s.max_cfl:8.5f},"
            f" SL {s.mean_sea_level: .4E}, M {s.total_mass:.6E},"
            f" S {s.mean_salin:8.4f}, T {s.mean_temp:8.4f},"
            f" Me {mass_err: .2E}\n")
