"""Biogeochemistry package interface (MARBL / generic-tracer shape).

Re-design of the reference's BGC coupling surface:
/root/reference/src/tracer/MARBL_tracers.F90 (the NCAR fork's MARBL
driver) and MOM_generic_tracer.F90 (GFDL generic tracers), both of
which delegate the actual biogeochemistry to an external library
(stubbed in config_src/external/).  This module defines the
framework-side protocol those libraries plug into:

* ``BGCPackage.register`` declares the package's tracers (names,
  units, initial profiles) into the TracerRegistry;
* ``BGCPackage.column_physics`` receives (tracers, h, T, S, fluxes,
  dt, irradiance) and returns updated tracers — called from the
  diabatic phase exactly where call_tracer_column_fns sits;
* ``BGCPackage.surface_fluxes`` contributes air-sea tracer fluxes.

A reference implementation ``NPZDPackage`` (4-box
nutrient-phytoplankton-zooplankton-detritus) exercises the protocol.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

import jax.numpy as jnp

from mom6_tpu.tracer.registry import TracerRegistry, TracerMeta

__all__ = ["BGCPackage", "NPZDPackage"]


class BGCPackage(Protocol):
    name: str

    def register(self, registry: TracerRegistry, shape) -> dict: ...

    def column_physics(self, tracers: dict, h, T, S, dt,
                       irradiance=None) -> dict: ...


@dataclasses.dataclass(frozen=True)
class NPZDPackage:
    """Minimal NPZD model demonstrating the BGC protocol."""
    name: str = "NPZD"
    growth_rate: float = 1.0 / 86400.0      # P growth [s-1]
    grazing: float = 0.5 / 86400.0
    mortality: float = 0.1 / 86400.0
    remin: float = 0.2 / 86400.0
    sinking: float = 5.0 / 86400.0          # detritus sinking [m s-1]
    k_light: float = 20.0                   # light half-sat depth [m]
    n0: float = 10.0

    def register(self, registry: TracerRegistry, shape) -> dict:
        for nm, ln in (("no3", "nitrate"), ("phyto", "phytoplankton"),
                       ("zoo", "zooplankton"), ("det", "detritus")):
            registry.register(TracerMeta(name=nm, longname=ln,
                                         units="mmol m-3"))
        z = jnp.zeros(shape)
        return {"no3": z + self.n0, "phyto": z + 0.1, "zoo": z + 0.05,
                "det": z}

    def specs(self):
        """BGCTracerSpec list for the MARBL-shaped coupler
        (marbl_driver.BGCCoupler): NPZD's nitrate accepts river input
        and restoring; detritus sinks through the coupler's shared
        sinking pass."""
        from mom6_tpu.tracer.marbl_driver import BGCTracerSpec
        return (
            BGCTracerSpec(name="no3", longname="nitrate", init=self.n0,
                          river_field="riv_no3", restore=True),
            BGCTracerSpec(name="phyto", longname="phytoplankton",
                          init=0.1),
            BGCTracerSpec(name="zoo", longname="zooplankton",
                          init=0.05),
            BGCTracerSpec(name="det", longname="detritus", init=0.0,
                          sinking=self.sinking),
        )

    def interior_tendencies(self, tracers, h, T, S, irr, forcing):
        """dc/dt of the NPZD cycle (coupler protocol; the legacy
        column_physics below integrates the same rates directly)."""
        n, p = tracers["no3"], tracers["phyto"]
        zo, det = tracers["zoo"], tracers["det"]
        z_mid = jnp.cumsum(h, axis=0) - 0.5 * h
        light = irr if irr is not None else jnp.exp(-z_mid
                                                    / self.k_light)
        growth = self.growth_rate * light * n / (n + 1.0) * p
        graze = self.grazing * p * zo
        mort = self.mortality * (p + zo)
        rem = self.remin * det
        return {"no3": rem - growth,
                "phyto": growth - graze - self.mortality * p,
                "zoo": 0.7 * graze - self.mortality * zo,
                "det": 0.3 * graze + mort - rem}

    def column_physics(self, tracers: dict, h, T, S, dt,
                       irradiance=None, **_) -> dict:
        n = tracers["no3"]
        p = tracers["phyto"]
        zo = tracers["zoo"]
        det = tracers["det"]
        # light limitation decays with depth
        z_mid = jnp.cumsum(h, axis=0) - 0.5 * h
        light = jnp.exp(-z_mid / self.k_light)
        growth = self.growth_rate * light * n / (n + 1.0) * p
        graze = self.grazing * p * zo
        mort = self.mortality * (p + zo)
        rem = self.remin * det
        n2 = n + dt * (rem - growth)
        p2 = p + dt * (growth - graze - self.mortality * p)
        z2 = zo + dt * (0.7 * graze - self.mortality * zo)
        d2 = det + dt * (0.3 * graze + mort - rem)
        # detritus sinking (upwind, conservative)
        w = self.sinking
        flux = w * d2                          # downward at cell bottoms
        flux = flux.at[-1].set(0.0)            # no loss out the bottom
        div = (jnp.concatenate([jnp.zeros_like(flux[:1]), flux[:-1]],
                               axis=0) - flux)
        d2 = d2 + dt * div / (h + 1e-20)
        clip = lambda x: jnp.maximum(x, 0.0)
        return dict(tracers, no3=clip(n2), phyto=clip(p2), zoo=clip(z2),
                    det=clip(d2))
