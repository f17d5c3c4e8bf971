"""Idealized tracer packages.

Re-designs of the reference's ideal tracer modules
(/root/reference/src/tracer/): ideal_age_example.F90 (ventilation age),
pseudo_salt_tracer.F90 (a passive copy of salinity whose drift measures
numerical mixing), dyed_tracer/regional dye (dye_example.F90), and
boundary_impulse_tracer.F90 (surface impulse for TTD estimation).
Each provides an init field and a column physics function wired
through the TracerRegistry.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.tracer.registry import TracerMeta, TracerRegistry

__all__ = ["register_ideal_age", "register_pseudo_salt",
           "register_regional_dye", "register_boundary_impulse",
           "register_dome_tracers"]

_YEAR = 365.0 * 86400.0


def register_ideal_age(reg: TracerRegistry, shape) -> jnp.ndarray:
    """Ideal ventilation age [years]: ages everywhere, reset to 0 in
    the surface layer (ideal_age_example.F90)."""
    def age_col(tr, h, dt, **ctx):
        tr = tr + dt / _YEAR
        return tr.at[0].set(0.0)
    reg.register(TracerMeta(name="age", longname="ideal age",
                            units="yr", column_fn=age_col))
    return jnp.zeros(shape)


def register_pseudo_salt(reg: TracerRegistry, S0) -> jnp.ndarray:
    """Passive copy of salinity (pseudo_salt_tracer.F90); the drift
    pseudo_salt − S diagnoses spurious numerical mixing."""
    reg.register(TracerMeta(name="pseudo_salt",
                            longname="passive salinity copy",
                            units="ppt"))
    return jnp.array(S0)


def register_regional_dye(reg: TracerRegistry, grid, shape,
                          lon_range=(0.0, 1e18), lat_range=(0.0, 1e18),
                          name: str = "dye1") -> jnp.ndarray:
    """Unit dye in a lon/lat box (dye_example.F90 regional dyes)."""
    inbox = ((grid.geoLonT >= lon_range[0])
             & (grid.geoLonT <= lon_range[1])
             & (grid.geoLatT >= lat_range[0])
             & (grid.geoLatT <= lat_range[1]))
    dye = jnp.where(inbox[None], 1.0, 0.0) * jnp.ones(shape)
    reg.register(TracerMeta(name=name, longname="regional dye",
                            units="nondim"))
    return dye * grid.mask2dT


def register_dome_tracers(reg: TracerRegistry, shape, n_dye: int = 2
                          ) -> dict:
    """DOME-class depth-banded dyes (DOME_tracer.F90 / dome_tracer):
    each dye fills one vertical band of layers so overflow pathways
    can be traced.  Returns {name: field}."""
    nk = shape[0]
    out = {}
    per = max(nk // max(n_dye, 1), 1)
    for d in range(n_dye):
        k0, k1 = d * per, (d + 1) * per if d < n_dye - 1 else nk
        tr = jnp.zeros(shape).at[k0:k1].set(1.0)
        name = f"dome_dye{d + 1}"
        reg.register(TracerMeta(name=name,
                                longname=f"DOME layer dye {d + 1}",
                                units="nondim"))
        out[name] = tr
    return out


def register_boundary_impulse(reg: TracerRegistry, shape,
                              remaining_steps: int = 1) -> jnp.ndarray:
    """Surface impulse released over the first steps
    (boundary_impulse_tracer.F90) for transit-time distributions."""
    state = {"n": remaining_steps}

    def impulse_col(tr, h, dt, **ctx):
        if state["n"] > 0:
            state["n"] -= 1
            return tr.at[0].set(1.0)
        return tr
    reg.register(TracerMeta(name="boundary_impulse",
                            longname="surface impulse", units="nondim",
                            column_fn=impulse_col))
    return jnp.zeros(shape)
