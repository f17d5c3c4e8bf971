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
           "register_dome_tracers", "register_oil_tracer",
           "register_advection_test"]

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


def register_dyed_obc_tracers(reg: TracerRegistry, shape,
                              n_dye: int) -> dict:
    """dye_01..dye_NN, initially zero; each open-boundary segment
    supplies a unit concentration of its own dye
    (dyed_obc_tracer.F90 / dyed_channel_initialization.F90)."""
    out = {}
    for m in range(1, n_dye + 1):
        name = f"dye_{m:02d}"
        reg.register(TracerMeta(name=name,
                                longname=f"dyed_obc tracer {m:02d}",
                                units="nondim"))
        out[name] = jnp.zeros(shape)
    return out


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
                              source_time: float = 31536000.0
                              ) -> jnp.ndarray:
    """Surface impulse for transit-time distributions
    (boundary_impulse_tracer.F90): the surface layer is held at 1
    while the traced model time is inside the source window
    (IMPULSE_SOURCE_TIME), then released.  Branch-free on the traced
    time, so the window closes inside jit without retracing."""
    def impulse_col(tr, h, dt, t=None, **ctx):
        if t is None:
            return tr.at[0].set(1.0)
        active = (t < source_time).astype(tr.dtype)
        return tr.at[0].set(active * 1.0 + (1.0 - active) * tr[0])
    reg.register(TracerMeta(name="boundary_impulse",
                            longname="surface impulse", units="nondim",
                            column_fn=impulse_col))
    return jnp.zeros(shape)


def register_oil_tracer(reg: TracerRegistry, grid, domain, shape,
                        source_lon: float, source_lat: float,
                        source_k: int = 0,
                        source_rate: float = 1.0,
                        decay_days: float = 0.0,
                        name: str = "oil1") -> jnp.ndarray:
    """Point-source oil with first-order decay (oil_tracer.F90):
    OIL_SOURCE_RATE [kg s-1] enters the cell nearest
    (OIL_SOURCE_LONGITUDE, OIL_SOURCE_LATITUDE) in layer
    OIL_SOURCE_LAYER and decays with OIL_DECAY_DAYS.  Concentration
    is kg m-3; the source divides by the evolving cell volume so the
    injected mass is exact.  The source cell is located once at build
    time (static one-hot), keeping the step free of data-dependent
    indexing."""
    dist2 = (grid.geoLonT - source_lon) ** 2 \
        + (grid.geoLatT - source_lat) ** 2
    import numpy as _np
    d2 = _np.asarray(dist2 + 1e30 * (1.0 - _np.asarray(grid.mask2dT)))
    jj, ii = _np.unravel_index(_np.argmin(d2), d2.shape)
    onehot = jnp.zeros(shape[1:]).at[jj, ii].set(1.0)
    gamma = 0.0 if decay_days <= 0.0 else 1.0 / (decay_days * 86400.0)
    k = min(max(source_k, 0), shape[0] - 1)

    def oil_col(tr, h, dt, **ctx):
        tr = tr * jnp.exp(-gamma * dt)
        dc = (source_rate * dt) / (grid.areaT * jnp.maximum(h[k], 1e-3))
        return tr.at[k].add(dc * onehot)
    reg.register(TracerMeta(name=name, longname="oil tracer",
                            units="kg m-3", column_fn=oil_col))
    return jnp.zeros(shape)


def register_advection_test(reg: TracerRegistry, grid, shape,
                            x_origin: float, y_origin: float,
                            x_width: float, y_width: float) -> dict:
    """The advection-test shapes (advection_test_tracer.F90): a flat
    cylinder and a cosine bell of the same footprint, initialized in
    every layer, for eyeballing scheme dispersion/shape preservation.
    Origin/width are in the grid's axis units."""
    dx = (grid.geoLonT - x_origin) / max(x_width, 1e-30)
    dy = (grid.geoLatT - y_origin) / max(y_width, 1e-30)
    r = jnp.sqrt(dx * dx + dy * dy)
    cyl = jnp.where(r <= 1.0, 1.0, 0.0) * grid.mask2dT
    bell = jnp.where(r <= 1.0, 0.5 * (1.0 + jnp.cos(jnp.pi
                                                    * jnp.minimum(r, 1.0))),
                     0.0) * grid.mask2dT
    out = {}
    for nm, f2d in (("tr_cyl", cyl), ("tr_bell", bell)):
        reg.register(TracerMeta(name=nm,
                                longname=f"advection test {nm}",
                                units="nondim"))
        out[nm] = jnp.broadcast_to(f2d[None], shape) + jnp.zeros(shape)
    return out
