"""Offline tracer transport.

Re-design of /root/reference/src/tracer/MOM_offline_main.F90 (and
``step_offline``, MOM.F90:1797): advance tracers from STORED mass
transports and diffusivities (e.g. from a previous online run's
diagnostics) without running the dynamics — the standard mode for fast
BGC spin-up.  Each offline step: advect with the accumulated
transports, then vertical diffusion with the stored Kd.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.tracer.advect import TracerAdvectCfg, advect_tracers
from mom6_tpu.tracer.vertdiff import tracer_vertdiff

__all__ = ["OfflineCfg", "step_offline"]


@dataclasses.dataclass(frozen=True)
class OfflineCfg:
    tracer_adv: TracerAdvectCfg = TracerAdvectCfg(n_sweep_pairs=3)
    dt_offline: float = 86400.0


def step_offline(domain, grid: Grid, tracers: dict, h_end,
                 uhtr, vhtr, kd_int, cfg: OfflineCfg,
                 registry=None, x_first: bool = True):
    """One offline step.  uhtr/vhtr are the time-integrated transports
    [m3] over dt_offline; h_end the thickness at interval END (the
    reference's OFF_SNAP_FILE stores end-of-timestep h,
    MOM_offline_main.F90:1635) — the pre-transport thickness is
    reconstructed inside advect_tracers.  Returns (tracers, h_end)."""
    tracers = domain.fill_halos(tracers, width=2)
    h_end, uhtr, vhtr = domain.fill_halos((h_end, uhtr, vhtr),
                                          width=2)
    tracers, h_end, _resid = advect_tracers(domain, grid, tracers,
                                            h_end, uhtr, vhtr,
                                            cfg.tracer_adv,
                                            x_first=x_first)
    if kd_int is not None:
        tracers = {k: tracer_vertdiff(v, h_end, kd_int, cfg.dt_offline)
                   for k, v in tracers.items()}
    if registry is not None:
        tracers = registry.apply_column_fns(tracers, h_end,
                                            cfg.dt_offline)
    return tracers, h_end
