"""Area/volume-weighted global means.

Re-design of /root/reference/src/diagnostics/MOM_spatial_means.F90:
global_area_mean, global_layer_mean, global_volume_mean — all through
the order-invariant EFP reproducing sums so the results match across
layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mom6_tpu.framework.efp import efp_sum, efp_to_float
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import Grid

__all__ = ["global_area_mean", "global_volume_mean", "global_layer_mean"]


def _gsum(domain, x):
    if jax.config.jax_enable_x64:
        return efp_to_float(efp_sum(x, axis_names=domain.axis_names()))
    s = jnp.sum(x)
    for ax in domain.axis_names():
        s = jax.lax.psum(s, ax)
    return float(s)


def global_area_mean(domain: Domain, grid: Grid, f2d):
    w = grid.areaT * grid.mask2dT
    num = _gsum(domain, domain.interior(f2d * w))
    den = _gsum(domain, domain.interior(w))
    return num / max(den, 1e-300)


def global_volume_mean(domain: Domain, grid: Grid, f3d, h):
    w = grid.areaT * grid.mask2dT
    num = _gsum(domain, domain.interior(f3d * h * w))
    den = _gsum(domain, domain.interior(h * w))
    return num / max(den, 1e-300)


def global_layer_mean(domain: Domain, grid: Grid, f3d, h):
    """Per-layer volume-weighted means → (nk,) numpy array."""
    import numpy as np
    w = grid.areaT * grid.mask2dT
    nk = f3d.shape[0]
    out = np.zeros(nk)
    for k in range(nk):
        num = _gsum(domain, domain.interior(f3d[k] * h[k] * w))
        den = _gsum(domain, domain.interior(h[k] * w))
        out[k] = num / max(den, 1e-300)
    return out
