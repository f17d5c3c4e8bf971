"""Vertical remapping of diagnostics onto fixed output coordinates.

Re-design of /root/reference/src/framework/MOM_diag_remap.F90
(diag_remap_update / diag_remap_do_remap): layer-space diagnostics are
conservatively remapped onto a fixed Z* output grid (the ``_z``
diagnostic coordinate) before posting, so time averages are taken on a
static vertical axis.  The output grid's per-column thicknesses are
the z-cell extents clipped by the local bathymetry; vanished cells
(below the bottom) are masked to the fill value on output.

Host-callable but jit-friendly: `remap_to_z` is pure jnp.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from mom6_tpu.ale.remapping import RemapCfg, remap_column_means

__all__ = ["DiagRemapCfg", "build_z_thickness", "remap_to_z",
           "build_rho_thickness"]


@dataclasses.dataclass(frozen=True)
class DiagRemapCfg:
    """Fixed Z output levels (interface depths, increasing, [m])."""
    z_edges: tuple = ()
    remap: RemapCfg = RemapCfg(scheme="PPM_H4")

    @staticmethod
    def uniform(nz: int, max_depth: float,
                scheme: str = "PPM_H4") -> "DiagRemapCfg":
        return DiagRemapCfg(
            z_edges=tuple(np.linspace(0.0, max_depth, nz + 1)),
            remap=RemapCfg(scheme=scheme))


def build_z_thickness(cfg: DiagRemapCfg, bathy) -> jnp.ndarray:
    """Per-column thicknesses of the output z-cells clipped by the
    bottom: h_z[k] = max(min(e[k+1], D) - min(e[k], D), 0)."""
    e = jnp.asarray(np.asarray(cfg.z_edges, np.float64)).reshape(
        (-1,) + (1,) * jnp.ndim(bathy))
    ecap = jnp.minimum(e, jnp.asarray(bathy)[None])
    return jnp.maximum(ecap[1:] - ecap[:-1], 0.0)


def build_rho_thickness(rho_targets, h, bathy, T, S, eos,
                        rho0: float = 1035.0, g: float = 9.8):
    """Per-column thicknesses of target potential-density layers for
    the ``_rho`` diagnostic coordinate (MOM_diag_remap.F90's rho
    vertical_coordinate): the RHO regrid inversion locates each
    density target in the column's (monotonized) profile."""
    from mom6_tpu.ale.regridding import RegridCfg, build_grid
    rl = jnp.asarray(np.asarray(rho_targets, np.float64))
    return build_grid(RegridCfg(mode="RHO", min_thickness=0.0),
                      h, bathy, T, S, eos, rlay=rl, rho0=rho0, g=g)


def remap_to_z(field, h, h_z, cfg: DiagRemapCfg,
               fill_value: float = np.nan):
    """Remap a (nk, ...) layer diagnostic onto the (nz, ...) output
    cells; cells with no water (h_z == 0) get ``fill_value``."""
    hz = h_z + 1e-30
    out = remap_column_means(h, field, hz, cfg.remap)
    return jnp.where(h_z > 0.0, out, fill_value)
