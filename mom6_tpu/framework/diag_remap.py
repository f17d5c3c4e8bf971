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
           "build_rho_thickness", "reintegrate_to_z",
           "interpolate_to_z"]


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
    cells; cells with no water (h_z == 0) get ``fill_value``.

    This is the intensive cell-mean path (diag_remap_do_remap,
    MOM_diag_remap.F90:373); see :func:`reintegrate_to_z` for
    extensive fields and :func:`interpolate_to_z` for interface
    quantities."""
    hz = h_z + 1e-30
    out = remap_column_means(h, field, hz, cfg.remap)
    return jnp.where(h_z > 0.0, out, fill_value)


def reintegrate_to_z(field, h, h_z, fill_value: float = 0.0):
    """Conservatively re-bin an EXTENSIVE layer diagnostic (a layer
    integral like a mass flux or tendency·h) onto the output cells:
    column totals are preserved exactly
    (vertically_reintegrate_diag_field, MOM_diag_remap.F90:547).

    Piecewise-constant density field/h is integrated over each target
    cell — the overlap matrix evaluated in closed form from the two
    interface sets."""
    z_src = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    z_dst = jnp.concatenate([jnp.zeros_like(h_z[:1]),
                             jnp.cumsum(h_z, axis=0)], axis=0)
    dens = field / (h + 1e-30)                 # per-unit-thickness
    # integral of dens from surface to depth z (piecewise linear I(z))
    Isrc = jnp.concatenate([jnp.zeros_like(field[:1]),
                            jnp.cumsum(field, axis=0)], axis=0)

    def I_at(z):
        # locate z in the source interfaces per column, branch-free
        below = (z_src[:-1, None] <= z[None]).astype(field.dtype)
        k = jnp.clip(jnp.sum(below, axis=0) - 1, 0,
                     h.shape[0] - 1).astype(jnp.int32)
        z_lo = jnp.take_along_axis(z_src, k, axis=0)
        d_k = jnp.take_along_axis(dens, k, axis=0)
        I_lo = jnp.take_along_axis(Isrc, k, axis=0)
        z_cl = jnp.clip(z, 0.0, z_src[-1])
        return I_lo + d_k * (z_cl - z_lo)

    I_dst = I_at(z_dst)
    out = I_dst[1:] - I_dst[:-1]
    return jnp.where(h_z > 0.0, out, fill_value)


def interpolate_to_z(field_int, h, z_out, fill_value: float = np.nan):
    """Linearly interpolate an INTERFACE diagnostic (nk+1, ...) onto
    fixed output depths z_out (vertically_interpolate_diag_field,
    MOM_diag_remap.F90:665)."""
    z_src = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    zo = jnp.asarray(np.asarray(z_out, np.float64)).reshape(
        (-1,) + (1,) * (h.ndim - 1))
    zo_b = jnp.broadcast_to(zo, (zo.shape[0],) + h.shape[1:])
    below = (z_src[:-1, None] <= zo_b[None]).astype(field_int.dtype)
    k = jnp.clip(jnp.sum(below, axis=0) - 1, 0,
                 h.shape[0] - 1).astype(jnp.int32)
    z_lo = jnp.take_along_axis(z_src, k, axis=0)
    z_hi = jnp.take_along_axis(z_src, k + 1, axis=0)
    f_lo = jnp.take_along_axis(field_int, k, axis=0)
    f_hi = jnp.take_along_axis(field_int, k + 1, axis=0)
    w = jnp.clip((zo_b - z_lo) / jnp.maximum(z_hi - z_lo, 1e-30),
                 0.0, 1.0)
    out = (1.0 - w) * f_lo + w * f_hi
    depth = z_src[-1]
    return jnp.where(zo_b <= depth[None], out, fill_value)
