"""Diabatic auxiliaries: frazil ice formation and u,v at h points.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diabatic_aux.F90: `make_frazil` (:95) clamps water below the
(pressure- and salinity-dependent) freezing point back to it and
accumulates the required heat as frazil [J m-2] for the ice model;
`find_uv_at_h` (:305) averages the staggered velocities to thickness
points with face-thickness weights.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1, ip1, jp1

__all__ = ["FrazilCfg", "make_frazil", "find_uv_at_h"]

_H_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class FrazilCfg:
    # linear freezing point Tf = dtfr_ds·S + tfr_s0_p0 + dtfr_dp·p
    # (TFREEZE_FORM = "LINEAR" defaults, MOM_TFreeze.F90)
    tfr_s0_p0: float = 0.0        # [degC]
    dtfr_ds: float = -0.054       # [degC ppt-1]
    dtfr_dp: float = -7.75e-8     # [degC Pa-1]
    rho0: float = 1035.0
    cp: float = 3991.86795711963  # [J kg-1 K-1]
    g: float = 9.81


def t_freeze(cfg: FrazilCfg, S, p):
    return cfg.tfr_s0_p0 + cfg.dtfr_ds * S + cfg.dtfr_dp * p


def make_frazil(cfg: FrazilCfg, h, T, S):
    """Clamp sub-freezing water to the freezing point.

    Returns (T_new, frazil) with frazil the column heat deficit
    [J m-2] ≥ 0 that the ice model must extract as ice formation."""
    z_mid = jnp.cumsum(h, axis=0) - 0.5 * h
    p = cfg.rho0 * cfg.g * z_mid
    tf = t_freeze(cfg, S, p)
    deficit = jnp.maximum(tf - T, 0.0)
    frazil = cfg.rho0 * cfg.cp * jnp.sum(deficit * h, axis=0)
    return T + deficit, frazil


def find_uv_at_h(u, v, h):
    """Thickness-weighted average of face velocities at h points
    (find_uv_at_h, MOM_diabatic_aux.F90:305).

    u[j,i] is the east face of cell (j,i); the h-point value averages
    the west (i-1) and east (i) faces weighted by the face
    thicknesses."""
    h_e = 0.5 * (h + ip1(h))          # at east faces (u points)
    h_n = 0.5 * (h + jp1(h))          # at north faces (v points)
    u_h = (im1(h_e * u) + h_e * u) / (im1(h_e) + h_e + _H_NEGLECT)
    v_h = (jm1(h_n * v) + h_n * v) / (jm1(h_n) + h_n + _H_NEGLECT)
    return u_h, v_h
