"""Sponge (restoring) layers.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_ALE_sponge.F90 (and the layered MOM_sponge.F90): Newtonian
relaxation of T/S/tracers (and optionally velocities) toward reference
profiles with a spatially-varying inverse damping rate, applied
implicitly:  a' = (a + dt·γ·a_ref) / (1 + dt·γ).

In ALE mode the reference profiles live on their own fixed grid and
are remapped to the evolving model grid before damping — here via the
same conservative remapping core.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from mom6_tpu.ale.remapping import RemapCfg, remap_column_means

__all__ = ["SpongeCfg", "apply_sponge", "apply_eta_sponge"]


@dataclasses.dataclass(frozen=True)
class SpongeCfg:
    remap: RemapCfg = RemapCfg(scheme="PLM")
    damp_uv: bool = False


def apply_sponge(state_fields: dict, h, iresttime, dt,
                 ref_fields: dict, ref_h=None,
                 cfg: SpongeCfg = SpongeCfg()):
    """Damp ``state_fields`` toward ``ref_fields``.

    iresttime: (njh, nih) inverse restoring time [s-1] (0 = no damping);
    ref_h: the reference profiles' own thickness grid (nk_ref, ...);
    if given, profiles are remapped onto h first (ALE sponge)."""
    damp = dt * iresttime
    fac = damp / (1.0 + damp)
    out = {}
    for name, a in state_fields.items():
        ref = ref_fields.get(name)
        if ref is None:
            out[name] = a
            continue
        if ref_h is not None:
            ref = remap_column_means(ref_h, ref, h, cfg.remap)
        out[name] = a + fac[None] * (ref - a)
    return out


def apply_eta_sponge(h, iresttime, dt, d_ref, angstrom: float = 0.0):
    """Layered-mode interface-height sponge (the eta restoring of
    MOM_sponge.F90 apply_sponge): interior interface depths are damped
    implicitly toward the target profile ``d_ref`` (nk+1, njh, nih;
    depth below the free surface, positive down), then re-monotonized.
    The surface and bottom interfaces are pinned, so the column total
    — and with it the model's mass — is exactly preserved; the sponge
    redistributes mass between layers, which is the meaningful part of
    the reference's isopycnal-interface restoring."""
    nk = h.shape[0]
    d = jnp.concatenate([jnp.zeros_like(h[:1]),
                         jnp.cumsum(h, axis=0)], axis=0)
    htot = d[-1]
    fac = (dt * iresttime) / (1.0 + dt * iresttime)
    d_tgt = jnp.clip(d_ref, 0.0, htot[None])
    d_new = d + fac[None] * (d_tgt - d)
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    d_new = jnp.where(K == 0, 0.0, jnp.where(K == nk, htot[None],
                                             d_new))
    import jax
    d_new = jax.lax.associative_scan(jnp.maximum, d_new, axis=0)
    d_new = jnp.minimum(d_new, htot[None])
    d_new = jnp.where(K == nk, htot[None], d_new)
    return jnp.maximum(d_new[1:] - d_new[:-1], angstrom)
