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

__all__ = ["SpongeCfg", "apply_sponge"]


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
