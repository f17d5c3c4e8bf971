"""Background diapycnal diffusivity profiles.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_bkgnd_mixing.F90 (CVMix background): constant, Bryan & Lewis
(1979) depth-dependent arctangent profile, and a Henyey-style
latitude-dependent scaling of the constant background.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["BkgndMixingCfg", "bkgnd_mixing_coeffs"]


@dataclasses.dataclass(frozen=True)
class BkgndMixingCfg:
    scheme: str = "constant"       # constant | bryan_lewis | henyey
    kd: float = 1e-5               # KD surface/background [m2 s-1]
    # Bryan-Lewis parameters (BRYAN_LEWIS_* in the reference)
    bl_kd_deep: float = 1.3e-4     # deep diffusivity [m2 s-1]
    bl_depth: float = 2500.0       # transition depth [m]
    bl_width: float = 222.2        # inverse transition scale 1/[m]·1e-3
    # Henyey latitude scaling
    henyey_n0_2omega: float = 20.0


def bkgnd_mixing_coeffs(cfg: BkgndMixingCfg, h, lat=None):
    """Kd at interfaces (nk+1, ...)."""
    nk = h.shape[0]
    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    scheme = cfg.scheme.lower()
    if scheme == "constant":
        kd = jnp.full_like(z_int, cfg.kd)
    elif scheme == "bryan_lewis":
        # Kd(z) = kd + (kd_deep-kd) * [1 + atan((z - z0)/w)/pi*2]/2 form
        inv_w = 1.0 / max(cfg.bl_width, 1e-10)
        kd = cfg.kd + (cfg.bl_kd_deep - cfg.kd) * 0.5 * (
            1.0 + (2.0 / math.pi) * jnp.arctan(
                (z_int - cfg.bl_depth) * inv_w))
    elif scheme == "henyey":
        if lat is None:
            kd = jnp.full_like(z_int, cfg.kd)
        else:
            absf = jnp.abs(jnp.sin(jnp.deg2rad(lat)))
            scale = jnp.maximum(absf * (1.0 + jnp.log(
                jnp.maximum(cfg.henyey_n0_2omega / jnp.maximum(
                    absf, 1e-8), 1.0))), 0.05)
            scale = scale / jnp.max(scale)
            kd = cfg.kd * scale[None] * jnp.ones_like(z_int)
    else:
        raise ValueError(f"Unknown background mixing scheme "
                         f"'{cfg.scheme}'")
    return kd.at[0].set(0.0).at[-1].set(0.0)
