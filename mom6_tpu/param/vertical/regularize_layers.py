"""Regularization of near-vanished isopycnal layers.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_regularize_layers.F90 (regularize_layers, :61 / regularize_surface
:94): in layer mode, surface layers can be driven to vanishing
thickness in patches, leaving a contorted interface structure that
destabilizes the dynamics.  Columns where a layer is thinner than
`h_def` borrow mass from the thicker adjacent layer below (donor
limited), carrying tracer content conservatively.  Sweeps run top-down
a fixed number of times — branch-free, so vanished stacks are healed
incrementally rather than via the reference's iterative logic.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["RegularizeLayersCfg", "regularize_layers"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class RegularizeLayersCfg:
    h_def: float = 0.5           # deficit threshold [m] (REG_SFC_DEFICIT)
    donor_frac: float = 0.25     # max fraction taken from the donor
    n_sweeps: int = 2
    # HMIX_MIN (MOM_regularize_layers.F90:768,644-673): minimum
    # healthy mixed-layer thickness — the SURFACE layer is treated as
    # deficient (and heals by borrowing from below) whenever it is
    # thinner than this, not just thinner than h_def
    hmix_min: float = 0.0


def regularize_layers(cfg: RegularizeLayersCfg, h,
                      tracers: dict | None = None):
    """Heal near-vanished layers by borrowing from below.

    h: (nk, nj, ni).  Returns (h_new, tracers_new)."""
    content = None
    if tracers is not None:
        content = {name: t * h for name, t in tracers.items()}

    # per-layer deficit targets: the surface layer's is floored by
    # HMIX_MIN (the reference normalizes surface deficits by
    # max(Hmix_min, h), :673)
    target = jnp.full((h.shape[0] - 1,) + (1,) * (h.ndim - 1),
                      cfg.h_def, h.dtype)
    if cfg.hmix_min > cfg.h_def:
        target = target.at[0].set(cfg.hmix_min)
    for _ in range(cfg.n_sweeps):
        need = jnp.maximum(target - h[:-1], 0.0)
        give = jnp.minimum(need, cfg.donor_frac * h[1:])
        zero = jnp.zeros_like(h[:1])
        gain = jnp.concatenate([give, zero], axis=0)
        loss = jnp.concatenate([zero, give], axis=0)
        if content is not None:
            for name in content:
                c = content[name]
                t_dn = c[1:] / jnp.maximum(h[1:], _EPS)
                dc = give * t_dn
                content[name] = (c
                                 + jnp.concatenate([dc, zero], axis=0)
                                 - jnp.concatenate([zero, dc], axis=0))
        h = h + gain - loss

    out = None
    if content is not None:
        out = {name: c / jnp.maximum(h, _EPS)
               for name, c in content.items()}
    return h, out
