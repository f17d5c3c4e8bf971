"""Layer-mode diapycnal entrainment (diffusive limit).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_entrain_diffusive.F90 (entrainment_diffusive, :59): in isopycnal
mode, interior diapycnal diffusion Kd migrates interfaces at the
diapycnal velocity  e = −∂z(Kd ∂z b)/∂z b.  For uniform density steps
Δb this discretizes to a thickness exchange across interface k of

  f_k = Kd_k dt (1/h_k − 1/h_{k-1})      [m per step]

(positive = layer k entrains from the layer above), so thin layers
inflate at the expense of thick neighbours and the column relaxes to
the uniform-N² diffusive equilibrium; mass is conserved by
telescoping and entrained mass carries the donor layer's tracer
content.  The reference solves an implicit system and handles unequal
g_prime weighting; here rates are explicit with donor-limited
clipping (≤ frac_max of the donor layer per step) — branch-free and
unconditionally stable, reaching the same equilibrium over steps.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["EntrainDiffusiveCfg", "entrainment_diffusive"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class EntrainDiffusiveCfg:
    frac_max: float = 0.2        # max fraction of a donor layer / step
    h_min: float = 1e-3          # thickness floor in the 1/h rates


def entrainment_diffusive(cfg: EntrainDiffusiveCfg, h, kd_int, dt,
                          tracers: dict | None = None):
    """Apply diffusive entrainment to thicknesses (and tracers).

    h: (nk, nj, ni) layer thickness; kd_int: (nk+1, nj, ni) interface
    diffusivity [m2 s-1] (rows 0 and nk are ignored — no entrainment
    through the surface or bottom).  Returns (h_new, tracers_new,
    f) with f the (nk+1, ...) interface exchange (positive = the layer
    below the interface gained mass from above)."""
    nk = h.shape[0]
    h_up = h[:-1]                       # layer above interface 1..nk-1
    h_dn = h[1:]                        # layer below
    f = kd_int[1:nk] * dt * (1.0 / jnp.maximum(h_dn, cfg.h_min)
                             - 1.0 / jnp.maximum(h_up, cfg.h_min))
    # donor limiting: downward transfer draws on the layer above,
    # upward transfer on the layer below
    f = jnp.clip(f, -cfg.frac_max * h_dn, cfg.frac_max * h_up)
    zero = jnp.zeros_like(h[:1])
    f_full = jnp.concatenate([zero, f, zero], axis=0)   # (nk+1, ...)

    # dh_k = f_k − f_{k+1}: telescoping, exact mass conservation
    h_new = h + f_full[:-1] - f_full[1:]

    out = None
    if tracers is not None:
        out = {}
        for name, t in tracers.items():
            t_up = jnp.concatenate([t[:1], t[:-1]], axis=0)
            # donor tracer at each interface: the upper layer when the
            # flux is downward (f>0), else the lower layer
            t_don = jnp.where(f_full[:-1] > 0, t_up, t)
            t_don_b = jnp.concatenate([t_don[1:], t[-1:]], axis=0)
            content = (t * h + f_full[:-1] * t_don
                       - f_full[1:] * t_don_b)
            out[name] = content / jnp.maximum(h_new, _EPS)
    return h_new, out, f_full
