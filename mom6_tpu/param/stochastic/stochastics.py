"""Stochastic physics perturbations.

Re-design of /root/reference/src/parameterizations/stochastic/
MOM_stochastics.F90 (SPPT and SKEB hooks fed by the external
stochastic_physics package, stubbed at
config_src/external/stochastic_physics/): AR(1)-in-time, spatially
smoothed random pattern fields used to multiply physics tendencies
(SPPT) or perturb ePBL energetics.  Patterns are generated with the
layout-invariant gridded PRNG.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mom6_tpu.framework.random import gridded_normal
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["StochasticsCfg", "init_pattern", "step_pattern",
           "apply_sppt"]


@dataclasses.dataclass(frozen=True)
class StochasticsCfg:
    do_sppt: bool = False            # DO_SPPT
    sppt_amplitude: float = 0.5
    decorr_steps: int = 48           # AR(1) decorrelation [steps]
    smooth_passes: int = 4           # spatial smoothing iterations
    clip: float = 0.8                # |pattern| clip for stability


def _smooth(domain: Domain, f, passes: int):
    for _ in range(passes):
        f = 0.5 * f + 0.125 * ((ip1(f) + im1(f)) + (jp1(f) + jm1(f)))
        f = domain.fill_halos(f, width=1)
    return f


def init_pattern(domain: Domain, cfg: StochasticsCfg, seed: int,
                 i0=0, j0=0):
    r = gridded_normal(domain, seed, nk=1, i0=i0, j0=j0)[0]
    return _smooth(domain, r, cfg.smooth_passes)


def step_pattern(domain: Domain, cfg: StochasticsCfg, pattern, seed,
                 step: int, i0=0, j0=0):
    """AR(1) update: p' = φ p + √(1−φ²)·ε with fresh smoothed noise."""
    phi = jnp.exp(-1.0 / cfg.decorr_steps)
    eps = gridded_normal(domain, seed + step + 1, nk=1, i0=i0, j0=j0)[0]
    eps = _smooth(domain, eps, cfg.smooth_passes)
    return phi * pattern + jnp.sqrt(1.0 - phi * phi) * eps


def apply_sppt(cfg: StochasticsCfg, tendency, pattern):
    """Multiply a physics tendency by (1 + a·pattern), clipped."""
    fac = 1.0 + cfg.sppt_amplitude * jnp.clip(pattern, -cfg.clip,
                                              cfg.clip)
    return tendency * fac
