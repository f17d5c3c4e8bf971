"""Deterministic gridded random numbers.

Re-design of /root/reference/src/framework/MOM_random.F90: per-cell
random fields that are reproducible across layouts and restarts
because each cell's stream is keyed on its GLOBAL (i, j) index and the
date — here with the counter-based jax PRNG (threefry) folded over the
global indices, which is decomposition-invariant by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain

__all__ = ["gridded_normal", "gridded_uniform"]


def _cell_keys(domain: Domain, seed: int, i0: int = 0, j0: int = 0):
    """A (njh, nih) uint32 counter array from global cell indices.

    i0/j0: this shard's global origin (compute-domain offset) so the
    stream depends only on GLOBAL position."""
    H = domain.halo
    ii = jnp.arange(domain.nih) - H + i0
    jj = jnp.arange(domain.njh) - H + j0
    gi = jnp.broadcast_to(ii[None, :], (domain.njh, domain.nih))
    gj = jnp.broadcast_to(jj[:, None], (domain.njh, domain.nih))
    return gi.astype(jnp.uint32), gj.astype(jnp.uint32)


def gridded_uniform(domain: Domain, seed: int, nk: int = 1,
                    i0: int = 0, j0: int = 0):
    """(nk, njh, nih) uniform [0,1) — layout-invariant."""
    gi, gj = _cell_keys(domain, seed, i0, j0)
    base = jax.random.key(seed)
    # fold global coordinates into per-cell keys, then sample nk values
    mix = (gi * jnp.uint32(2654435761) ^ gj * jnp.uint32(40503)
           ).astype(jnp.uint32)
    keys = jax.vmap(lambda m: jax.random.fold_in(base, m))(mix.ravel())
    vals = jax.vmap(lambda k: jax.random.uniform(k, (nk,)))(keys)
    return jnp.moveaxis(vals.reshape(domain.njh, domain.nih, nk), -1, 0)


def gridded_normal(domain: Domain, seed: int, nk: int = 1,
                   i0: int = 0, j0: int = 0):
    gi, gj = _cell_keys(domain, seed, i0, j0)
    base = jax.random.key(seed)
    mix = (gi * jnp.uint32(2654435761) ^ gj * jnp.uint32(40503)
           ).astype(jnp.uint32)
    keys = jax.vmap(lambda m: jax.random.fold_in(base, m))(mix.ravel())
    vals = jax.vmap(lambda k: jax.random.normal(k, (nk,)))(keys)
    return jnp.moveaxis(vals.reshape(domain.njh, domain.nih, nk), -1, 0)
