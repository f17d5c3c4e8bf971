"""Shift helpers for C-grid stencils on halo-padded arrays.

All fields are halo-padded (..., njh, nih) arrays; a shift by one cell
is a `jnp.roll` on the trailing axes.  Values rolled across the array
edge land in halo zones whose contents are refreshed by
`Domain.fill_halos` before each stencil phase, so the wraparound values
never reach the compute domain (the validity-shrinkage bookkeeping of
the reference's variable-halo passes, MOM_domain_infra.F90:218).

Naming: ``ip1(f)[j, i] == f[j, i+1]`` etc.  XLA lowers these rolls to
slice+concat pairs that fuse into the consuming elementwise ops.
"""

import jax.numpy as jnp

__all__ = ["ip1", "im1", "jp1", "jm1", "ishift", "jshift"]


def ip1(f):
    return jnp.roll(f, -1, axis=-1)


def im1(f):
    return jnp.roll(f, 1, axis=-1)


def jp1(f):
    return jnp.roll(f, -1, axis=-2)


def jm1(f):
    return jnp.roll(f, 1, axis=-2)


def ishift(f, n):
    return jnp.roll(f, -n, axis=-1)


def jshift(f, n):
    return jnp.roll(f, -n, axis=-2)
