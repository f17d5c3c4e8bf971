"""Field checksums for debugging and invariance testing.

Re-design of ``MOM_checksums``
(/root/reference/src/framework/MOM_checksums.F90:19-21 hchksum &c.):
per-field statistics over the compute domain — min, max, mean, and a
bitwise checksum (total population count of the IEEE representation) —
that are invariant under domain decomposition, making them the primary
tool for layout/restart/rotation invariance tests and DEBUG-mode
"checksum flood" comparisons.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain

__all__ = ["chksum", "Chksum", "hchksum_str", "is_nan"]


@dataclasses.dataclass(frozen=True)
class Chksum:
    bitcount: int
    vmin: float
    vmax: float
    mean: float

    def __str__(self):
        return (f"bits={self.bitcount} min={self.vmin:.17g} "
                f"max={self.vmax:.17g} mean={self.mean:.17g}")


def _bits(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.float64:
        # two u32 views, not one s64 bitcast: the TPU X64-rewrite pass
        # cannot lower s64 bitcast-convert, and popcount distributes
        # over the halves anyway
        i2 = jax.lax.bitcast_convert_type(x, jnp.uint32)
        pc = jax.lax.population_count(i2)
        return jnp.sum(pc.astype(jnp.int64), axis=-1)
    if x.dtype == jnp.float32:
        i = jax.lax.bitcast_convert_type(x, jnp.int32)
        pc = jax.lax.population_count(i)
        return pc.astype(jnp.int64) if jax.config.jax_enable_x64 else pc
    x32 = x.astype(jnp.float32)
    return jax.lax.population_count(
        jax.lax.bitcast_convert_type(x32, jnp.int32))


def chksum_arrays(domain: Domain, f: jnp.ndarray):
    """Jit-safe checksum pieces: (bitcount, min, max, sum, count)."""
    x = domain.interior(f)
    bc = jnp.sum(_bits(x))
    s = jnp.sum(x)
    n = jnp.asarray(x.size, dtype=s.dtype)
    mn, mx = jnp.min(x), jnp.max(x)
    for ax in domain.axis_names():
        bc = jax.lax.psum(bc, ax)
        s = jax.lax.psum(s, ax)
        n = jax.lax.psum(n, ax)
        mn = jax.lax.pmin(mn, ax)
        mx = jax.lax.pmax(mx, ax)
    return bc, mn, mx, s, n


def chksum(domain: Domain, f: jnp.ndarray) -> Chksum:
    bc, mn, mx, s, n = jax.jit(chksum_arrays)(domain, f)
    return Chksum(int(bc), float(mn), float(mx), float(s) / float(n))


def hchksum_str(domain: Domain, f: jnp.ndarray, name: str) -> str:
    return f"{name}: {chksum(domain, f)}"


def is_nan(domain: Domain, f: jnp.ndarray) -> bool:
    return bool(jnp.any(jnp.isnan(domain.interior(f))))
