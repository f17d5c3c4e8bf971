"""Order-invariant (reproducing) global sums via extended fixed point.

Re-design of the reference's ``MOM_coms`` EFP machinery
(/root/reference/src/framework/MOM_coms.F90:93-741): global sums whose
results are bitwise independent of the summation order, and hence of
the domain decomposition (device count / layout).  Each float64 value
is decomposed exactly into ``NLIMB`` signed int64 limbs in base
``2**LIMB_BITS``; integer limb sums are associative, so ``jnp.sum`` over
any on-device order plus ``jax.lax.psum`` across devices gives the same
limbs as a serial sum.  The limbs→float reconstruction is done with
exact Python big-int arithmetic on the host.

Requires ``jax_enable_x64`` for the int64 path.  Without x64 (the
fp32 TPU flagship configuration) :func:`efp_sum32` provides the same
order-invariance guarantee natively in int32: each fp32 value is
decomposed EXACTLY into 12-bit signed limbs (power-of-two divisions
and leading-bit subtractions are exact in fp32), row sums stay below
int32 overflow for up to 2**19 elements, and a carry renormalization
between the row stage and the row-sum stage extends the capacity to
2**38 points — enough for any single-chip tile.  int32 limb sums and
psums are associative, so the result is bitwise independent of both
the on-device order and the device layout.

Dynamic range: values with ``|x| < 2**EXP_MAX`` are represented with an
absolute resolution of ``2**EXP_MIN``; out-of-range magnitudes raise in
`efp_from_float` (host) and are clamped on device (the reference
similarly traps overflow, MOM_coms.F90:629 carry_overflow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "NLIMB", "efp_sum", "efp_to_float", "efp_add", "efp_zero",
    "reproducing_sum", "efp_sum32", "efp32_to_float", "NLIMB32",
]

NLIMB = 6
LIMB_BITS = 32
EXP_MIN = -116                     # scale of limb 0 = 2**EXP_MIN
EXP_MAX = EXP_MIN + NLIMB * LIMB_BITS   # 76: max representable magnitude

_SCALES = [2.0 ** (EXP_MIN + LIMB_BITS * l) for l in range(NLIMB)]


def _x64_ready() -> bool:
    return jax.config.jax_enable_x64


def efp_zero() -> jnp.ndarray:
    return jnp.zeros((NLIMB,), dtype=jnp.int64)


def efp_sum(x: jnp.ndarray, mask: jnp.ndarray | None = None,
            axis_names: tuple[str, ...] = ()) -> jnp.ndarray:
    """Decompose ``x`` (float64 array) into limbs and sum → int64[NLIMB].

    ``mask`` (same shape, 0/1) selects contributing elements.  When
    called inside ``shard_map``, pass the mesh ``axis_names`` to psum
    across devices.  Up to ~2**30 elements can be summed before limb
    overflow; carry normalization happens in :func:`efp_to_float`.
    """
    x = x.astype(jnp.float64)
    if mask is not None:
        x = x * mask.astype(x.dtype)
    # clamp to representable range (overflow would silently wrap int64)
    lim = 2.0 ** (EXP_MAX - 1)
    x = jnp.clip(x, -lim, lim)
    # Decompose |x| and carry the sign on the limbs: flooring a negative
    # value at a scale larger than |x| would yield q=-1 and a remainder
    # ~scale whose low bits fall below fp64 precision.
    sign = jnp.where(x < 0, -1, 1).astype(jnp.int64)
    limbs = []
    r = jnp.abs(x)
    for l in range(NLIMB - 1, -1, -1):
        scale = 2.0 ** (EXP_MIN + LIMB_BITS * l)
        q = jnp.floor(r / scale)
        r = r - q * scale
        # cast each element to int64 BEFORE summing: a float64 sum of
        # ~2**30 limbs of magnitude ~2**32 would exceed the 53-bit
        # exact-integer range and lose reproducibility.
        limbs.append(jnp.sum(sign * q.astype(jnp.int64)))
    out = jnp.stack(limbs[::-1])   # limb 0 = least significant
    for ax in axis_names:
        out = jax.lax.psum(out, ax)
    return out


def efp_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a + b


def efp_sum_layers(x: jnp.ndarray,
                   axis_names: tuple[str, ...] = ()) -> jnp.ndarray:
    """Per-layer order-invariant sums: (nk, nj, ni) float64 →
    int64[NLIMB, nk] limbs (the layer-resolved companion of
    :func:`efp_sum`, for the depth-list APE machinery of
    MOM_sum_output.F90:610-630 which needs global per-layer volumes)."""
    x = x.astype(jnp.float64)
    lim = 2.0 ** (EXP_MAX - 1)
    x = jnp.clip(x, -lim, lim)
    sign = jnp.where(x < 0, -1, 1).astype(jnp.int64)
    red = tuple(range(1, x.ndim))
    limbs = []
    r = jnp.abs(x)
    for l in range(NLIMB - 1, -1, -1):
        scale = 2.0 ** (EXP_MIN + LIMB_BITS * l)
        q = jnp.floor(r / scale)
        r = r - q * scale
        limbs.append(jnp.sum(sign * q.astype(jnp.int64), axis=red))
    out = jnp.stack(limbs[::-1])   # (NLIMB, nk)
    for ax in axis_names:
        out = jax.lax.psum(out, ax)
    return out


def efp_limbs_to_float_ingraph(limbs, scale_pow2: int = 0):
    """In-graph limbs → float (f64 under x64, f32 otherwise).

    Works on both the int64 (NLIMB, ...) and int32 (NLIMB32[+1], ...)
    limb layouts — distinguished by dtype.  The conversion itself is
    a deterministic weighted sum of identical limb values, so the
    result stays bitwise layout-invariant even though it rounds."""
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if limbs.dtype == jnp.int64:
        n, bits, emin = NLIMB, LIMB_BITS, EXP_MIN
    else:
        n, bits, emin = NLIMB32, LIMB_BITS32, EXP_MIN32 - scale_pow2
    tot = jnp.zeros(limbs.shape[1:], ftype)
    for l in range(n - 1, -1, -1):
        tot = tot + limbs[l].astype(ftype) * ftype(2.0) ** (
            emin + bits * l)
    return tot


def efp_sum32_layers(x: jnp.ndarray,
                     axis_names: tuple[str, ...] = (),
                     scale_pow2: int = 0) -> jnp.ndarray:
    """Per-layer variant of :func:`efp_sum32`: (nk, nj, ni) fp32 →
    int32[NLIMB32+1, nk]."""
    x = jnp.asarray(x, jnp.float32)
    if scale_pow2:
        x = x * jnp.float32(2.0 ** scale_pow2)
    nk = x.shape[0]
    bad = ~jnp.isfinite(x)
    n_bad = jnp.sum(bad.astype(jnp.int32), axis=tuple(range(1, x.ndim)))
    x = jnp.where(bad, 0.0, x)
    lim = jnp.float32(2.0 ** (EXP_MAX32 - 1))
    x = jnp.clip(x, -lim, lim)
    sign = jnp.where(x < 0, -1, 1).astype(jnp.int32)
    flat = jnp.abs(x).reshape(nk, -1, x.shape[-1])
    sgn = sign.reshape(flat.shape)
    row_limbs = []
    for l in range(NLIMB32 - 1, -1, -1):
        scale = jnp.float32(2.0 ** (EXP_MIN32 + LIMB_BITS32 * l))
        q = jnp.floor(flat / scale)
        flat = flat - q * scale
        row_limbs.append(jnp.sum(sgn * q.astype(jnp.int32), axis=-1))
    row_limbs = row_limbs[::-1]
    row_limbs = _carry_renorm32(row_limbs)     # (nk, rows) each
    out = jnp.stack([jnp.sum(l, axis=-1) for l in row_limbs]
                    + [n_bad])                 # (NLIMB32+1, nk)
    for ax in axis_names:
        out = jax.lax.psum(out, ax)
    return out


def efp_to_float(limbs) -> float:
    """Exact limbs → float64 on the host (Python big-int arithmetic)."""
    limbs = np.asarray(limbs)
    total = 0
    for l in range(NLIMB):
        total += int(limbs[l]) << (LIMB_BITS * l)
    # total is in units of 2**EXP_MIN
    return float(total) * (2.0 ** EXP_MIN)


# ---- fp32 / int32 path (TPU-native, no x64 required) ----

NLIMB32 = 9
LIMB_BITS32 = 12
EXP_MIN32 = -48                    # limb-0 scale; resolution 2**-48
EXP_MAX32 = EXP_MIN32 + NLIMB32 * LIMB_BITS32    # 60


def _carry_renorm32(limbs):
    """Propagate signed carries so every limb is back in
    [0, 2**LIMB_BITS32) except the top one (the carry_overflow
    normalization of MOM_coms.F90:629, in int32)."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for l in range(NLIMB32):
        v = limbs[l] + carry
        carry = v >> LIMB_BITS32          # arithmetic shift: floor
        out.append(v - (carry << LIMB_BITS32))
    out[-1] = out[-1] + (carry << LIMB_BITS32)   # clamp into the top
    return out


def efp_sum32(x: jnp.ndarray, mask: jnp.ndarray | None = None,
              axis_names: tuple[str, ...] = (),
              scale_pow2: int = 0) -> jnp.ndarray:
    """Order-invariant sum of an fp32 array → int32[NLIMB32] limbs.

    The per-element limb decomposition is exact (powers of two), so
    any summation order gives identical limbs.  Two-stage summation
    (rows, then carry renormalization, then across rows) keeps every
    int32 accumulation below overflow for up to 2**19 elements per
    axis.  ``scale_pow2`` pre-multiplies by 2**scale_pow2 (exact in
    fp32) so large-magnitude integrands (cell volumes, energies) fit
    the limb window; pass the same value to :func:`efp32_to_float`."""
    x = jnp.asarray(x, jnp.float32)
    if mask is not None:
        x = x * mask.astype(x.dtype)
    if scale_pow2:
        x = x * jnp.float32(2.0 ** scale_pow2)
    # non-finite inputs must poison the result visibly (the reference
    # traps NaNs in its checksums); count them into an extra limb and
    # zero them in the decomposition so the int path stays defined
    bad = ~jnp.isfinite(x)
    n_bad = jnp.sum(bad.astype(jnp.int32))
    x = jnp.where(bad, 0.0, x)
    lim = jnp.float32(2.0 ** (EXP_MAX32 - 1))
    x = jnp.clip(x, -lim, lim)
    sign = jnp.where(x < 0, -1, 1).astype(jnp.int32)
    r = jnp.abs(x)
    flat = r.reshape(-1, r.shape[-1]) if r.ndim > 1 else r[None]
    sgn = sign.reshape(flat.shape)
    row_limbs = []
    for l in range(NLIMB32 - 1, -1, -1):
        scale = jnp.float32(2.0 ** (EXP_MIN32 + LIMB_BITS32 * l))
        q = jnp.floor(flat / scale)
        flat = flat - q * scale
        row_limbs.append(jnp.sum(sgn * q.astype(jnp.int32), axis=-1))
    row_limbs = row_limbs[::-1]               # limb 0 least significant
    row_limbs = _carry_renorm32(row_limbs)
    out = jnp.stack([jnp.sum(l, axis=0) for l in row_limbs]
                    + [n_bad])
    for ax in axis_names:
        out = jax.lax.psum(out, ax)
    return out


def efp32_to_float(limbs, scale_pow2: int = 0) -> float:
    """Exact int32 limbs → float on the host; NaN when any input was
    non-finite (the trailing limb carries the non-finite count)."""
    limbs = np.asarray(limbs)
    if limbs.shape[0] > NLIMB32 and int(limbs[NLIMB32]) != 0:
        return float("nan")
    total = 0
    for l in range(NLIMB32):
        total += int(limbs[l]) << (LIMB_BITS32 * l)
    return float(total) * (2.0 ** (EXP_MIN32 - scale_pow2))


def reproducing_sum(x, mask=None, axis_names: tuple[str, ...] = ()) -> float:
    """Host-level convenience: order-invariant global sum of an array.

    Uses the int64 path under x64 and the TPU-native int32 path
    otherwise — both bitwise layout-invariant."""
    if _x64_ready():
        return efp_to_float(jax.jit(efp_sum, static_argnames=("axis_names",))(
            x, mask, axis_names=axis_names))
    return efp32_to_float(jax.jit(
        efp_sum32, static_argnames=("axis_names",))(
            x, mask, axis_names=axis_names))
