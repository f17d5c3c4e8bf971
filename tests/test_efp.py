import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.framework.efp import (
    efp_sum, efp_to_float, reproducing_sum, NLIMB)


def test_exact_small():
    x = jnp.array([1.0, 2.5, -0.75, 1e-6])
    got = efp_to_float(efp_sum(x))
    # EFP resolution is 2**-116, far below fp64 ulp of this sum
    assert got == float(np.sum(np.asarray(x, dtype=np.float64)))


def test_order_invariance():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000) * np.exp(rng.uniform(-30, 30, 10000))
    a = efp_sum(jnp.asarray(x))
    b = efp_sum(jnp.asarray(x[::-1].copy()))
    # limbs identical regardless of order (after carry normalization the
    # reconstructed values must be bit-identical)
    assert efp_to_float(a) == efp_to_float(b)


def test_partition_invariance():
    """Sum of per-block limb sums == limbs of full sum (layout analog)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 64))
    full = efp_sum(jnp.asarray(x))
    parts = sum(
        (efp_sum(jnp.asarray(x[i:i + 16])) for i in range(0, 64, 16)),
        start=jnp.zeros((NLIMB,), jnp.int64))
    assert efp_to_float(full) == efp_to_float(parts)


def test_mask():
    x = jnp.array([3.0, 5.0, 7.0])
    m = jnp.array([1.0, 0.0, 1.0])
    assert efp_to_float(efp_sum(x, m)) == 10.0


def test_reproducing_sum_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1000)
    got = reproducing_sum(jnp.asarray(x))
    expect = float(sum(sorted(x.tolist())))  # any exactish ordering
    assert abs(got - expect) < 1e-12 * max(1.0, abs(expect))


def test_large_magnitudes():
    x = jnp.array([2.0**70, -2.0**70, 1.0])
    assert efp_to_float(efp_sum(x)) == 1.0


def test_tiny_magnitudes():
    x = jnp.array([2.0**-100, 2.0**-100])
    assert efp_to_float(efp_sum(x)) == 2.0**-99


def test_efp32_exact_and_order_invariant():
    """The fp32/int32 path: exact round trip for single values, and
    bitwise order-invariance under shuffling and partitioned sums
    (the TPU-native reproducing sum; no x64 involved)."""
    from mom6_tpu.framework.efp import efp_sum32, efp32_to_float
    rng = np.random.default_rng(7)
    # exact single-value round trip at several magnitudes
    for mag in (1e-6, 1.0, 1e8, 1e15):
        x = jnp.asarray([np.float32(0.6125 * mag)], jnp.float32)
        got = efp32_to_float(efp_sum32(x))
        assert got == float(np.float32(0.6125 * mag))
    # order invariance: shuffled and partitioned sums agree bitwise
    vals = (rng.standard_normal(4096).astype(np.float32)
            * np.exp(rng.uniform(-8, 18, 4096)).astype(np.float32))
    a = jnp.asarray(vals.reshape(64, 64))
    s_ref = efp32_to_float(efp_sum32(a))
    perm = rng.permutation(4096)
    s_shuf = efp32_to_float(efp_sum32(jnp.asarray(
        vals[perm].reshape(128, 32))))
    assert s_ref == s_shuf
    # partitioned: limbs add exactly
    l1 = np.asarray(efp_sum32(a[:32]))
    l2 = np.asarray(efp_sum32(a[32:]))
    assert efp32_to_float(jnp.asarray(l1 + l2)) == s_ref
    # plain fp32 sums would NOT be order invariant at this spread
    # (sanity check that the test is non-trivial)
    p1 = np.float32(vals.sum(dtype=np.float32))
    p2 = np.float32(vals[perm].sum(dtype=np.float32))
    assert s_ref != 0.0
    # pre-scaling round-trips exactly
    s_sc = efp32_to_float(efp_sum32(a, scale_pow2=-24), scale_pow2=-24)
    big = jnp.asarray((vals * 1e12).reshape(64, 64))
    s_big = efp32_to_float(efp_sum32(big, scale_pow2=-24),
                           scale_pow2=-24)
    assert np.isfinite(s_big) and abs(s_big) > 0.0


def test_efp32_matches_exact_sum():
    """The reconstructed fp32-limb sum equals the exact (python) sum
    of the fp32 inputs."""
    import math
    from mom6_tpu.framework.efp import efp_sum32, efp32_to_float
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(1000).astype(np.float32) * 1e4
    got = efp32_to_float(efp_sum32(jnp.asarray(vals.reshape(10, 100))))
    exact = math.fsum(float(v) for v in vals)
    assert got == exact


def test_efp32_nan_poisons_result():
    """Non-finite inputs must surface as NaN, not silent int garbage
    (the stats path is the primary blow-up monitor)."""
    from mom6_tpu.framework.efp import efp_sum32, efp32_to_float
    x = jnp.asarray([[1.0, 2.0], [jnp.nan, 3.0]], jnp.float32)
    got = efp32_to_float(efp_sum32(x))
    assert np.isnan(got)
    got_inf = efp32_to_float(efp_sum32(
        jnp.asarray([[1.0, jnp.inf]], jnp.float32)))
    assert np.isnan(got_inf)


def test_efp32_layout_invariant_under_shard_map():
    """The int32 limb psum inside shard_map reproduces the 1-device
    sum bitwise for any layout (the fp32 analog of the x64 claim)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mom6_tpu.framework.efp import efp_sum32, efp32_to_float
    from mom6_tpu.parallel.domain import Domain, make_mesh, pad_field
    rng = np.random.default_rng(11)
    nj, ni = 16, 32
    vals = (rng.standard_normal((nj, ni))
            * np.exp(rng.uniform(-6, 16, (nj, ni)))).astype(np.float32)
    ref = efp32_to_float(efp_sum32(jnp.asarray(vals)))
    layout = (4, 2)
    d = Domain(ni=ni, nj=nj, halo=4, layout=layout,
               reentrant_x=True).sharded()
    mesh = make_mesh(layout)
    blocked = pad_field(d, jnp.asarray(vals))
    mask = pad_field(d, jnp.ones((nj, ni), jnp.float32))

    def local_sum(x, m):
        return efp_sum32(x, mask=m, axis_names=("y", "x"))[:, None]

    limbs = jax.jit(shard_map(
        local_sum, mesh=mesh, in_specs=(P("y", "x"), P("y", "x")),
        out_specs=P(None, "x")))(blocked, mask)
    got = efp32_to_float(limbs[:, 0])
    assert got == ref
