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
