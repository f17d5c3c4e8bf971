"""The fused Pallas barotropic subcycle must reproduce the reference
jnp fori_loop path exactly (same math, same fill semantics), for both
the linearized and the BT_cont face-area-curve transports.

Runs the Pallas kernel through its interpreter on CPU (the compiled
path is exercised on the real chip by bench.py).  When the padded
x extent is already 128-aligned both paths execute the identical
operation sequence and the comparison is near-bitwise; with an
unaligned extent the kernel zero-pads the lane axis, XLA:CPU then
vectorizes/FMA-contracts the two layouts differently, and isolated
find_uhbt branch flips give ~1e-5-relative isolated diffs, so that
case gets a looser gate (the padding must still never leak into the
interior — ring-4 halo columns are excluded from the check).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.barotropic import BarotropicCfg, btstep, set_dtbt
from mom6_tpu.core.continuity_ppm import ContinuityCfg, set_up_bt_cont


@pytest.mark.parametrize("curve", [False, True])
@pytest.mark.parametrize("ni", [32, 120])
def test_pallas_subcycle_matches_fori_loop(ni, curve, monkeypatch):
    nj, nk = 24, 3
    # even at lane-aligned extents the two paths are only close, not
    # bitwise: isolated find_uhbt branch flips near the piecewise
    # cubic/linear region boundaries give ~1e-5-relative diffs in the
    # accumulated transports (fp32, ~30 substeps)
    tol = 5e-5
    import jax
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
               reentrant_y=False)
    g = cartesian_grid(d, lenlon_km=320.0, lenlat_km=240.0, f0=1e-4,
                       max_depth=900.0)
    # fp32 throughout (the TPU-native precision the kernel targets);
    # the test env enables x64, so cast the metric fields down
    g = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and a.dtype == jnp.float64 else a, g)
    vg = VerticalGrid.uniform(nk=nk)
    vg = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and a.dtype == jnp.float64 else a, vg)
    rng = np.random.default_rng(5)
    f32 = jnp.float32
    shape = (nk, d.njh, d.nih)
    h = d.fill_halos(d.pad(jnp.asarray(
        rng.uniform(250.0, 350.0, (nk, nj, ni)), f32)))
    u = d.fill_halos(d.pad(jnp.asarray(
        0.05 * rng.standard_normal((nk, nj, ni)), f32)))
    v = d.fill_halos(d.pad(jnp.asarray(
        0.05 * rng.standard_normal((nk, nj, ni)), f32)))
    eta = d.fill_halos(d.pad(jnp.asarray(
        0.05 * rng.standard_normal((nj, ni)), f32)))
    acc = d.fill_halos(d.pad(jnp.asarray(
        1e-6 * rng.standard_normal((nk, nj, ni)), f32)))
    pbce = jnp.full(shape, 9.8 / nk, f32)
    ecor = d.fill_halos(d.pad(jnp.asarray(
        0.01 * rng.standard_normal((nj, ni)), f32)))
    nstep = set_dtbt(d, g, vg, BarotropicCfg(), 600.0)
    bc = set_up_bt_cont(g, vg, u, v, h, 600.0, ContinuityCfg()) \
        if curve else None
    uh0 = jnp.sum(h * 0.01, 0) if curve else None
    vh0 = jnp.sum(h * 0.005, 0) if curve else None

    results = {}
    for use_p in (False, True):
        if use_p:
            monkeypatch.setenv("MOM6_PALLAS_INTERPRET", "1")
        else:
            monkeypatch.delenv("MOM6_PALLAS_INTERPRET", raising=False)
        cfg = BarotropicCfg(nstep=nstep, use_bt_cont=curve,
                            use_pallas=use_p)
        results[use_p] = btstep(
            d, g, vg, u, v, eta, h, acc, acc, pbce, u, v, 600.0, cfg,
            bt_cont=bc, eta_cor=ecor, uhbt_in=uh0, vhbt_in=vh0)

    H = d.halo
    sl = (slice(H, H + nj), slice(H, H + ni))
    for f in ("eta", "uhbtav", "vhbtav", "ubt_av", "vbt_av"):
        a = np.asarray(getattr(results[False], f))[sl]
        b = np.asarray(getattr(results[True], f))[sl]
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < tol, f
    for f in ("accel_layer_u", "accel_layer_v"):
        a = np.asarray(getattr(results[False], f))[:, sl[0], sl[1]]
        b = np.asarray(getattr(results[True], f))[:, sl[0], sl[1]]
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < tol, f


@pytest.mark.parametrize("period", [2, 4])
@pytest.mark.parametrize("reentrant_y", [False, True])
def test_pallas_march_matches_jnp_march(period, reentrant_y,
                                        monkeypatch):
    """Wide-halo march mode: the fused kernel runs each chunk with no
    edge fixing on the widened arrays and the caller exchanges the
    wide halos between chunks — so it must reproduce the jnp
    comm-avoiding loop on configurations the single-device kernel
    cannot serve (reentrant y included)."""
    import jax
    ni, nj, nk = 32, 24, 3
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
               reentrant_y=reentrant_y)
    g = cartesian_grid(d, lenlon_km=320.0, lenlat_km=240.0, f0=1e-4,
                       max_depth=900.0)
    g = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and a.dtype == jnp.float64 else a, g)
    vg = VerticalGrid.uniform(nk=nk)
    vg = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and a.dtype == jnp.float64 else a, vg)
    rng = np.random.default_rng(9)
    f32 = jnp.float32
    pad = lambda a: d.fill_halos(d.pad(jnp.asarray(a, f32)))
    h = pad(rng.uniform(250.0, 350.0, (nk, nj, ni)))
    u = pad(0.05 * rng.standard_normal((nk, nj, ni)))
    v = pad(0.05 * rng.standard_normal((nk, nj, ni)))
    eta = pad(0.05 * rng.standard_normal((nj, ni)))
    acc = pad(1e-6 * rng.standard_normal((nk, nj, ni)))
    pbce = jnp.full((nk, d.njh, d.nih), 9.8 / nk, f32)
    ecor = pad(0.01 * rng.standard_normal((nj, ni)))
    nstep = set_dtbt(d, g, vg, BarotropicCfg(), 600.0)

    results = {}
    for use_p in (False, True):
        if use_p:
            monkeypatch.setenv("MOM6_PALLAS_INTERPRET", "1")
        else:
            monkeypatch.delenv("MOM6_PALLAS_INTERPRET", raising=False)
        cfg = BarotropicCfg(nstep=nstep, use_bt_cont=False,
                            use_pallas=use_p,
                            wide_halo_period=period)
        results[use_p] = btstep(
            d, g, vg, u, v, eta, h, acc, acc, pbce, u, v, 600.0, cfg,
            eta_cor=ecor)

    H = d.halo
    sl = (slice(H, H + nj), slice(H, H + ni))
    for f in ("eta", "uhbtav", "vhbtav", "ubt_av", "vbt_av"):
        a = np.asarray(getattr(results[False], f))[sl]
        b = np.asarray(getattr(results[True], f))[sl]
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 5e-5, f
