import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.ale.remapping import (RemapCfg, remap_column_means,
                                    reconstruct, edge_values_h4,
                                    interface_positions)
from mom6_tpu.ale.regridding import RegridCfg, build_grid


def col(a):
    """1D column → (nk, 1, 1)."""
    return jnp.asarray(np.asarray(a, dtype=np.float64)).reshape(-1, 1, 1)


SCHEMES = ["PCM", "PLM", "PLM_HYBGEN", "PPM_H4", "PPM_IH4", "PPM_CW",
           "PPM_HYBGEN", "WENO_HYBGEN", "PQM_IH4IH3", "PQM_IH6IH5"]


@pytest.mark.parametrize("scheme", SCHEMES)
def test_uniform_field_exact(scheme):
    h_src = col([10, 20, 30, 25, 15])
    h_dst = col([20, 20, 20, 20, 20])
    u = col([3.3] * 5)
    got = remap_column_means(h_src, u, h_dst, RemapCfg(scheme=scheme))
    np.testing.assert_allclose(np.asarray(got).ravel(), 3.3, rtol=1e-13)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_conservation(scheme):
    rng = np.random.default_rng(0)
    h_src = col(rng.uniform(5, 30, 8))
    total = float(np.asarray(h_src).sum())
    frac = rng.uniform(0.5, 2.0, 8)
    h_dst = col(frac / frac.sum() * total)
    u = col(rng.standard_normal(8))
    got = remap_column_means(h_src, u, h_dst, RemapCfg(scheme=scheme))
    int_src = float(jnp.sum(h_src * u))
    int_dst = float(jnp.sum(h_dst * got))
    assert abs(int_dst - int_src) < 1e-12 * max(1.0, abs(int_src))


def test_plm_linear_profile_exact():
    """PLM reproduces a linear-in-z profile exactly on interior cells."""
    h_src = col([10.0] * 6)
    zc = np.asarray(interface_positions(h_src)).ravel()
    z_mid = 0.5 * (zc[:-1] + zc[1:])
    u = col(2.0 + 0.1 * z_mid)
    h_dst = col([5, 15, 10, 10, 12, 8])
    got = np.asarray(remap_column_means(h_src, u, h_dst,
                                        RemapCfg(scheme="PLM"))).ravel()
    zd = np.concatenate([[0], np.cumsum(np.asarray(h_dst).ravel())])
    zd_mid = 0.5 * (zd[:-1] + zd[1:])
    expect = 2.0 + 0.1 * zd_mid
    # dst cells fully inside interior src cells are exact; cells that
    # overlap the limiter-flattened boundary src cells are not
    np.testing.assert_allclose(got[2:-2], expect[2:-2], rtol=1e-12)


def test_ppm_smooth_convergence():
    """PPM_H4 interior error on a smooth profile converges at high
    order under grid refinement."""
    def err(nk):
        H = 160.0
        dz = H / nk
        h_src = col([dz] * nk)
        zc = (np.arange(nk) + 0.5) * dz
        F = lambda z: -60.0 * np.cos(z / 60.0)
        # exact cell means as input
        zs = np.arange(nk + 1) * dz
        u = col((F(zs[1:]) - F(zs[:-1])) / dz)
        h_dst = col([0.8 * dz] * (nk // 2) + [1.2 * dz] * (nk // 2))
        # unlimited: the monotone limiter is 1st-order at smooth extrema
        got = np.asarray(remap_column_means(
            h_src, u, h_dst,
            RemapCfg(scheme="PPM_H4", force_monotonic=False))).ravel()
        zd = np.concatenate([[0], np.cumsum(np.asarray(h_dst).ravel())])
        expect = (F(zd[1:]) - F(zd[:-1])) / np.diff(zd)
        q = nk // 8
        return np.max(np.abs(got[q:-q] - expect[q:-q]))

    e16, e32 = err(16), err(32)
    assert e32 < e16 / 4.0, f"no high-order convergence: {e16} → {e32}"
    assert e32 < 5e-4


def test_identity_remap_bitwise_mean():
    rng = np.random.default_rng(1)
    h = col(rng.uniform(5, 30, 7))
    u = col(rng.standard_normal(7))
    got = remap_column_means(h, u, h, RemapCfg(scheme="PPM_H4"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(u), atol=1e-12)


@pytest.mark.parametrize("scheme", ["PPM_H4", "PPM_IH4", "PLM_HYBGEN",
                                    "WENO_HYBGEN", "PQM_IH4IH3"])
def test_monotone_no_overshoot(scheme):
    h_src = col([10.0] * 6)
    u = col([1, 1, 1, 5, 5, 5])
    h_dst = col([7, 13, 9, 11, 12, 8])
    got = np.asarray(remap_column_means(
        h_src, u, h_dst, RemapCfg(scheme=scheme))).ravel()
    assert got.min() >= 1.0 - 1e-12
    assert got.max() <= 5.0 + 1e-12


def test_h4_nonuniform_cubic_exact():
    """The non-uniform explicit h4 edges reproduce a cubic profile's
    interface point values exactly (4th-order exactness,
    edge_values_explicit_h4) — including the boundary closures."""
    rng = np.random.default_rng(3)
    h = rng.uniform(5.0, 40.0, 9)
    zi = np.concatenate([[0.0], np.cumsum(h)])

    def P(z):                      # a cubic
        return 2.0 + 0.3 * z - 0.002 * z ** 2 + 1.5e-5 * z ** 3

    def Pint(z):                   # its antiderivative
        return (2.0 * z + 0.15 * z ** 2 - 0.002 / 3 * z ** 3
                + 1.5e-5 / 4 * z ** 4)

    means = (Pint(zi[1:]) - Pint(zi[:-1])) / h
    e = np.asarray(edge_values_h4(col(h), col(means))).ravel()
    np.testing.assert_allclose(e, P(zi), rtol=1e-10)


def test_ih4_nonuniform_cubic_exact():
    from mom6_tpu.ale.remapping import edge_values_ih4
    rng = np.random.default_rng(5)
    h = rng.uniform(5.0, 40.0, 12)
    zi = np.concatenate([[0.0], np.cumsum(h)])

    def P(z):
        return -1.0 + 0.1 * z + 0.004 * z ** 2 - 2e-5 * z ** 3

    def Pint(z):
        return (-z + 0.05 * z ** 2 + 0.004 / 3 * z ** 3
                - 0.5e-5 * z ** 4)

    means = (Pint(zi[1:]) - Pint(zi[:-1])) / h
    e = np.asarray(edge_values_ih4(col(h), col(means))).ravel()
    np.testing.assert_allclose(e, P(zi), rtol=1e-9)


def test_weno_hybgen_mean_preserving():
    """The WENO parabola integrates back to the cell mean."""
    rng = np.random.default_rng(7)
    h = col(rng.uniform(2.0, 30.0, 8))
    u = col(np.cumsum(rng.standard_normal(8)))
    rec = reconstruct(h, u, RemapCfg(scheme="WENO_HYBGEN"))
    np.testing.assert_allclose(np.asarray(rec.cell_mean()),
                               np.asarray(u), rtol=1e-12)


def test_vanished_layers():
    h_src = col([10, 0, 0, 10, 10, 0])
    u = col([1.0, 2.0, 2.0, 3.0, 4.0, 4.0])
    h_dst = col([5, 5, 5, 5, 5, 5])
    got = np.asarray(remap_column_means(
        h_src, u, h_dst, RemapCfg(scheme="PLM"))).ravel()
    assert np.all(np.isfinite(got))
    int_src = float(np.sum(np.asarray(h_src).ravel()
                           * np.asarray(u).ravel()))
    assert abs(np.sum(got * 5.0) - int_src) < 1e-10


# ---- regridding ----

def test_sigma_grid():
    h = col([10, 30, 20, 40.0])
    bathy = jnp.full((1, 1), 100.0)
    h_new = build_grid(RegridCfg(mode="SIGMA"), h, bathy)
    np.testing.assert_allclose(np.asarray(h_new).ravel(), 25.0, rtol=1e-12)


def test_zstar_grid_total_preserved():
    rng = np.random.default_rng(2)
    nk, nj, ni = 5, 4, 6
    h = jnp.asarray(rng.uniform(10, 50, (nk, nj, ni)))
    bathy = jnp.sum(h, axis=0) - 0.5   # eta = +0.5 everywhere
    h_new = build_grid(RegridCfg(mode="Z*"), h, bathy)
    np.testing.assert_allclose(np.asarray(jnp.sum(h_new, 0)),
                               np.asarray(jnp.sum(h, 0)), rtol=1e-12)
    assert float(jnp.min(h_new)) > 0.0


def test_zstar_with_resolution_list():
    h = col([25.0] * 4)
    bathy = jnp.full((1, 1), 100.0)
    h_new = build_grid(RegridCfg(mode="Z*", resolution=(10, 20, 30, 40)),
                       h, bathy)
    np.testing.assert_allclose(np.asarray(h_new).ravel(),
                               [10, 20, 30, 40], rtol=1e-12)


def test_rho_grid_layered_column():
    """RHO mode on a stably stratified column puts interfaces at the
    target density crossings."""
    from mom6_tpu.eos import LinearEOS
    nk = 4
    h = col([25.0] * nk)
    bathy = jnp.full((1, 1), 100.0)
    # T decreasing downward → rho increasing with depth
    T = col([20.0, 15.0, 10.0, 5.0])
    S = col([35.0] * nk)
    eos = LinearEOS(rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8)
    rho_mid = np.asarray(eos.density(T, S, jnp.zeros_like(T))).ravel()
    rlay = jnp.asarray(rho_mid)    # targets == current densities
    h_new = build_grid(RegridCfg(mode="RHO"), h, bathy, T, S, eos,
                       rlay=rlay)
    # with targets equal to the current layer densities, the grid should
    # stay close to the current one
    np.testing.assert_allclose(np.asarray(jnp.sum(h_new, 0)).ravel(),
                               100.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(h_new).ravel(),
                               [25.0] * nk, atol=1.0)


def test_pqm_higher_order_than_ppm():
    """PQM (quartic) beats PPM on a smooth profile under refinement."""
    def err(scheme, nk):
        H = 160.0
        dz = H / nk
        h_src = col([dz] * nk)
        F = lambda z: -60.0 * np.cos(z / 60.0)
        zs = np.arange(nk + 1) * dz
        u = col((F(zs[1:]) - F(zs[:-1])) / dz)
        h_dst = col([0.8 * dz] * (nk // 2) + [1.2 * dz] * (nk // 2))
        got = np.asarray(remap_column_means(
            h_src, u, h_dst,
            RemapCfg(scheme=scheme, force_monotonic=False))).ravel()
        zd = np.concatenate([[0], np.cumsum(np.asarray(h_dst).ravel())])
        expect = (F(zd[1:]) - F(zd[:-1])) / np.diff(zd)
        q = nk // 4
        return np.max(np.abs(got[q:-q] - expect[q:-q]))

    e_ppm = err("PPM_H4", 32)
    e_pqm = err("PQM_IH4IH3", 32)
    assert e_pqm < e_ppm
    # conservation also holds for the quartic
    h_src = col([10.0] * 8)
    u = col(np.sin(np.arange(8)))
    h_dst = col([5.0] * 4 + [15.0] * 4)
    got = remap_column_means(h_src, u, h_dst,
                             RemapCfg(scheme="PQM_IH4IH3"))
    assert abs(float(jnp.sum(got * h_dst)) -
               float(jnp.sum(u * h_src))) < 1e-10


def test_hycom1_hybrid_mode():
    """HyCOM mode: z-levels near the surface, isopycnal interfaces in
    the stratified interior."""
    from mom6_tpu.eos import LinearEOS
    eos = LinearEOS(rho_t0_s0=1000.0, drho_dt=-0.2, drho_ds=0.8)
    nk = 6
    h = col([50.0] * nk)
    bathy = jnp.full((1, 1), 300.0)
    T = col([20., 19.5, 12., 8., 6., 5.])
    S = col([35.0] * nk)
    p0 = jnp.zeros_like(T)
    rho_mid = np.asarray(eos.density(T, S, p0)).ravel()
    rlay = jnp.asarray(rho_mid)
    h_new = build_grid(RegridCfg(mode="HYCOM1",
                                 resolution=(10., 20., 40., 70., 80.,
                                             80.)),
                       h, bathy, T, S, eos, rlay=rlay)
    hv = np.asarray(h_new).ravel()
    # totals preserved, all positive
    np.testing.assert_allclose(hv.sum(), 300.0, rtol=1e-12)
    assert hv.min() > 0.0
    # surface layer pinned at/above nominal z-coordinate thickness:
    # interfaces cannot rise above nominal depths
    z = np.concatenate([[0], np.cumsum(hv)])
    z_nom = np.concatenate([[0], np.cumsum([10., 20., 40., 70., 80.,
                                            80.])])
    assert np.all(z[1:-1] >= z_nom[1:-1] - 1e-9)


def test_ih6_ih5_quintic_exact_nonuniform():
    """edge_values_ih6 / edge_slopes_ih5 reproduce a degree-5
    polynomial exactly (to roundoff) on a random nonuniform grid
    (White & Adcroft 2009 Eqs. 48-50 / 52-54, the
    edge_values_implicit_h6 / edge_slopes_implicit_h5 systems)."""
    from mom6_tpu.ale.remapping import (edge_values_ih6,
                                        edge_slopes_ih5,
                                        edge_slopes_ih3)
    rng = np.random.default_rng(3)
    nk = 12
    h = rng.uniform(0.5, 2.0, nk)
    x = np.concatenate([[0.0], np.cumsum(h)])
    c = np.array([0.3, -1.2, 0.7, 0.5, -0.08, 0.02])

    def p(z):
        return sum(cj * z ** j for j, cj in enumerate(c))

    def P(z):
        return sum(cj * z ** (j + 1) / (j + 1)
                   for j, cj in enumerate(c))

    def dp(z):
        return sum(j * cj * z ** (j - 1)
                   for j, cj in enumerate(c) if j > 0)

    ubar = (P(x[1:]) - P(x[:-1])) / h
    H = col(h)
    U = col(ubar)
    ev = np.asarray(edge_values_ih6(H, U)).ravel()
    es = np.asarray(edge_slopes_ih5(H, U)).ravel()
    np.testing.assert_allclose(ev, p(x), rtol=0, atol=1e-9)
    np.testing.assert_allclose(es, dp(x), rtol=0, atol=1e-9)
    # ih3 slopes are exact for cubics
    c3 = c[:4]

    def P3(z):
        return sum(cj * z ** (j + 1) / (j + 1)
                   for j, cj in enumerate(c3))

    def dp3(z):
        return sum(j * cj * z ** (j - 1)
                   for j, cj in enumerate(c3) if j > 0)

    ub3 = (P3(x[1:]) - P3(x[:-1])) / h
    es3 = np.asarray(edge_slopes_ih3(H, col(ub3))).ravel()
    np.testing.assert_allclose(es3, dp3(x), rtol=0, atol=1e-10)


def test_pqm_ih6ih5_beats_ih4ih3():
    """The 6th/5th-order implicit pairing out-converges the 4th/3rd
    pairing on a smooth profile."""
    def err(scheme, nk):
        H = 160.0
        dz = H / nk
        h_src = col([dz] * nk)
        F = lambda z: -60.0 * np.cos(z / 60.0)
        zs = np.arange(nk + 1) * dz
        u = col((F(zs[1:]) - F(zs[:-1])) / dz)
        h_dst = col([0.8 * dz] * (nk // 2) + [1.2 * dz] * (nk // 2))
        got = np.asarray(remap_column_means(
            h_src, u, h_dst,
            RemapCfg(scheme=scheme, force_monotonic=False))).ravel()
        zd = np.concatenate([[0], np.cumsum(np.asarray(h_dst).ravel())])
        expect = (F(zd[1:]) - F(zd[:-1])) / np.diff(zd)
        q = nk // 4
        return np.max(np.abs(got[q:-q] - expect[q:-q]))

    assert err("PQM_IH6IH5", 32) < 0.5 * err("PQM_IH4IH3", 32)


def test_banded_remap_matches_full_bitwise():
    """remap_column_means_banded == full remap bitwise whenever the
    dst interfaces stay within `band` source cells (the per-step ALE
    regime), including batched field axes and vanished target cells."""
    from mom6_tpu.ale.remapping import remap_column_means_banded
    rng = np.random.default_rng(7)
    nk, nj, ni = 12, 4, 5
    h_src = jnp.asarray(10.0 + rng.random((nk, nj, ni)))
    # dst: same column totals, interfaces perturbed < one layer
    w = jnp.asarray(rng.random((nk, nj, ni)) + 0.5)
    h_dst = w / w.sum(0, keepdims=True) * h_src.sum(0, keepdims=True)
    for scheme in ("PCM", "PLM", "PPM_H4", "PQM_IH4IH3"):
        cfg = RemapCfg(scheme=scheme)
        u = jnp.asarray(rng.standard_normal((nk, nj, ni)))
        full = remap_column_means(h_src, u, h_dst, cfg)
        band = remap_column_means_banded(h_src, u, h_dst, 3, cfg)
        np.testing.assert_array_equal(np.asarray(band),
                                      np.asarray(full),
                                      err_msg=scheme)
    # batched field axis
    u2 = jnp.asarray(rng.standard_normal((nk, 3, nj, ni)))
    full = remap_column_means(h_src[:, None], u2, h_dst[:, None])
    band = remap_column_means_banded(h_src[:, None], u2,
                                     h_dst[:, None], 3)
    np.testing.assert_array_equal(np.asarray(band), np.asarray(full))


def test_banded_remap_fallback_on_violation():
    """A dst grid far outside the band (all mass in the last cells)
    must fall back to the full pair space and stay exact."""
    from mom6_tpu.ale.remapping import remap_column_means_banded
    rng = np.random.default_rng(3)
    nk = 16
    h_src = col([5.0] * nk)
    u = col(rng.standard_normal(nk))
    # nearly all the column in the FIRST dst cell: interface 1 sits
    # |k-m| ~ nk away from its containing source cell
    h_dst = col([5.0 * nk - 0.5] + [0.5 / (nk - 1)] * (nk - 1))
    full = remap_column_means(h_src, u, h_dst)
    band = remap_column_means_banded(h_src, u, h_dst, 2)
    # same algorithm, but the cond branch may fuse differently: ulp
    np.testing.assert_allclose(np.asarray(band), np.asarray(full),
                               rtol=1e-14, atol=1e-15)
    # conservation either way
    tot_f = float((np.asarray(full).ravel()
                   * np.asarray(h_dst).ravel()).sum())
    tot_s = float((np.asarray(u).ravel()
                   * np.asarray(h_src).ravel()).sum())
    np.testing.assert_allclose(tot_f, tot_s, rtol=1e-12)
