import numpy as np
import jax.numpy as jnp

from mom6_tpu.core.vert_friction import implicit_visc_solve


def dense_solve(u, h, a, dt, ray=None, stress=0.0):
    """Reference dense solve of (h + dt*L) u' = h u + stress e1."""
    nk = len(u)
    if ray is None:
        ray = np.zeros(nk)
    A = np.zeros((nk, nk))
    rhs = h * u
    rhs[0] += stress
    for k in range(nk):
        A[k, k] = h[k] + dt * (ray[k] + a[k] + a[k + 1])
        if k > 0:
            A[k, k - 1] = -dt * a[k]
        if k < nk - 1:
            A[k, k + 1] = -dt * a[k + 1]
    return np.linalg.solve(A, rhs)


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    nk = 8
    for trial in range(5):
        h = rng.uniform(1.0, 50.0, nk)
        u = rng.standard_normal(nk)
        a = np.zeros(nk + 1)
        a[1:-1] = rng.uniform(0.0, 1e-2, nk - 1)
        a[-1] = rng.uniform(0.0, 1e-2)
        ray = rng.uniform(0.0, 1e-3, nk)
        dt = 3600.0
        expect = dense_solve(u.copy(), h, a, dt, ray)
        got = implicit_visc_solve(
            jnp.asarray(u).reshape(nk, 1, 1),
            jnp.asarray(h).reshape(nk, 1, 1),
            jnp.asarray(a).reshape(nk + 1, 1, 1), dt,
            ray=jnp.asarray(ray).reshape(nk, 1, 1))
        np.testing.assert_allclose(np.asarray(got).ravel(), expect,
                                   rtol=1e-12)


def test_momentum_conservation_no_drag():
    """With no bottom drag/Rayleigh, the solve redistributes momentum
    but conserves sum(h*u)."""
    rng = np.random.default_rng(1)
    nk = 6
    h = rng.uniform(5.0, 50.0, nk)
    u = rng.standard_normal(nk)
    a = np.zeros(nk + 1)
    a[1:-1] = rng.uniform(0.0, 1e-2, nk - 1)   # a[0]=a[-1]=0: free-slip
    got = implicit_visc_solve(
        jnp.asarray(u).reshape(nk, 1, 1),
        jnp.asarray(h).reshape(nk, 1, 1),
        jnp.asarray(a).reshape(nk + 1, 1, 1), 3600.0)
    mom0 = float(np.sum(h * u))
    mom1 = float(np.sum(h * np.asarray(got).ravel()))
    assert abs(mom1 - mom0) < 1e-10 * abs(mom0)


def test_strong_mixing_homogenizes():
    nk = 4
    h = np.full(nk, 10.0)
    u = np.array([1.0, 0.0, 0.0, -1.0])
    a = np.zeros(nk + 1)
    a[1:-1] = 1e3   # huge coupling
    got = np.asarray(implicit_visc_solve(
        jnp.asarray(u).reshape(nk, 1, 1),
        jnp.asarray(h).reshape(nk, 1, 1),
        jnp.asarray(a).reshape(nk + 1, 1, 1), 3600.0)).ravel()
    np.testing.assert_allclose(got, np.mean(u), atol=1e-4)


def test_surface_stress_accelerates():
    nk = 3
    h = np.full(nk, 10.0)
    u = np.zeros(nk)
    a = np.zeros(nk + 1)
    got = np.asarray(implicit_visc_solve(
        jnp.asarray(u).reshape(nk, 1, 1),
        jnp.asarray(h).reshape(nk, 1, 1),
        jnp.asarray(a).reshape(nk + 1, 1, 1), 3600.0,
        rhs_extra=jnp.full((1, 1), 0.36))).ravel()
    # du = stress/h in top layer only (no coupling)
    np.testing.assert_allclose(got, [0.036, 0.0, 0.0], atol=1e-14)


def test_channel_drag_slows_flow_along_topography():
    """With CHANNEL_DRAG, the part of a column deeper than the shallow
    side of a face feels Rayleigh drag; a flat bottom feels none."""
    import dataclasses as _dc
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vert_friction import (VertViscCfg, vertvisc_coef,
                                             vertvisc, vertvisc_remnant)
    d = Domain(ni=8, nj=4, halo=4)

    def stepped(lon, lat):
        return np.where(lon < 40.0, 1000.0, 200.0)

    g_step = cartesian_grid(d, lenlon_km=80.0, lenlat_km=40.0,
                            depth_fn=stepped, max_depth=1000.0)
    g_flat = cartesian_grid(d, lenlon_km=80.0, lenlat_km=40.0)
    nk = 4
    h = jnp.full((nk, 12, 16), 250.0)
    u = jnp.full_like(h, 0.3)
    v = jnp.zeros_like(h)
    cfg = VertViscCfg(kv=1e-5, cdrag=0.01, channel_drag=True)
    cfg_off = _dc.replace(cfg, channel_drag=False)
    dt = 36000.0

    co = vertvisc_coef(g_step, u, v, h, cfg=cfg)
    u_on, _ = vertvisc(g_step, u, v, h, co, dt)
    co_off = vertvisc_coef(g_step, u, v, h, cfg=cfg_off)
    u_off, _ = vertvisc(g_step, u, v, h, co_off, dt)
    # at the step face the deep layers are slowed vs channel_drag off
    ja, ia = 6, 8                # face between deep and shallow columns
    assert float(u_on[3, ja, ia]) < float(u_off[3, ja, ia]) - 1e-4
    # top layer (above the shallow bottom) barely affected
    assert abs(float(u_on[0, ja, ia]) - float(u_off[0, ja, ia])) < 1e-3
    # flat bottom: ray is zero → identical solutions
    cf = vertvisc_coef(g_flat, u, v, h, cfg=cfg)
    cf_off = vertvisc_coef(g_flat, u, v, h, cfg=cfg_off)
    uf_on, _ = vertvisc(g_flat, u, v, h, cf, dt)
    uf_off, _ = vertvisc(g_flat, u, v, h, cf_off, dt)
    np.testing.assert_array_equal(np.asarray(uf_on), np.asarray(uf_off))
    # visc_rem includes the channel drag (smaller remnant at depth)
    rem_on, _ = vertvisc_remnant(g_step, co, dt)
    rem_off, _ = vertvisc_remnant(g_step, co_off, dt)
    assert float(rem_on[3, ja, ia]) < float(rem_off[3, ja, ia])
