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


def _bbl_setup(f0=0.0, rlay=None, u0=0.3, nk=4):
    """Small flat-bottom grid + uniform flow for BBL coupling tests."""
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vertical_grid import VerticalGrid
    d = Domain(ni=8, nj=4, halo=4)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=40.0, f0=f0)
    if rlay is None:
        rlay = np.full(nk, 1035.0)
    vg = VerticalGrid.from_rlay(np.asarray(rlay, np.float64))
    h = jnp.full((nk, 12, 16), 25.0)
    u = jnp.full_like(h, u0)
    v = jnp.zeros_like(h)
    return d, g, vg, h, u, v


def test_dynamic_bbl_rotational_limit():
    """Unstratified column: the BBL thickness is the rotational
    (Ekman) limit u*/(2f), so the drag-law viscosity kv_bbl =
    sqrt(cdrag)*u**2/(2f) and the piston velocity stays
    sqrt(cdrag)*u*.  set_viscous_BBL, MOM_set_viscosity.F90:832-845."""
    from mom6_tpu.core.vert_friction import VertViscCfg, vertvisc_coef
    f0 = 1e-4
    cfg = VertViscCfg(kv=0.0, cdrag=0.0025, hbbl=10.0)
    d, g, vg, h, u, v = _bbl_setup(f0=f0)
    co = vertvisc_coef(g, u, v, h, cfg=cfg, vgrid=vg)
    ja, ia = 6, 8
    ustar = np.sqrt(cfg.cdrag) * 0.3
    # total depth 100 m >> u*/2f = 75 m?  u* = 0.015, u*/2f = 75 m —
    # rotational-limited well below the 100 m water depth
    piston = float(np.asarray(co.a_u)[-1, ja, ia])
    # h_N caps at the water depth (100 m); rotation then thins it to
    # h_bbl = h_N/(1/2+sqrt(1/4+(2 f h_N/u*)^2)) ≈ u*/2f = 75 m
    hn = 100.0
    root = np.sqrt(0.25 * ustar**2 + (2 * f0 * hn) ** 2)
    hbbl_expect = hn * ustar / (0.5 * ustar + root)
    kv_bbl = np.sqrt(cfg.cdrag) * ustar * hbbl_expect
    np.testing.assert_allclose(piston, kv_bbl / hbbl_expect, rtol=1e-5)


def test_dynamic_bbl_stratification_thins_bbl():
    """Strong near-bottom stratification caps the BBL at the KW99
    height, slaving fewer interfaces to the drag than a weakly
    stratified column (MOM_set_viscosity.F90:761)."""
    from mom6_tpu.core.vert_friction import VertViscCfg, vertvisc_coef
    cfg = VertViscCfg(kv=1e-6, cdrag=0.0025, hbbl=10.0)
    # strong g' ladder: Δρ = 2 kg/m3 per interface
    rlay_strong = 1030.0 + 2.0 * np.arange(4)
    d, g, vg_s, h, u, v = _bbl_setup(f0=0.0, rlay=rlay_strong, u0=0.05)
    co_s = vertvisc_coef(g, u, v, h, cfg=cfg, vgrid=vg_s)
    _, _, vg_w, _, _, _ = _bbl_setup(f0=0.0)
    co_w = vertvisc_coef(g, u, v, h, cfg=cfg, vgrid=vg_w)
    ja, ia = 6, 8
    a_s = np.asarray(co_s.a_u)[:, ja, ia]
    a_w = np.asarray(co_w.a_u)[:, ja, ia]
    # unstratified/f=0 column: BBL fills the water column, every
    # interior interface is slaved to the drag piston
    # drag-law piston sqrt(cdrag)*u* (a_bot adds kv/(h/2+hbbl/2) on top)
    piston = np.sqrt(cfg.cdrag) * np.sqrt(cfg.cdrag) * 0.05
    assert np.all(a_w[1:-1] >= piston - 1e-12)
    # strongly stratified: the BBL fills the (unstratified) bottom
    # layer plus 400u*²/g' ≈ 0.13 m past its top interface, so the
    # deepest interior interface is slaved but those at 50/75 m stay
    # at background kv
    assert a_s[-2] >= piston - 1e-12
    assert np.all(a_s[1:-2] < 1e-3 * piston)
    # bottom coupling itself stays drag-law in both
    assert a_s[-1] > 0.0


def test_dynamic_bbl_off_matches_fixed_hbbl():
    """DYNAMIC_BBL=False (or a missing vgrid) reproduces the fixed
    HBBL drag-law piston."""
    import dataclasses as _dc
    from mom6_tpu.core.vert_friction import VertViscCfg, vertvisc_coef
    cfg = VertViscCfg(kv=1e-5, cdrag=0.0025, hbbl=10.0)
    d, g, vg, h, u, v = _bbl_setup(f0=1e-4)
    co_off = vertvisc_coef(g, u, v, h,
                           cfg=_dc.replace(cfg, dynamic_bbl=False),
                           vgrid=vg)
    co_none = vertvisc_coef(g, u, v, h, cfg=cfg, vgrid=None)
    np.testing.assert_array_equal(np.asarray(co_off.a_u),
                                  np.asarray(co_none.a_u))
    np.testing.assert_array_equal(np.asarray(co_off.a_v),
                                  np.asarray(co_none.a_v))


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


def test_viscous_ml_coupling_floor():
    """The surface viscous-ML floor (set_viscous_ML + the LOTW
    coupling of MOM_vert_friction.F90:2190) raises the near-surface
    interface coupling under wind and transfers momentum deeper."""
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vert_friction import (VertViscCfg,
                                             vertvisc_coef,
                                             surface_ustar)
    from mom6_tpu.core.forcing import MechForcing
    d = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=80.0, f0=1e-4,
                       max_depth=1000.0)
    nk = 10
    h = d.fill_halos(d.pad(jnp.full((nk, 8, 8), 100.0)))
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    taux = d.fill_halos(d.pad(jnp.full((8, 8), 0.2))) * g.mask2dCu
    forces = MechForcing(taux=taux)
    ustar = surface_ustar(g, 1035.0, forces)
    assert float(jnp.max(ustar)) > 0.01
    base = VertViscCfg(kv=1e-5, bottomdraglaw=False)
    ml = VertViscCfg(kv=1e-5, bottomdraglaw=False,
                     visc_ml_mode="fixed", hmix_fixed=250.0)
    c0 = vertvisc_coef(g, u, v, h, cfg=base, ustar=ustar)
    c1 = vertvisc_coef(g, u, v, h, cfg=ml, ustar=ustar)
    import numpy as np
    a0 = np.asarray(d.interior(c0.a_u))
    a1 = np.asarray(d.interior(c1.a_u))
    # enhanced within the 250 m ML (interfaces 1..2), unchanged below
    assert np.all(a1[1:3] > a0[1:3] * 10.0)
    np.testing.assert_allclose(a1[4:], a0[4:], rtol=1e-12)
    # dynamic mode scales the depth with ustar/f
    dyn = VertViscCfg(kv=1e-5, bottomdraglaw=False,
                      visc_ml_mode="dynamic", ml_ekman_coeff=0.5)
    c2 = vertvisc_coef(g, u, v, h, cfg=dyn, ustar=ustar)
    a2 = np.asarray(d.interior(c2.a_u))
    # ustar ~ 0.014, f = 1e-4 → h_ml ~ 69 m: only interface 1 raised?
    # z_t(K=1)=100 > h_ml → nothing raised; widen with bigger coeff
    dyn2 = VertViscCfg(kv=1e-5, bottomdraglaw=False,
                       visc_ml_mode="dynamic", ml_ekman_coeff=3.0)
    c3 = vertvisc_coef(g, u, v, h, cfg=dyn2, ustar=ustar)
    a3 = np.asarray(d.interior(c3.a_u))
    assert np.all(a3[1:3] >= a2[1:3])
    assert np.any(a3[1:3] > a0[1:3] * 10.0)
