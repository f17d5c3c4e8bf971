import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.tracer.advect import TracerAdvectCfg, advect_tracers
from mom6_tpu.tracer.vertdiff import tracer_vertdiff
from mom6_tpu.tracer.registry import TracerRegistry, TracerMeta


def setup(ni=32, nj=8):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=ni * 10.0, lenlat_km=nj * 10.0)
    return d, g


def test_uniform_tracer_stays_uniform():
    d, g = setup()
    rng = np.random.default_rng(0)
    h = d.fill_halos(d.pad(jnp.asarray(rng.uniform(50, 150, (2, 8, 32)))))
    area = g.areaT
    uhtr = d.fill_halos(d.pad(jnp.asarray(
        1e7 * rng.standard_normal((2, 8, 32)))))
    vhtr = d.fill_halos(d.pad(jnp.asarray(
        1e7 * rng.standard_normal((2, 8, 32)))))
    T = jnp.full_like(h, 7.5)
    ts, h_end, _ = advect_tracers(d, g, {"T": T}, h, uhtr, vhtr)
    np.testing.assert_allclose(np.asarray(d.interior(ts["T"])), 7.5,
                               rtol=1e-12)


def test_tracer_conservation():
    d, g = setup()
    rng = np.random.default_rng(1)
    h = d.fill_halos(d.pad(jnp.asarray(rng.uniform(50, 150, (2, 8, 32)))))
    uhtr = d.fill_halos(d.pad(jnp.asarray(
        5e6 * rng.standard_normal((2, 8, 32)))))
    vhtr = d.fill_halos(d.pad(jnp.asarray(
        5e6 * rng.standard_normal((2, 8, 32)))))
    T = d.fill_halos(d.pad(jnp.asarray(
        10.0 + rng.standard_normal((2, 8, 32)))))
    ts, h_end, _ = advect_tracers(d, g, {"T": T}, h, uhtr, vhtr)
    # advect_tracers takes the POST-transport thickness and
    # reconstructs hprev = h + div(transports)/areaT internally;
    # conservation relates content on hprev to content on h_out
    from mom6_tpu.parallel.stencil import im1, jm1
    hvol_prev = h * g.areaT + (uhtr - im1(uhtr)) + (vhtr - jm1(vhtr))
    area = d.interior(g.areaT)
    tot0 = float(jnp.sum(d.interior(T * hvol_prev)))
    tot1 = float(jnp.sum(d.interior(ts["T"] * h_end) * area))
    assert abs(tot1 - tot0) / abs(tot0) < 1e-12


def test_advection_translates_blob():
    """Constant transports translate a tracer blob downstream."""
    d, g = setup(ni=64, nj=8)
    h0 = 100.0
    dx = float(g.dxT[5, 5])
    area = float(g.areaT[5, 5])
    h = d.fill_halos(d.pad(jnp.full((1, 8, 64), h0)))
    x = np.arange(64)
    dist = (x - 20 + 32) % 64 - 32
    blob = np.exp(-dist ** 2 / 12.0)
    Tp = np.zeros((1, 16, 72))
    Tp[0, :, :] = np.concatenate([blob[-4:], blob, blob[:4]])
    T = jnp.asarray(Tp)
    # move exactly 3 cells: uhtr = 3 * cell volume
    uhtr = d.fill_halos(d.pad(jnp.full((1, 8, 64), 3.0 * h0 * area)))
    vhtr = jnp.zeros_like(uhtr)
    cfg = TracerAdvectCfg(n_sweep_pairs=4, max_cfl=0.98)
    ts, h_end, _ = advect_tracers(d, g, {"c": T}, h, uhtr, vhtr, cfg)
    got = np.asarray(d.interior(ts["c"]))[0, 4]
    expect = np.roll(blob, 3)
    # the blob's mass should arrive 3 cells downstream
    got_c = np.sum(got * x) / np.sum(got)
    exp_c = np.sum(expect * x) / np.sum(expect)
    assert abs(got_c - exp_c) < 0.2, (got_c, exp_c)
    np.testing.assert_allclose(np.asarray(d.interior(h_end)), h0,
                               rtol=1e-12)


def test_vertdiff_conserves_and_homogenizes():
    nk = 6
    h = jnp.full((nk, 1, 1), 20.0)
    t = jnp.asarray(np.linspace(20, 4, nk)).reshape(nk, 1, 1)
    kd = jnp.full((nk + 1, 1, 1), 1e-2)
    t1 = tracer_vertdiff(t, h, kd, dt=3600.0)
    assert abs(float(jnp.sum(t1 * h)) - float(jnp.sum(t * h))) < 1e-10
    # variance decreases
    assert float(jnp.var(t1)) < float(jnp.var(t))
    # very strong mixing homogenizes
    t2 = tracer_vertdiff(t, h, jnp.full((nk + 1, 1, 1), 1e3), dt=3600.0)
    np.testing.assert_allclose(np.asarray(t2).ravel(),
                               float(jnp.mean(t)), rtol=1e-3)


def test_registry():
    reg = TracerRegistry()
    reg.register(TracerMeta(name="age", units="yr"))
    reg.register(TracerMeta(name="dye1", advect=False))
    assert reg.names() == ["age", "dye1"]
    assert reg.names(advected_only=True) == ["age"]
    # column fn application
    reg2 = TracerRegistry()
    reg2.register(TracerMeta(name="age",
                             column_fn=lambda t, h, dt: t + dt))
    out = reg2.apply_column_fns({"age": jnp.zeros(3)}, None, 2.0)
    np.testing.assert_allclose(np.asarray(out["age"]), 2.0)


def test_khtr_slope_cff_accelerates_mixing():
    """KHTR_SLOPE_CFF adds cff*L^2*SN to the face diffusivity
    (MOM_tracer_hor_diff.F90:241): with an additive face term the
    tracer front homogenizes faster, and conservation still holds."""
    from mom6_tpu.tracer.hor_diff import TracerHorDiffCfg, \
        tracer_hordiff
    d, g = setup()
    h = d.fill_halos(d.pad(jnp.full((2, 8, 32), 100.0)))
    T = jnp.where(jnp.arange(g.bathyT.shape[-1]) < g.bathyT.shape[-1]
                  // 2, 1.0, 0.0) * jnp.ones_like(h)
    T = d.fill_halos(T)
    cfg = TracerHorDiffCfg(khtr=50.0, khtr_slope_cff=1.0)
    add = jnp.full_like(g.bathyT, 450.0)   # cff*L^2*SN at faces
    base = tracer_hordiff(d, g, {"c": T}, h, 3600.0, cfg)["c"]
    fast = tracer_hordiff(d, g, {"c": T}, h, 3600.0, cfg,
                          add_u=add, add_v=add)["c"]
    var_b = float(jnp.var(d.interior(base)))
    var_f = float(jnp.var(d.interior(fast)))
    assert var_f < var_b
    tot0 = float(jnp.sum(d.interior(T * h)))
    tot1 = float(jnp.sum(d.interior(fast * h)))
    np.testing.assert_allclose(tot1, tot0, rtol=1e-12)


def test_diffuse_ml_to_interior_epipycnal():
    """DIFFUSE_ML_TO_INTERIOR: mixed-layer water exchanges with the
    density-matched INTERIOR layer of the neighbor column (the
    max_kRho pairing of tracer_epipycnal_ML_diff,
    MOM_tracer_hor_diff.F90:857), not with its own z-like level;
    buffer layers get no along-layer diffusion; total content is
    conserved."""
    from mom6_tpu.tracer.hor_diff import TracerHorDiffCfg, \
        tracer_hordiff
    d, g = setup(ni=32, nj=8)
    nz, nkml, nkmb = 5, 1, 2
    h = d.fill_halos(d.pad(jnp.full((nz, 8, 32), 100.0)))
    rlay = jnp.asarray([1020.0, 1021.0, 1025.0, 1027.0, 1029.0])
    # ML coordinate density ≈ 1026.5 everywhere → pairs with interior
    # layer 3 (Rlay=1027 bracket), never layer 2 or 4
    rho_ml = jnp.full_like(h[:nkmb], 1026.5)
    # dye lives only in the left half's ML layer
    i = jnp.arange(h.shape[-1])
    dye = jnp.where(i < h.shape[-1] // 2, 1.0, 0.0) \
        * jnp.ones_like(h[0])
    c = jnp.zeros_like(h).at[0].set(dye)
    c = d.fill_halos(c)
    cfg = TracerHorDiffCfg(khtr=100.0, diffuse_ml_to_interior=True,
                           ml_khtr_scale=0.0, nkml=nkml, nkmb=nkmb)
    out = tracer_hordiff(d, g, {"dye": c}, h, 3600.0, cfg,
                         rho_ml=rho_ml, rlay=rlay)["dye"]
    oi = np.asarray(d.interior(out))
    ci = np.asarray(d.interior(c))
    hi = np.asarray(d.interior(h))
    # conservation
    np.testing.assert_allclose(np.sum(oi * hi), np.sum(ci * hi),
                               rtol=1e-12)
    # dye appeared in interior layer 3 at the front, nowhere else new
    assert oi[3].max() > 1e-6
    assert abs(oi[2]).max() < 1e-14 and abs(oi[4]).max() < 1e-14
    # the buffer layer (k=1) only sees dye second-hand (epipycnal
    # exchange with the neighbor's now-dyed interior layer on a later
    # pass) — far less than the directly-paired interior layer
    assert abs(oi[1]).max() < 0.1 * oi[3].max()
    # with ml_khtr_scale=0 the ML dye front did NOT diffuse along k=0
    # (only the epipycnal drain changed it): the right half stays 0
    assert abs(oi[0][:, oi.shape[-1] * 3 // 4]).max() < 1e-14
