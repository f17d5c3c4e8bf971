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
