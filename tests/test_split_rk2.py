import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.barotropic import (BarotropicCfg, btstep, btcalc,
                                      set_dtbt)
from mom6_tpu.core.dynamics_split_rk2 import (
    SplitCfg, init_split_state, step_dyn_split_rk2)
from mom6_tpu.core.vert_friction import VertViscCfg
from mom6_tpu.core.pressure_force import interface_heights


def setup(ni=32, nj=32, nk=2, depth=1000.0, f0=0.0, lenkm=320.0,
          nstep=None):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=lenkm, lenlat_km=lenkm, f0=f0,
                       max_depth=depth)
    vg = VerticalGrid.uniform(nk=nk, gint=0.0098)
    btcfg = BarotropicCfg(nstep=nstep or 16)
    cfg = SplitCfg(vertvisc=VertViscCfg(kv=1e-4, cdrag=0.0,
                                        bottomdraglaw=False),
                   barotropic=btcfg)
    return d, g, vg, cfg


def test_btcalc_weights_sum_to_one():
    d, g, vg, cfg = setup(nk=4)
    rng = np.random.default_rng(0)
    h = d.fill_halos(d.pad(jnp.asarray(rng.uniform(10, 400, (4, 32, 32)))))
    fu, fv = btcalc(g, h)
    s = np.asarray(d.interior(jnp.sum(fu, 0)))
    np.testing.assert_allclose(s, 1.0, rtol=1e-12)


def test_set_dtbt_cfl():
    d, g, vg, cfg = setup()
    n = set_dtbt(d, g, vg, cfg.barotropic, dt=1800.0)
    # c = sqrt(9.8*1000) ≈ 99, dx = 10 km → dtbt_max ≈ 67s → nstep ≈ 28
    assert 20 <= n <= 40


def test_btstep_flat_rest():
    """btstep from rest with flat eta must stay at rest."""
    d, g, vg, cfg = setup()
    shp = (2, 40, 40)
    h = d.fill_halos(d.pad(jnp.full((2, 32, 32), 500.0)))
    z3 = jnp.zeros(shp)
    eta = jnp.zeros((40, 40))
    pbce = jnp.full(shp, 9.8)
    r = btstep(d, g, vg, z3, z3, eta, h, z3, z3, pbce, z3, z3,
               dt=1800.0, cfg=cfg.barotropic)
    assert float(jnp.max(jnp.abs(d.interior(r.eta)))) < 1e-12
    assert float(jnp.max(jnp.abs(d.interior(r.accel_layer_u)))) < 1e-14


def test_btstep_gravity_wave_stable():
    """A barotropic eta bump should radiate without blowup, conserving
    the mean of eta."""
    d, g, vg, cfg = setup(nstep=64)
    shp = (2, 40, 40)
    rng = np.random.default_rng(1)
    h = d.fill_halos(d.pad(jnp.full((2, 32, 32), 500.0)))
    z3 = jnp.zeros(shp)
    x = np.arange(40)
    eta_np = 0.5 * np.exp(-(((x[None, :] - 20) ** 2
                             + (x[:, None] - 20) ** 2) / 20.0))
    eta = d.fill_halos(jnp.asarray(eta_np))
    pbce = jnp.full(shp, 9.8)
    r = btstep(d, g, vg, z3, z3, eta, h, z3, z3, pbce, z3, z3,
               dt=1800.0, cfg=cfg.barotropic)
    eta_out = np.asarray(d.interior(r.eta))
    assert np.all(np.isfinite(eta_out))
    assert np.max(np.abs(eta_out)) < 1.0    # no amplification
    # volume conservation of the subcycle
    assert abs(eta_out.mean() - np.asarray(d.interior(eta)).mean()) < 1e-10
    # transports developed
    assert float(jnp.max(jnp.abs(d.interior(r.uhbtav)))) > 0.0


def test_split_lake_at_rest():
    d, g, vg, cfg = setup()
    h = d.fill_halos(d.pad(jnp.full((2, 32, 32), 500.0)))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    sp = init_split_state(d, g, vg, st)
    forces = MechForcing()
    step = jax.jit(lambda s, a: step_dyn_split_rk2(d, g, vg, s, a, forces,
                                                   1800.0, cfg)[:2])
    for _ in range(5):
        st, sp = step(st, sp)
    assert float(jnp.max(jnp.abs(d.interior(st.u)))) < 1e-12
    assert float(jnp.max(jnp.abs(d.interior(st.h) - 500.0))) < 1e-9


def test_split_gravity_wave_large_dt():
    """The split scheme must remain stable at dt far beyond the surface
    gravity wave CFL (the whole point of splitting)."""
    d, g, vg, cfg = setup(ni=64, nj=8, lenkm=640.0, nstep=40)
    H0 = 1000.0
    L = 640.0e3
    k = 2 * np.pi / L
    x = (np.arange(72) - 4 + 0.5) * (L / 64)
    eta0 = 0.05 * np.sin(k * x)
    h_int = np.broadcast_to((H0 + eta0) / 2, (2, 16, 72)).copy()
    h = d.fill_halos(jnp.asarray(h_int))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    sp = init_split_state(d, g, vg, st)
    forces = MechForcing()
    dt = 900.0      # gravity-wave CFL ≈ 9 — unsplit would explode
    step = jax.jit(lambda s, a: step_dyn_split_rk2(d, g, vg, s, a, forces,
                                                   dt, cfg)[:2])
    for _ in range(20):
        st, sp = step(st, sp)
    h_out = np.asarray(d.interior(st.h))
    assert np.all(np.isfinite(h_out))
    # amplitude must not grow
    assert np.max(np.abs(h_out.sum(0) - H0)) < 0.2
    # mass conserved
    mass0 = float(np.sum(h_int[:, 4:-4, 4:-4]))
    mass1 = float(h_out.sum())
    assert abs(mass1 - mass0) / mass0 < 1e-11


def test_split_mass_and_transport_consistency():
    """h update must exactly reflect the (Newton-matched) transports."""
    d, g, vg, cfg = setup()
    rng = np.random.default_rng(2)
    h_int = 500.0 + 5.0 * rng.standard_normal((2, 32, 32))
    h = d.fill_halos(jnp.asarray(d.pad(jnp.asarray(h_int))))
    u = d.fill_halos(d.pad(jnp.asarray(0.05 * rng.standard_normal((2, 32, 32)))))
    v = d.fill_halos(d.pad(jnp.asarray(0.05 * rng.standard_normal((2, 32, 32)))))
    st = State(u=u, v=v, h=h)
    sp = init_split_state(d, g, vg, st)
    forces = MechForcing()
    st2, sp2, diags = step_dyn_split_rk2(d, g, vg, st, sp, forces, 900.0,
                                         SplitCfg(barotropic=BarotropicCfg(nstep=32),
                                                  vertvisc=VertViscCfg(kv=1e-4, cdrag=0.0,
                                                                       bottomdraglaw=False)))
    area = np.asarray(d.interior(g.areaT))
    mass0 = float((np.asarray(d.interior(h)) * area).sum())
    mass1 = float((np.asarray(d.interior(st2.h)) * area).sum())
    assert abs(mass1 - mass0) / mass0 < 1e-12
    assert np.all(np.isfinite(np.asarray(st2.u)))


def test_split_layout_invariance():
    """Split RK2 (incl. btstep subcycle comms) must be layout-invariant."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mom6_tpu.parallel.domain import make_mesh, pad_field, unpad_field
    from mom6_tpu.core.grid import blockify_grid

    ni = nj = 32
    d1, g1, vg, cfg = setup(ni=ni, nj=nj, nstep=16)
    rng = np.random.default_rng(5)
    h0 = 500.0 + jnp.asarray(2.0 * rng.standard_normal((2, nj, ni)))
    u0 = 0.05 * jnp.asarray(rng.standard_normal((2, nj, ni)))
    v0 = 0.05 * jnp.asarray(rng.standard_normal((2, nj, ni)))
    forces = MechForcing()
    dt, nsteps = 900.0, 3

    st = State(u=d1.fill_halos(d1.pad(u0)), v=d1.fill_halos(d1.pad(v0)),
               h=d1.fill_halos(d1.pad(h0)))
    sp = init_split_state(d1, g1, vg, st)
    for _ in range(nsteps):
        st, sp, _ = step_dyn_split_rk2(d1, g1, vg, st, sp, forces, dt, cfg)
    ref = {k: np.asarray(d1.interior(getattr(st, k))) for k in "uvh"}

    layout = (2, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout,
                reentrant_x=True, reentrant_y=True).sharded()
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    sspec = State(u=s3, v=s3, h=s3)
    gspec = jax.tree.map(lambda _: P("y", "x"), gn)

    def run(s, gr):
        s = State(u=dn.fill_halos(s.u), v=dn.fill_halos(s.v),
                  h=dn.fill_halos(s.h), T=None, S=None)
        a = init_split_state(dn, gr, vg, s)
        for _ in range(nsteps):
            s, a, _ = step_dyn_split_rk2(dn, gr, vg, s, a, forces, dt, cfg)
        return s

    stN = State(u=pad_field(dn, u0), v=pad_field(dn, v0),
                h=pad_field(dn, h0))
    out = jax.jit(shard_map(run, mesh=mesh, in_specs=(sspec, gspec),
                            out_specs=sspec))(stN, gn)
    for k in "uvh":
        got = np.asarray(unpad_field(dn, getattr(out, k)))
        scale = np.max(np.abs(ref[k])) + 1e-30
        np.testing.assert_allclose(got / scale, ref[k] / scale,
                                   rtol=0, atol=1e-10,
                                   err_msg=f"field {k} layout-variant")


def test_wide_halo_barotropic_equivalence():
    """The communication-avoiding wide-halo march (exchange every k
    substeps with 3k-ring refresh) must reproduce the per-substep-
    exchange result, single-device and sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mom6_tpu.parallel.domain import make_mesh, pad_field, unpad_field
    from mom6_tpu.core.grid import blockify_grid
    import dataclasses as dc

    ni = nj = 32
    d1, g1, vg, _ = setup(ni=ni, nj=nj)
    rng = np.random.default_rng(9)
    shp3 = (2, 40, 40)
    h = d1.fill_halos(d1.pad(jnp.full((2, 32, 32), 500.0)))
    eta0 = d1.fill_halos(jnp.asarray(
        0.05 * rng.standard_normal((40, 40))))
    u0 = d1.fill_halos(jnp.asarray(
        0.02 * rng.standard_normal(shp3)))
    v0 = d1.fill_halos(jnp.asarray(
        0.02 * rng.standard_normal(shp3)))
    acc = d1.fill_halos(jnp.asarray(
        1e-6 * rng.standard_normal(shp3)))
    pbce = jnp.full(shp3, 9.8)

    def run(dom, gr, cfgbt):
        return btstep(dom, gr, vg, u0 * 0 + dom.fill_halos(u0), v0, eta0,
                      h, acc, acc, pbce, u0, v0, dt=1800.0, cfg=cfgbt)

    cfg1 = BarotropicCfg(nstep=16, wide_halo_period=1)
    cfg4 = BarotropicCfg(nstep=16, wide_halo_period=4)
    r1 = btstep(d1, g1, vg, u0, v0, eta0, h, acc, acc, pbce, u0, v0,
                dt=1800.0, cfg=cfg1)
    r4 = btstep(d1, g1, vg, u0, v0, eta0, h, acc, acc, pbce, u0, v0,
                dt=1800.0, cfg=cfg4)
    np.testing.assert_allclose(np.asarray(d1.interior(r4.eta)),
                               np.asarray(d1.interior(r1.eta)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1.interior(r4.uhbtav)),
                               np.asarray(d1.interior(r1.uhbtav)),
                               atol=1e-6)

    # sharded wide path == single-device
    layout = (2, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout,
                reentrant_x=True, reentrant_y=True).sharded()
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    s2 = P("y", "x")
    gspec = jax.tree.map(lambda _: s2, gn)

    def runN(u, v, e, hh, aa, pb, gr):
        u, v, e, hh, aa = dn.fill_halos((u, v, e, hh, aa))
        r = btstep(dn, gr, vg, u, v, e, hh, aa, aa, pb, u, v,
                   dt=1800.0, cfg=cfg4)
        return r.eta, r.uhbtav, r.accel_layer_u

    ui = d1.interior(u0)
    vi = d1.interior(v0)
    ei = d1.interior(eta0)
    hi = d1.interior(h)
    ai = d1.interior(acc)
    out = jax.jit(shard_map(
        runN, mesh=mesh,
        in_specs=(s3, s3, s2, s3, s3, s3, gspec),
        out_specs=(s2, s2, s3)))(
        pad_field(dn, ui), pad_field(dn, vi), pad_field(dn, ei),
        pad_field(dn, hi), pad_field(dn, ai),
        pad_field(dn, jnp.full_like(ai, 9.8)), gn)
    eN = np.asarray(unpad_field(dn, out[0]))
    np.testing.assert_allclose(eN, np.asarray(d1.interior(r4.eta)),
                               atol=1e-11)


def test_pallas_march_sharded_matches_single_device(monkeypatch):
    """The fused Pallas march runs per-shard inside shard_map with the
    wide-halo ppermute exchange between chunks: a (2,2) layout must
    reproduce the single-device jnp result (interpreter mode; the
    compiled path rides the same code on the chip)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mom6_tpu.parallel.domain import (make_mesh, pad_field,
                                          unpad_field)
    from mom6_tpu.core.grid import blockify_grid

    ni = nj = 32
    d1, g1, vg, _ = setup(ni=ni, nj=nj)
    rng = np.random.default_rng(9)
    shp3 = (2, 40, 40)
    h = d1.fill_halos(d1.pad(jnp.full((2, 32, 32), 500.0)))
    eta0 = d1.fill_halos(jnp.asarray(
        0.05 * rng.standard_normal((40, 40))))
    u0 = d1.fill_halos(jnp.asarray(0.02 * rng.standard_normal(shp3)))
    v0 = d1.fill_halos(jnp.asarray(0.02 * rng.standard_normal(shp3)))
    acc = d1.fill_halos(jnp.asarray(1e-6 * rng.standard_normal(shp3)))
    pbce = jnp.full(shp3, 9.8)

    cfg_ref = BarotropicCfg(nstep=16, wide_halo_period=1)
    r1 = btstep(d1, g1, vg, u0, v0, eta0, h, acc, acc, pbce, u0, v0,
                dt=1800.0, cfg=cfg_ref)

    monkeypatch.setenv("MOM6_PALLAS_INTERPRET", "1")
    cfg_p = BarotropicCfg(nstep=16, wide_halo_period=4,
                          use_pallas=True)
    layout = (2, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout,
                reentrant_x=True, reentrant_y=True).sharded()
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    s2 = P("y", "x")
    gspec = jax.tree.map(lambda _: s2, gn)

    def runN(u, v, e, hh, aa, pb, gr):
        u, v, e, hh, aa = dn.fill_halos((u, v, e, hh, aa))
        r = btstep(dn, gr, vg, u, v, e, hh, aa, aa, pb, u, v,
                   dt=1800.0, cfg=cfg_p)
        return r.eta, r.uhbtav

    out = jax.jit(shard_map(
        runN, mesh=mesh,
        in_specs=(s3, s3, s2, s3, s3, s3, gspec),
        out_specs=(s2, s2), check_vma=False))(
        pad_field(dn, d1.interior(u0)), pad_field(dn, d1.interior(v0)),
        pad_field(dn, d1.interior(eta0)),
        pad_field(dn, d1.interior(h)), pad_field(dn, d1.interior(acc)),
        pad_field(dn, jnp.full_like(d1.interior(acc), 9.8)), gn)
    eN = np.asarray(unpad_field(dn, out[0]))
    uhN = np.asarray(unpad_field(dn, out[1]))
    np.testing.assert_allclose(eN, np.asarray(d1.interior(r1.eta)),
                               atol=1e-10)
    sc = np.abs(np.asarray(d1.interior(r1.uhbtav))).max() + 1e-30
    np.testing.assert_allclose(uhN / sc,
                               np.asarray(d1.interior(r1.uhbtav)) / sc,
                               atol=1e-9)
