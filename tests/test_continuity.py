import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.continuity_ppm import (
    ContinuityCfg, continuity_ppm, ppm_edges_x)


def make_setup(ni=16, nj=12, nk=2, reentrant=True):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=reentrant,
               reentrant_y=reentrant)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=120.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    return d, g, vg


def test_mass_conservation_random_velocity():
    d, g, vg = make_setup()
    rng = np.random.default_rng(0)
    h = d.pad(jnp.asarray(rng.uniform(50, 150, (2, 12, 16))))
    u = d.pad(jnp.asarray(rng.uniform(-0.5, 0.5, (2, 12, 16))))
    v = d.pad(jnp.asarray(rng.uniform(-0.5, 0.5, (2, 12, 16))))
    u, v, h = d.fill_halos((u, v, h))
    res = continuity_ppm(g, vg, u, v, h, dt=1800.0)
    mass0 = float(jnp.sum(d.interior(h) * d.interior(g.areaT)))
    mass1 = float(jnp.sum(d.interior(res.h) * d.interior(g.areaT)))
    assert abs(mass1 - mass0) / mass0 < 1e-13


def test_uniform_flow_preserves_uniform_h():
    d, g, vg = make_setup()
    h = d.pad(jnp.full((2, 12, 16), 100.0))
    u = d.pad(jnp.full((2, 12, 16), 0.3))
    v = d.pad(jnp.full((2, 12, 16), -0.2))
    u, v, h = d.fill_halos((u, v, h))
    res = continuity_ppm(g, vg, u, v, h, dt=1800.0)
    np.testing.assert_allclose(np.asarray(d.interior(res.h)), 100.0,
                               rtol=1e-14)


def test_positive_definite():
    """Thin layers must never go negative (below angstrom)."""
    d, g, vg = make_setup()
    rng = np.random.default_rng(1)
    h_int = np.full((2, 12, 16), 1e-3)
    h_int[:, 5:7, 5:7] = 100.0
    h = d.pad(jnp.asarray(h_int))
    u = d.pad(jnp.asarray(rng.uniform(-1.0, 1.0, (2, 12, 16))))
    v = d.pad(jnp.asarray(rng.uniform(-1.0, 1.0, (2, 12, 16))))
    u, v, h = d.fill_halos((u, v, h))
    res = continuity_ppm(g, vg, u, v, h, dt=1800.0)
    assert float(jnp.min(d.interior(res.h))) >= vg.angstrom * 0.99


def test_advection_translates_bump():
    """Uniform u should translate a thickness bump at speed u."""
    d, g, vg = make_setup(ni=64, nj=8, nk=1)
    x = np.arange(64)
    dist = (x - 20 + 32) % 64 - 32     # symmetric periodic distance
    bump = 100.0 + 10.0 * np.exp(-dist ** 2 / 18.0)
    h_int = np.broadcast_to(bump, (1, 8, 64)).copy()
    h = d.pad(jnp.asarray(h_int))
    dx = 160.0e3 / 64  # not the grid dx! cartesian_grid: lenlon/ni
    # actual dx from grid:
    dx = float(g.dxT[5, 5])
    u_speed = 0.5
    u = d.pad(jnp.full((1, 8, 64), u_speed))
    v = d.pad(jnp.zeros((1, 8, 64)))
    dt = 0.2 * dx / u_speed
    nsteps = int(round(5 * dx / (u_speed * dt)))  # translate 5 cells
    for _ in range(nsteps):
        u, v, h = d.fill_halos((u, v, h))
        h = continuity_ppm(g, vg, u, v, h, dt=dt).h
    got = np.asarray(d.interior(h))[0, 4, :]
    expect = np.roll(bump, 5)
    # PPM keeps the bump within ~2% after 25 steps
    assert np.max(np.abs(got - expect)) / 10.0 < 0.05


def test_newton_transport_matching():
    """With uhbt given, column transports must match it closely."""
    d, g, vg = make_setup()
    rng = np.random.default_rng(2)
    h = d.pad(jnp.asarray(rng.uniform(50, 150, (2, 12, 16))))
    u = d.pad(jnp.asarray(rng.uniform(-0.5, 0.5, (2, 12, 16))))
    v = d.pad(jnp.zeros((2, 12, 16)))
    u, v, h = d.fill_halos((u, v, h))
    uhbt = d.pad(jnp.asarray(rng.uniform(-1e4, 1e4, (12, 16))))
    uhbt = d.fill_halos(uhbt)
    res = continuity_ppm(g, vg, u, v, h, dt=1800.0, uhbt=uhbt)
    got = np.asarray(d.interior(jnp.sum(res.uh, axis=0)))
    expect = np.asarray(d.interior(uhbt))
    denom = np.maximum(np.abs(expect), 1e3)
    assert np.max(np.abs(got - expect) / denom) < 1e-10
    assert res.u_cor is not None


def test_edges_reduce_to_mean_for_linear_field():
    d, g, vg = make_setup()
    x = np.arange(24)[None, None, :]  # padded width = 16+8
    h = jnp.asarray(np.broadcast_to(100.0 + x, (1, 20, 24)).astype(float))
    hW, hE = ppm_edges_x(g, h, ContinuityCfg(), h_min=0.0)
    # interior cells: hW = h - 0.5, hE = h + 0.5 for unit slope
    inner = np.asarray(hW)[0, 8:12, 8:12]
    expect = np.asarray(h)[0, 8:12, 8:12] - 0.5
    np.testing.assert_allclose(inner, expect, atol=1e-12)
