"""Depth-list hypsometry + APE ocean.stats machinery
(MOM_sum_output.F90:610-675, 1067-1364).

Covers: analytic list construction on a two-level bathymetry, zero
APE for a resting state, the analytic small-amplitude surface-bump
APE, bitwise layout invariance of the APE limbs across a (4,2)
shard_map, and the Depth_list.nc read/write checksum flow."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.parallel.domain import (Domain, make_mesh, pad_field)
from mom6_tpu.core.grid import cartesian_grid, blockify_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.diagnostics.depth_list import (DepthList,
                                             create_depth_list,
                                             depth_list_setup,
                                             write_depth_list)
from mom6_tpu.diagnostics.sum_output import stat_sums, collect_stats
from mom6_tpu.framework.efp import efp_to_float


def _flat_setup(ni=16, nj=16, nk=2, depth=1000.0):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       max_depth=depth)
    vg = VerticalGrid.uniform(nk=nk)
    return d, g, vg


def test_create_depth_list_two_basins():
    d, g, vg = _flat_setup()
    # western half 1000 m deep, eastern half 600 m
    bathy = np.array(g.bathyT)
    H = d.halo
    bathy[:, H + 8:] = np.where(bathy[:, H + 8:] > 0, 600.0,
                                bathy[:, H + 8:])
    g = dataclasses.replace(g, bathyT=jnp.asarray(bathy))
    dl = create_depth_list(d, g)
    depth = np.asarray(dl.depth)
    area = np.asarray(dl.area)
    vol = np.asarray(dl.vol_below)
    cell = float(np.asarray(d.interior(g.areaT))[0, 0])
    a_deep = 16 * 8 * cell
    a_tot = 16 * 16 * cell
    # deepest-first entries: (1000, first cell, 0), (1000, deep-basin
    # area, 0), (600, total area, deep volume), sentinel
    assert depth[0] == 1000.0 and vol[0] == 0.0
    np.testing.assert_allclose(area[1], a_deep, rtol=1e-12)
    assert depth[1] == 1000.0 and vol[1] == 0.0
    assert depth[2] == 600.0
    np.testing.assert_allclose(area[2], a_tot, rtol=1e-12)
    np.testing.assert_allclose(vol[2], a_deep * 400.0, rtol=1e-12)
    assert vol[-1] > 100.0 * vol[2]          # sentinel brackets


def _resting_state(d, g, vg, depth=1000.0):
    nk = vg.nk
    shape = (nk, d.njh, d.nih)
    h = d.fill_halos(jnp.full(shape, depth / nk))
    return State(u=jnp.zeros(shape), v=jnp.zeros(shape), h=h)


def test_resting_state_zero_ape():
    d, g, vg = _flat_setup()
    dl = create_depth_list(d, g)
    st = _resting_state(d, g, vg)
    raw = jax.jit(stat_sums)(d, g, vg, st, 600.0, dl)
    ape = efp_to_float(raw["ape"])
    assert abs(ape) < 1e-6
    # top interface rests at the surface
    np.testing.assert_allclose(float(raw["h0"]), 0.0, atol=1e-9)
    s = collect_stats(raw, vg, 0, 0.0)
    assert abs(s.energy_per_mass) < 1e-12
    assert s.h0 is not None


def test_surface_bump_ape_analytic():
    d, g, vg = _flat_setup()
    dl = create_depth_list(d, g)
    st = _resting_state(d, g, vg)
    rng = np.random.default_rng(3)
    eta = 0.5 * rng.standard_normal((16, 16))
    eta -= eta.mean()                      # volume-preserving bump
    h = np.array(st.h)
    H = d.halo
    h[0, H:H + 16, H:H + 16] += eta
    st = st.replace(h=d.fill_halos(jnp.asarray(h)))
    raw = jax.jit(stat_sums)(d, g, vg, st, 600.0, dl)
    ape = efp_to_float(raw["ape"])
    area = np.asarray(d.interior(g.areaT))
    g0 = float(vg.g_prime[0])
    expect = 0.5 * g0 * float((eta ** 2 * area).sum())
    np.testing.assert_allclose(ape, expect, rtol=1e-7)
    # internal-interface displacement costs only g' (reduced gravity)
    h2 = np.array(_resting_state(d, g, vg).h)
    h2[0, H:H + 16, H:H + 16] += eta
    h2[1, H:H + 16, H:H + 16] -= eta       # flat surface, tilted iface
    st2 = _resting_state(d, g, vg).replace(
        h=d.fill_halos(jnp.asarray(h2)))
    raw2 = jax.jit(stat_sums)(d, g, vg, st2, 600.0, dl)
    ape2 = efp_to_float(raw2["ape"])
    gp1 = float(vg.g_prime[1])
    np.testing.assert_allclose(ape2, 0.5 * gp1
                               * float((eta ** 2 * area).sum()),
                               rtol=1e-7)


def test_ape_layout_invariance():
    ni = nj = 16
    nk = 2
    d1, g1, vg = _flat_setup(ni, nj, nk)
    dl = create_depth_list(d1, g1)
    rng = np.random.default_rng(7)
    h0 = 500.0 + 5.0 * rng.standard_normal((nk, nj, ni))
    u0 = 0.05 * rng.standard_normal((nk, nj, ni))
    st1 = State(u=d1.fill_halos(d1.pad(jnp.asarray(u0))),
                v=jnp.zeros((nk, d1.njh, d1.nih)),
                h=d1.fill_halos(d1.pad(jnp.asarray(h0))))
    raw1 = jax.jit(stat_sums)(d1, g1, vg, st1, 600.0, dl)

    layout = (4, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout, reentrant_x=True,
                reentrant_y=True).sharded()
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s2 = P("y", "x")
    s3 = P(None, "y", "x")

    def run(hp, up, gr):
        s = State(u=dn.fill_halos(up),
                  v=jnp.zeros_like(up),
                  h=dn.fill_halos(hp))
        raw = stat_sums(dn, gr, vg, s, 600.0, dl)
        return raw["ape"], raw["h0"]

    gspec = jax.tree.map(lambda _: s2, gn)
    apeN, h0N = jax.jit(shard_map(
        run, mesh=mesh, in_specs=(s3, s3, gspec),
        out_specs=(P(), P())))(pad_field(dn, jnp.asarray(h0)),
                               pad_field(dn, jnp.asarray(u0)), gn)
    np.testing.assert_array_equal(np.asarray(raw1["ape"]),
                                  np.asarray(apeN))
    assert float(raw1["h0"]) == float(h0N)


def test_depth_list_file_roundtrip(tmp_path):
    d, g, vg = _flat_setup()
    path = os.path.join(tmp_path, "Depth_list.nc")
    dl = depth_list_setup(d, g, read_file=True, path=path)
    assert os.path.exists(path)
    dl2 = depth_list_setup(d, g, read_file=True, path=path)
    np.testing.assert_array_equal(np.asarray(dl.vol_below),
                                  np.asarray(dl2.vol_below))
    # stale file (different topography) must be regenerated, matching
    # the reference's checksum guard (MOM_sum_output.F90:1253-1300)
    bathy = np.array(g.bathyT) * 0.5
    g2 = dataclasses.replace(g, bathyT=jnp.asarray(bathy))
    dl3 = depth_list_setup(d, g2, read_file=True, path=path)
    assert abs(float(dl3.depth[0]) - 500.0) < 1e-9
