"""Rotational invariance (the reference's test.rotate,
.testing/Makefile:144): stepping the rotated state on the rotated grid
must equal rotating the stepped state."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import Grid, cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.continuity_ppm import continuity_ppm
from mom6_tpu.framework.array_transform import (rotate_scalar,
                                                rotate_vector,
                                                rotate_corner)


def rotate_grid(g: Grid, d_new: Domain) -> Grid:
    """Rotate every metric field onto the new (transposed) domain."""
    rs, rc = rotate_scalar, rotate_corner
    # new u-kind positions = old v-kind positions (no shift);
    # new v-kind = old u-kind with the corner-style -1 j' roll
    ru = rotate_scalar
    rv = lambda a: jnp.roll(rotate_scalar(a), -1, axis=-2)
    return Grid(
        domain=d_new,
        dxT=rs(g.dyT), dyT=rs(g.dxT),
        IdxT=rs(g.IdyT), IdyT=rs(g.IdxT),
        areaT=rs(g.areaT), IareaT=rs(g.IareaT),
        dxCu=ru(g.dyCv), dyCu=ru(g.dxCv),
        IdxCu=ru(g.IdyCv), IdyCu=ru(g.IdxCv),
        areaCu=ru(g.areaCv), IareaCu=ru(g.IareaCv),
        dxCv=rv(g.dyCu), dyCv=rv(g.dxCu),
        IdxCv=rv(g.IdyCu), IdyCv=rv(g.IdxCu),
        areaCv=rv(g.areaCu), IareaCv=rv(g.IareaCu),
        dxBu=rc(g.dyBu), dyBu=rc(g.dxBu),
        IdxBu=rc(g.IdyBu), IdyBu=rc(g.IdxBu),
        areaBu=rc(g.areaBu), IareaBu=rc(g.IareaBu),
        mask2dT=rs(g.mask2dT),
        mask2dCu=ru(g.mask2dCv),
        mask2dCv=rv(g.mask2dCu),
        mask2dBu=rc(g.mask2dBu),
        CoriolisBu=rc(g.CoriolisBu),
        bathyT=rs(g.bathyT),
        geoLatT=rs(g.geoLonT), geoLonT=rs(g.geoLatT),
        geoLatCu=ru(g.geoLonCv), geoLonCu=ru(g.geoLatCv),
        geoLatCv=rv(g.geoLonCu), geoLonCv=rv(g.geoLatCu),
        geoLatBu=rc(g.geoLonBu), geoLonBu=rc(g.geoLatBu),
    )


def setup(ni=12, nj=8):
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=ni * 10.0, lenlat_km=nj * 10.0,
                       f0=1e-4)
    vg = VerticalGrid.uniform(nk=2, gint=0.01)
    return d, g, vg


def test_rotate_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 16, 20)))
    b = a
    for _ in range(4):
        b = rotate_scalar(b)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_rotate_vector_roundtrip():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, 16, 20)))
    v = jnp.asarray(rng.standard_normal((2, 16, 20)))
    uu, vv = u, v
    for _ in range(4):
        uu, vv = rotate_vector(uu, vv)
    np.testing.assert_array_equal(np.asarray(uu), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(vv), np.asarray(v))


def test_continuity_rotation_invariance():
    """rot(continuity(u,v,h)) == continuity(rot(u,v,h)) on the rotated
    grid — validates every index offset in the x/y sweeps."""
    d, g, vg = setup()
    rng = np.random.default_rng(2)
    h = d.fill_halos(d.pad(jnp.asarray(
        100.0 + 5.0 * rng.standard_normal((2, 8, 12)))))
    u = d.fill_halos(d.pad(jnp.asarray(
        0.2 * rng.standard_normal((2, 8, 12)))))
    v = d.fill_halos(d.pad(jnp.asarray(
        0.2 * rng.standard_normal((2, 8, 12)))))

    res = continuity_ppm(g, vg, u, v, h, dt=600.0, x_first=True)

    d2 = Domain(ni=d.nj, nj=d.ni, halo=4, reentrant_x=True,
                reentrant_y=True)
    g2 = rotate_grid(g, d2)
    u2, v2 = rotate_vector(u, v)
    h2 = rotate_scalar(h)
    u2, v2, h2 = d2.fill_halos((u2, v2, h2))
    # the rotated run sweeps y-first in its own frame to mirror the
    # unrotated x-first sweep
    res2 = continuity_ppm(g2, vg, u2, v2, h2, dt=600.0, x_first=False)

    expect_h = np.asarray(d2.interior(rotate_scalar(res.h)))
    got_h = np.asarray(d2.interior(res2.h))
    np.testing.assert_allclose(got_h, expect_h, atol=1e-10)
