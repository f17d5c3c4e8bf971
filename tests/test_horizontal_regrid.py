"""Horizontal regridding: creeping-sea fill fidelity.

fill_miss_2d semantics (MOM_horizontal_regridding.F90:99-272): valid
data creeps outward into missing regions (coastal values enter bays,
not a basin-mean), enclosed basins fall back to the previous-level
guess, and a Laplacian relaxation smooths only the filled points.
"""

import numpy as np

from mom6_tpu.initialization.horizontal_regrid import (bilinear_regrid,
                                                       fill_missing)


def test_valid_points_held_fixed():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((8, 8))
    valid = rng.random((8, 8)) > 0.4
    out = fill_missing(f, valid)
    np.testing.assert_array_equal(out[valid], f[valid])
    assert np.isfinite(out).all()


def test_harmonic_between_two_coasts():
    """Valid west column = 1, valid east column = 3: the filled
    interior relaxes to the harmonic (linear) profile between them."""
    ny, nx = 6, 11
    f = np.zeros((ny, nx))
    valid = np.zeros((ny, nx), bool)
    f[:, 0], valid[:, 0] = 1.0, True
    f[:, -1], valid[:, -1] = 3.0, True
    out = fill_missing(f, valid, tol=1e-12)
    expect = np.broadcast_to(np.linspace(1.0, 3.0, nx), (ny, nx))
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_creeping_goes_around_walls():
    """A bay whose direct line of sight to far data is blocked by a
    land wall (excluded via fill_mask) inherits the value creeping
    around through its mouth — not the value across the wall."""
    ny, nx = 9, 12
    f = np.zeros((ny, nx))
    valid = np.zeros((ny, nx), bool)
    # cold water north of the wall, warm water source at the south
    f[0, :], valid[0, :] = 10.0, True      # warm southern boundary
    f[-1, :], valid[-1, :] = -2.0, True    # cold northern boundary
    # wall with a mouth at the east end; the bay is the row just
    # north of the wall
    wall = np.zeros((ny, nx), bool)
    wall[4, :-2] = True
    fillable = ~wall
    out = fill_missing(f, valid, fill_mask=fillable, tol=1e-12)
    # wall cells never participate
    np.testing.assert_array_equal(out[4, :-2], 0.0)
    # without the wall the mid row would sit at the (10,-2) midpoint
    # ~4.0 everywhere; with the wall, heat must go around the mouth,
    # so the bay-interior value differs from the open-channel value
    # at the mouth column — and the profile decays INTO the bay
    bay = out[5, :]
    assert bay[0] < bay[-1]                # decays away from the mouth
    assert np.isfinite(out).all()


def test_enclosed_basin_uses_prev():
    """A fully-enclosed missing basin (no creeping path) takes the
    previous-level first guess, like the reference's prev argument."""
    ny, nx = 7, 7
    f = np.zeros((ny, nx))
    valid = np.zeros((ny, nx), bool)
    f[0, :], valid[0, :] = 5.0, True
    # ring of land isolating the center
    wall = np.zeros((ny, nx), bool)
    wall[2:5, 2] = wall[2:5, 4] = True
    wall[2, 2:5] = wall[4, 2:5] = True
    prev = np.full((ny, nx), -7.0)
    out = fill_missing(f, valid, fill_mask=~wall, prev=prev,
                       tol=1e-12)
    assert abs(out[3, 3] - (-7.0)) < 1e-6


def test_bilinear_regrid_roundtrip():
    src_lon = np.linspace(0.0, 10.0, 21)
    src_lat = np.linspace(-5.0, 5.0, 11)
    LO, LA = np.meshgrid(src_lon, src_lat)
    src = 2.0 * LO - 3.0 * LA
    dlon = np.linspace(0.5, 9.5, 7)[None, :] * np.ones((5, 1))
    dlat = np.linspace(-4.5, 4.5, 5)[:, None] * np.ones((1, 7))
    out = bilinear_regrid(src, src_lon, src_lat, dlon, dlat)
    np.testing.assert_allclose(out, 2.0 * dlon - 3.0 * dlat,
                               atol=1e-12)
