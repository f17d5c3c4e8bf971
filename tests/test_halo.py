import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.parallel.domain import Domain, make_mesh, pad_field, unpad_field


def _global_field(nj, ni, nz=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((nz, nj, ni)))


def test_pad_unpad_roundtrip():
    d = Domain(ni=16, nj=8, halo=2, layout=(4, 2))
    f = _global_field(8, 16)
    assert np.allclose(unpad_field(d, pad_field(d, f)), f)


def test_local_fill_reentrant():
    d = Domain(ni=8, nj=6, halo=3, layout=(1, 1),
               reentrant_x=True, reentrant_y=True)
    f = d.pad(_global_field(6, 8))
    g = d.fill_halos(f)
    H = d.halo
    inner = d.interior(g)
    # west halo equals east interior columns
    np.testing.assert_allclose(g[:, H:H + 6, 0:H], inner[:, :, 8 - H:8])
    np.testing.assert_allclose(g[:, H:H + 6, H + 8:], inner[:, :, 0:H])
    # north halo equals south interior rows (reentrant y)
    np.testing.assert_allclose(g[:, H + 6:, H:H + 8], inner[:, 0:H, :])
    # corners: NW halo corner should equal interior (SE) block
    np.testing.assert_allclose(g[:, 0:H, 0:H], inner[:, 6 - H:6, 8 - H:8])


def test_local_fill_solid_wall():
    d = Domain(ni=8, nj=6, halo=2)
    f = d.pad(_global_field(6, 8)) + 1000.0  # nonzero everywhere incl halos
    g = d.fill_halos(f)
    assert np.all(np.asarray(g[:, :, :2]) == 0.0)
    assert np.all(np.asarray(g[:, :2, :]) == 0.0)
    assert np.all(np.asarray(g[:, :, -2:]) == 0.0)
    # interior untouched
    np.testing.assert_allclose(d.interior(g), d.interior(f))


@pytest.mark.parametrize("layout", [(4, 2), (2, 4), (8, 1), (1, 8), (2, 2)])
@pytest.mark.parametrize("reentrant", [(True, True), (False, False),
                                       (True, False)])
def test_shmap_fill_matches_local(layout, reentrant):
    """Distributed ppermute halo fill ≡ single-device fill (layout
    invariance of the halo layer itself — the reference's test.layout)."""
    ni, nj, H = 32, 32, 3
    rx, ry = reentrant
    d1 = Domain(ni=ni, nj=nj, halo=H, reentrant_x=rx, reentrant_y=ry)
    dn = Domain(ni=ni, nj=nj, halo=H, layout=layout,
                reentrant_x=rx, reentrant_y=ry).sharded()
    f = _global_field(nj, ni)

    ref = d1.fill_halos(d1.pad(f))

    mesh = make_mesh(layout)
    fill = shard_map(lambda a: dn.fill_halos(a), mesh=mesh,
                     in_specs=P(None, "y", "x"), out_specs=P(None, "y", "x"))
    got_blocked = jax.jit(fill)(pad_field(dn, f))
    got = unpad_field(dn, got_blocked)

    # compare interiors
    np.testing.assert_allclose(got, np.asarray(d1.interior(ref)))

    # compare full halo content per shard against the single-device run
    px, py = layout
    nil, njl = ni // px, nj // py
    gb = np.asarray(got_blocked).reshape(3, py, njl + 2 * H, px, nil + 2 * H)
    refp = np.asarray(ref)
    for by in range(py):
        for bx in range(px):
            tile = gb[:, by, :, bx, :]
            # global index of this tile's west/south padded origin
            j0, i0 = by * njl, bx * nil
            # build the expected tile from the reference padded array by
            # wrapping/zeroing, using the same convention
            exp = np.zeros_like(tile)
            for jj in range(njl + 2 * H):
                for ii in range(nil + 2 * H):
                    gj = j0 + jj - H
                    gi = i0 + ii - H
                    if rx:
                        gi_m = gi % ni
                    elif 0 <= gi < ni:
                        gi_m = gi
                    else:
                        continue
                    if ry:
                        gj_m = gj % nj
                    elif 0 <= gj < nj:
                        gj_m = gj
                    else:
                        continue
                    exp[:, jj, ii] = refp[:, H + gj_m, H + gi_m]
            np.testing.assert_allclose(tile, exp, err_msg=f"tile {by},{bx}")


def test_fill_width_subset():
    d = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    f = d.pad(_global_field(8, 8))
    g = d.fill_halos(f, width=2)
    # only the closest 2 halo rings must be valid
    H = d.halo
    inner = d.interior(g)
    np.testing.assert_allclose(g[:, H:H + 8, H - 2:H], inner[:, :, 6:8])


def test_global_reductions():
    d = Domain(ni=8, nj=4, halo=2)
    f = d.pad(_global_field(4, 8)) + 100.0  # halos also nonzero
    f = d.fill_halos(f)
    s = d.global_sum(f)
    expect = np.sum(np.asarray(d.interior(f)))
    assert np.isclose(float(s), expect)


def test_shmap_global_sum():
    layout = (2, 2)
    d = Domain(ni=8, nj=8, halo=2, layout=layout).sharded()
    f = _global_field(8, 8)
    mesh = make_mesh(layout)
    fn = shard_map(lambda a: d.global_sum(a),
                   mesh=mesh, in_specs=P(None, "y", "x"), out_specs=P())
    s = jax.jit(fn)(pad_field(d, f))
    assert np.isclose(float(s), float(jnp.sum(f)))
