"""Decomposed IO layouts (FMS IO_LAYOUT/mppnccombine analog) and
multi-slice (device-sharded) ensemble propagation."""

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.framework.io import (write_fields_decomposed,
                                   combine_decomposed)


def test_decomposed_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fields = {"h": rng.random((5, 12, 16)),
              "ssh": rng.random((12, 16))}
    base = str(tmp_path / "out.nc")
    paths = write_fields_decomposed(base, fields, (4, 2))
    assert len(paths) == 8
    back = combine_decomposed(base, (4, 2))
    np.testing.assert_allclose(back["h"], fields["h"])
    np.testing.assert_allclose(back["ssh"], fields["ssh"])


def test_decomposed_io_offsets_recorded(tmp_path):
    from scipy.io import netcdf_file
    fields = {"q": np.arange(48.0).reshape(6, 8)}
    base = str(tmp_path / "q.nc")
    write_fields_decomposed(base, fields, (2, 2))
    with netcdf_file(base + ".0003", "r") as nc:
        dd = np.array(nc.variables["q"].domain_decomposition)
        np.testing.assert_array_equal(dd, [8, 6, 4, 3])


def test_sharded_ensemble_matches_vmap():
    from mom6_tpu.oda.ensemble import (propagate_ensemble,
                                       propagate_ensemble_sharded)
    ne = 8

    def step(s):
        return {"x": s["x"] * 0.9 + 1.0,
                "y": s["y"] + jnp.sum(s["x"], axis=(-2, -1))[..., None,
                                                            None]}
    rng = np.random.default_rng(1)
    states = {"x": jnp.asarray(rng.random((ne, 4, 4))),
              "y": jnp.asarray(rng.random((ne, 1, 1)))}
    a = propagate_ensemble(step, states, n_steps=3)
    b = propagate_ensemble_sharded(step, states, n_steps=3)
    np.testing.assert_allclose(np.asarray(b["x"]), np.asarray(a["x"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b["y"]), np.asarray(a["y"]),
                               rtol=1e-12)
    # members really live on all 8 devices
    assert len(b["x"].sharding.device_set) == 8
