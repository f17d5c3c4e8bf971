"""Multi-host distributed input loading (framework/multihost.py).

On the 8-virtual-device CPU mesh every shard is process-local, so
make_array_from_callback exercises exactly the per-shard windowed
NetCDF reads a pod host would perform; the assembled array must match
pad_field(full read) bitwise, and a shard_map consumer must see the
right local tiles.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.framework.io import write_fields
from mom6_tpu.framework.multihost import distributed_read, read_window
from mom6_tpu.parallel.domain import Domain, make_mesh, pad_field


def _write(tmp_path, shape, name="fld"):
    rng = np.random.default_rng(9)
    data = rng.standard_normal(shape)
    path = str(tmp_path / "input.nc")
    dims = ("nk", "nj", "ni")[-len(shape):]
    write_fields(path, {name: data}, dims={name: dims})
    return path, data


def test_read_window_matches_full(tmp_path):
    path, data = _write(tmp_path, (12, 16))
    w = read_window(path, "fld", 3, 9, 4, 12)
    np.testing.assert_array_equal(w, data[3:9, 4:12])


def test_distributed_read_2d(tmp_path):
    nj, ni = 16, 32
    path, data = _write(tmp_path, (nj, ni))
    layout = (4, 2)
    d = Domain(ni=ni, nj=nj, halo=4, layout=layout,
               reentrant_x=True).sharded()
    mesh = make_mesh(layout)
    arr = distributed_read(path, "fld", d, mesh)
    expect = np.asarray(pad_field(d, jnp.asarray(data)))
    np.testing.assert_array_equal(np.asarray(arr), expect)
    assert len(arr.sharding.device_set) == 8

    # a shard_map consumer sees the right local tiles
    def local_sum(f):
        return jnp.sum(d.interior(f))[None, None]

    sums = jax.jit(shard_map(local_sum, mesh=mesh,
                             in_specs=P("y", "x"),
                             out_specs=P("y", "x")))(arr)
    np.testing.assert_allclose(float(jnp.sum(sums)), data.sum(),
                               rtol=1e-12)


def test_distributed_read_3d(tmp_path):
    nk, nj, ni = 5, 16, 32
    path, data = _write(tmp_path, (nk, nj, ni))
    layout = (4, 2)
    d = Domain(ni=ni, nj=nj, halo=4, layout=layout,
               reentrant_x=True).sharded()
    mesh = make_mesh(layout)
    arr = distributed_read(path, "fld", d, mesh, nk=nk)
    expect = np.asarray(pad_field(d, jnp.asarray(data)))
    np.testing.assert_array_equal(np.asarray(arr), expect)
