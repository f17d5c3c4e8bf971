"""Multi-host distributed input loading.

Re-design of the reference's decomposed input path (MOM_io /
mpp_read distributed reads, MOM_domain_infra.F90 domain2D IO
layouts): on a multi-host TPU pod no host can (or should) materialize
a global forcing/initialization field.  The TPU-native pattern is
``jax.make_array_from_callback``: the target array is declared with
its global shape and NamedSharding, and JAX invokes the callback only
for the shards addressable by the local process — so each host
mmap-reads just its own windows of the NetCDF file and the resulting
jax.Array is globally sharded without any host ever holding the full
field or any cross-host gather traffic.

The layout produced matches the model's resident distributed state
(the pad_field blocked-halo layout of parallel/domain.py): each
device block is its halo-padded local tile with zeroed halos, to be
filled by the ppermute exchange inside shard_map.

On a single host this degrades gracefully: all shards are local and
the behavior is identical to pad_field(read_field(...)), which is how
the 8-virtual-device tests validate the path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mom6_tpu.parallel.domain import Domain

__all__ = ["distributed_read", "read_window"]


def read_window(path: str, name: str, j0: int, j1: int, i0: int,
                i1: int, k=None) -> np.ndarray:
    """Read one (j, i) window of a NetCDF variable without loading
    the full field (scipy's netcdf_file memory-maps, so the slice
    touches only the window's pages).  ``k`` optionally selects a
    leading-axis range (k0, k1) for 3-D fields."""
    from scipy.io import netcdf_file
    nc = netcdf_file(path, "r", mmap=True)
    try:
        var = nc.variables[name]
        if var.data.ndim == 2:
            out = np.array(var.data[j0:j1, i0:i1])
        elif k is None:
            out = np.array(var.data[:, j0:j1, i0:i1])
        else:
            out = np.array(var.data[k[0]:k[1], j0:j1, i0:i1])
        del var                    # release the mmap view pre-close
    finally:
        nc.close()
    if out.dtype.byteorder == ">":
        out = out.astype(out.dtype.newbyteorder("="))
    return out


def distributed_read(path: str, name: str, domain: Domain, mesh,
                     nk: int | None = None,
                     dtype=jnp.float64) -> jax.Array:
    """A globally sharded jax.Array of a NetCDF field, each shard read
    locally by its owning process.

    The result uses the blocked-padded layout of ``pad_field``: shape
    (py*njh, px*nih) (or (nk, ...) when ``nk`` is given) sharded
    P('y','x'), with each device block the halo-padded local tile.
    """
    px, py = domain.layout
    H = domain.halo
    njl, nil = domain.njl, domain.nil
    njh, nih = njl + 2 * H, nil + 2 * H
    lead = () if nk is None else (nk,)
    gshape = lead + (py * njh, px * nih)
    spec = P("y", "x") if nk is None else P(None, "y", "x")
    sharding = NamedSharding(mesh, spec)

    def cb(index):
        # index: global slices of this shard within gshape
        jsl, isl = index[-2], index[-1]
        jy = (jsl.start or 0) // njh
        ix = (isl.start or 0) // nih
        blk = read_window(path, name, jy * njl, (jy + 1) * njl,
                          ix * nil, (ix + 1) * nil)
        pads = [(0, 0)] * (blk.ndim - 2) + [(H, H), (H, H)]
        blk = np.pad(blk.astype(dtype), pads)
        # the shard may span several blocks if devices outnumber the
        # layout in one axis; this path keeps one block per shard
        want = tuple((s.stop or gshape[d]) - (s.start or 0)
                     for d, s in enumerate(index))
        if blk.shape != want:
            raise ValueError(
                f"shard shape {want} != block {blk.shape}; the mesh "
                f"must match the Domain layout {domain.layout}")
        return blk

    return jax.make_array_from_callback(gshape, sharding, cb)
