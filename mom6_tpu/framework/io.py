"""File IO: NetCDF-3 read/write for grids, ICs and diagnostics.

Re-design of the reference's IO stack (MOM_io.F90 / MOM_io_file.F90 /
MOM_netcdf.F90 over the FMS IO infra): host-side NetCDF-3 classic
files via scipy.io.netcdf_file.  Covers the needs of file-driven
initialization (tc4-class: topography, thickness, T/S profiles,
sponges) and restart/diagnostic output; decomposed IO layouts gather
to host first (the redistribution of MOM_domain_infra.F90:1203 is the
host gather in this design).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

__all__ = ["write_fields", "read_field", "read_fields", "field_names",
           "write_fields_decomposed", "combine_decomposed"]


def write_fields(path: str, fields: dict[str, np.ndarray],
                 dims: dict[str, tuple[str, ...]] | None = None,
                 attrs: dict[str, dict] | None = None,
                 global_attrs: dict | None = None) -> None:
    """Write named arrays to a NetCDF-3 file.

    dims: optional per-field dimension names (defaults generated);
    attrs: optional per-field attribute dicts (units, long_name);
    global_attrs: optional file-level attributes."""
    from scipy.io import netcdf_file
    dims = dims or {}
    attrs = attrs or {}
    with netcdf_file(path, "w") as nc:
        for k, v in (global_attrs or {}).items():
            setattr(nc, k, v.encode() if isinstance(v, str) else v)
        made: dict[tuple[str, int], str] = {}

        def dim_names(name, shape):
            want = dims.get(name)
            out = []
            for ax, n in enumerate(shape):
                if want and ax < len(want):
                    dn = want[ax]
                    if dn not in nc.dimensions:
                        nc.createDimension(dn, n)
                else:
                    key = ("ax", n)
                    if key not in made:
                        dn = f"dim_{len(made)}_{n}"
                        nc.createDimension(dn, n)
                        made[key] = dn
                    dn = made[key]
                out.append(dn)
            return tuple(out)

        for name, arr in fields.items():
            arr = np.asarray(arr)
            var = nc.createVariable(name, arr.dtype.newbyteorder("="),
                                    dim_names(name, arr.shape))
            var[:] = arr
            for k, v in attrs.get(name, {}).items():
                setattr(var, k, v.encode() if isinstance(v, str) else v)


def read_field(path: str, name: str) -> np.ndarray:
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        if name not in nc.variables:
            raise KeyError(
                f"variable '{name}' not in {path}; available: "
                + ", ".join(sorted(nc.variables)))
        arr = np.array(nc.variables[name][:])
        # NetCDF-3 stores big-endian; return native order for jax
        return arr.astype(arr.dtype.newbyteorder("="))


def read_fields(path: str, names) -> dict[str, np.ndarray]:
    return {n: read_field(path, n) for n in names}


def read_attrs(path: str) -> dict:
    """File-level (global) attributes of a NetCDF-3 file."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        return dict(nc._attributes)


def field_names(path: str) -> list[str]:
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        return sorted(nc.variables)


def write_fields_decomposed(path: str, fields: dict[str, np.ndarray],
                            io_layout: tuple[int, int],
                            dims: dict | None = None,
                            attrs: dict | None = None) -> list[str]:
    """Decomposed output (the FMS IO_LAYOUT): split each (..., nj, ni)
    field into io_layout=(nx, ny) tiles and write ``path.NNNN`` files
    with tile-offset attributes, the mppnccombine input convention
    (MOM_domain_infra.F90 IO domains).  Returns the file list."""
    nx, ny = io_layout
    sample = next(iter(fields.values()))
    nj, ni = np.asarray(sample).shape[-2:]
    if ni % nx or nj % ny:
        raise ValueError(f"fields ({nj},{ni}) not divisible by "
                         f"IO_LAYOUT ({nx},{ny})")
    nil, njl = ni // nx, nj // ny
    paths = []
    for by in range(ny):
        for bx in range(nx):
            pe = by * nx + bx
            tile = {k: np.asarray(v)[..., by * njl:(by + 1) * njl,
                                     bx * nil:(bx + 1) * nil]
                    for k, v in fields.items()}
            p = f"{path}.{pe:04d}"
            a = dict(attrs or {})
            for k in tile:
                a.setdefault(k, {})
                a[k] = dict(a[k], domain_decomposition=np.asarray(
                    [ni, nj, bx * nil, by * njl], np.int32))
            write_fields(p, tile, dims=dims, attrs=a)
            paths.append(p)
    return paths


def combine_decomposed(path: str, io_layout: tuple[int, int]
                       ) -> dict[str, np.ndarray]:
    """Reassemble ``path.NNNN`` tiles into global arrays — the
    mppnccombine analog."""
    nx, ny = io_layout
    tiles = [read_fields(f"{path}.{pe:04d}",
                         field_names(f"{path}.{pe:04d}"))
             for pe in range(nx * ny)]
    out = {}
    for name, t0 in tiles[0].items():
        njl, nil = t0.shape[-2:]
        full = np.zeros(t0.shape[:-2] + (njl * ny, nil * nx), t0.dtype)
        for by in range(ny):
            for bx in range(nx):
                full[..., by * njl:(by + 1) * njl,
                     bx * nil:(bx + 1) * nil] = \
                    tiles[by * nx + bx][name]
        out[name] = full
    return out
