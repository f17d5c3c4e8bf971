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

__all__ = ["write_fields", "read_field", "read_fields", "field_names"]


def write_fields(path: str, fields: dict[str, np.ndarray],
                 dims: dict[str, tuple[str, ...]] | None = None,
                 attrs: dict[str, dict] | None = None) -> None:
    """Write named arrays to a NetCDF-3 file.

    dims: optional per-field dimension names (defaults generated);
    attrs: optional per-field attribute dicts (units, long_name)."""
    from scipy.io import netcdf_file
    dims = dims or {}
    attrs = attrs or {}
    with netcdf_file(path, "w") as nc:
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


def field_names(path: str) -> list[str]:
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        return sorted(nc.variables)
