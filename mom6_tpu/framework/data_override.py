"""Data override: replace model forcing fields from a data_table.

Re-design of the FMS ``data_override`` used by the reference caps
(``call data_override('OCN', 'taux', ...)`` in
/root/reference/config_src/drivers/FMS_cap/MOM_surface_forcing_gfdl.F90;
table format per FMS data_override.F90): a ``data_table`` file in the
case directory lists fields to be replaced by file data (time
interpolated) or constants, e.g.::

    "OCN", "taux",  "u_flux", "INPUT/forcing.nc", .false., 1.0
    "OCN", "sw",    "",       "",                 .false., 50.0

columns: gridname, field (model name), file variable, file path,
ongrid flag (or an interp-method string — anything non-ongrid means
bilinear regrid from the file's lon/lat), scale factor.  Empty file
path means a spatially-constant override equal to the factor.

Overrides are applied *inside the jitted step* on top of whatever the
surface-forcing config produced, via :meth:`DataOverride.mech` /
:meth:`DataOverride.fluxes` with the traced model time.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional

import jax.numpy as jnp

from mom6_tpu.framework.interp_external import (ExternalField,
                                                load_external_field)

__all__ = ["DataOverride", "parse_data_table"]

_MECH_FIELDS = ("taux", "tauy", "p_surf")
_FLUX_FIELDS = ("sw", "lw", "latent", "sensible", "evap", "lprec",
                "fprec", "salt_flux")
# model-name aliases the reference caps use
_ALIASES = {"u_flux": "taux", "v_flux": "tauy", "sw_flux": "sw",
            "lw_flux": "lw", "t_flux": "sensible", "q_flux": "evap",
            "salt_flx": "salt_flux"}


def parse_data_table(text: str) -> list[dict]:
    """Parse data_table lines into dicts (gridname, field, file_var,
    path, ongrid, factor).  Comment lines start with #."""
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) < 6:
            continue
        unq = [re.sub(r'^["\']|["\']$', "", p) for p in parts]
        ongrid = unq[4].lower() in (".true.", "true", "t", ".t.")
        try:
            factor = float(unq[5])
        except ValueError:
            factor = 1.0
        rows.append(dict(gridname=unq[0].upper(), field=unq[1],
                         file_var=unq[2], path=unq[3], ongrid=ongrid,
                         factor=factor))
    return rows


@dataclasses.dataclass
class DataOverride:
    """Per-field overrides for the ocean ('OCN') grid."""
    fields: dict   # model field name -> ExternalField | float

    @classmethod
    def build(cls, table_path: str, grid, indir: str = ".",
              mask=None) -> Optional["DataOverride"]:
        if not os.path.exists(table_path):
            return None
        rows = parse_data_table(open(table_path).read())
        fields = {}
        for r in rows:
            if r["gridname"] not in ("OCN", "OCEAN"):
                continue
            name = _ALIASES.get(r["field"], r["field"])
            if name not in _MECH_FIELDS + _FLUX_FIELDS:
                continue
            if not r["path"]:
                fields[name] = float(r["factor"])
                continue
            path = r["path"]
            if not os.path.isabs(path):
                path = os.path.join(indir, path)
            stag = "U" if name == "taux" else \
                "V" if name == "tauy" else "T"
            fields[name] = load_external_field(
                path, r["file_var"] or r["field"], grid=grid,
                stagger=stag, scale=r["factor"])
        return cls(fields=fields) if fields else None

    @property
    def time_varying(self) -> bool:
        return any(isinstance(f, ExternalField) and not f.static
                   for f in self.fields.values())

    def _value(self, name, t, like):
        f = self.fields[name]
        if isinstance(f, ExternalField):
            return f.at(t)
        return jnp.full_like(like, f) if like is not None else f

    def mech(self, forces, t, grid):
        """Override mech-forcing fields (jit-safe)."""
        repl = {}
        for name in _MECH_FIELDS:
            if name in self.fields:
                like = getattr(forces, name)
                if like is None:
                    like = grid.mask2dT * 0.0
                mask = {"taux": grid.mask2dCu, "tauy": grid.mask2dCv,
                        "p_surf": grid.mask2dT}[name]
                repl[name] = self._value(name, t, like) * mask
        return dataclasses.replace(forces, **repl) if repl else forces

    def fluxes(self, fluxes, t, grid):
        from mom6_tpu.core.forcing import Fluxes
        if fluxes is None:
            fluxes = Fluxes()
        repl = {}
        for name in _FLUX_FIELDS:
            if name in self.fields:
                like = getattr(fluxes, name)
                if like is None:
                    like = grid.mask2dT * 0.0
                repl[name] = self._value(name, t, like) * grid.mask2dT
        return dataclasses.replace(fluxes, **repl) if repl else fluxes
