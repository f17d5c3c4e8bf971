"""Time interpolation of external (file) fields inside the jitted step.

Re-design of the FMS ``time_interp_external`` infrastructure the
reference leans on for file-driven forcing
(/root/reference/config_src/drivers/solo_driver/MOM_surface_forcing.F90:677
wind_forcing_from_file, :284 time_interp_external calls; the interp
infra itself lives in FMS, outside the MOM tree).

TPU-first design: every time level of a forcing variable is loaded
once at build time, horizontally regridded to the model grid on the
host, halo-padded, and stacked into a single device array
``(nt, njh, nih)``.  ``ExternalField.at(t)`` is then a pure jittable
function of a *traced* time scalar: bracketing indices come from
``jnp.searchsorted`` against the (constant-folded) time axis and the
two levels are gathered with ``jnp.take`` — no host sync, no
recompilation as time advances, and the HBM cost is one small gather
per step instead of a host->device transfer.  Climatological
(``modulo``) time axes wrap with a phantom first-level copy appended
at ``t0 + period``.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import numpy as np
import jax.numpy as jnp

__all__ = ["ExternalField", "load_external_field", "time_unit_seconds"]

_UNIT_S = {
    "s": 1.0, "sec": 1.0, "second": 1.0, "seconds": 1.0,
    "min": 60.0, "minute": 60.0, "minutes": 60.0,
    "h": 3600.0, "hr": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
    "yr": 365.0 * 86400.0, "year": 365.0 * 86400.0,
    "years": 365.0 * 86400.0,
}


def time_unit_seconds(units: str) -> float:
    """Seconds per unit from a CF-ish time ``units`` string.

    Only the measure is used ("days since 1900-1-1" -> 86400); the
    epoch is the run's time origin, i.e. forcing-file times are taken
    relative to the start of the segment like a solo-driver run that
    begins at the file's epoch.
    """
    word = units.strip().split()[0].lower() if units.strip() else "s"
    return _UNIT_S.get(word, 1.0)


@dataclasses.dataclass(frozen=True)
class ExternalField:
    """A (possibly time-varying) field on the model grid.

    data: (nt, ...) stacked time levels (device); times: (nt,) seconds
    (host, static).  nt == 1 means a static field.  ``period`` (s)
    marks a climatological axis that wraps modulo-period.
    """
    data: jnp.ndarray
    times: np.ndarray
    period: Optional[float] = None

    def at(self, t):
        """Linear time interpolation at traced scalar ``t`` [s]."""
        nt = self.data.shape[0]
        if nt == 1:
            return self.data[0]
        times = self.times
        data = self.data
        if self.period is not None:
            t = jnp.mod(t - times[0], self.period) + times[0]
            # wrap segment: last level -> first level at t0+period
            times = np.concatenate([times, [times[0] + self.period]])
            data = jnp.concatenate([data, data[:1]], axis=0)
        tj = jnp.asarray(times, dtype=jnp.result_type(float))
        i1 = jnp.clip(jnp.searchsorted(tj, t, side="right"), 1,
                      len(times) - 1)
        i0 = i1 - 1
        t0 = jnp.take(tj, i0)
        t1 = jnp.take(tj, i1)
        w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        return ((1.0 - w) * jnp.take(data, i0, axis=0)
                + w * jnp.take(data, i1, axis=0))

    @property
    def static(self) -> bool:
        return self.data.shape[0] == 1


_TIME_NAMES = ("time", "Time", "TIME", "t")


def _find_time(nc, var) -> tuple[Optional[int], np.ndarray,
                                 Optional[float]]:
    """Locate the time dimension of ``var``; return (axis, times_s,
    period_s)."""
    for ax, dname in enumerate(var.dimensions):
        if dname in _TIME_NAMES or dname.lower().startswith("time"):
            mult, period = 1.0, None
            if dname in nc.variables:
                tv = nc.variables[dname]
                units = getattr(tv, "units", b"")
                if isinstance(units, bytes):
                    units = units.decode()
                mult = time_unit_seconds(units)
                tvals = np.asarray(tv[:], dtype=np.float64) * mult
                modulo = getattr(tv, "modulo", None)
                if modulo is not None:
                    try:
                        period = float(
                            modulo if not isinstance(modulo, bytes)
                            else modulo.decode())
                        period *= mult
                    except ValueError:
                        # FMS " " modulo: wrap over the sampled span
                        # plus one mean interval
                        dt = (np.diff(tvals).mean()
                              if tvals.size > 1 else 1.0)
                        period = float(tvals[-1] - tvals[0] + dt)
            else:
                n = var.shape[ax]
                tvals = np.arange(n, dtype=np.float64)
                period = None
            return ax, tvals, period
    return None, np.zeros(1), None


def _coord_1d(nc, names):
    for n in names:
        if n in nc.variables and np.asarray(nc.variables[n][:]).ndim == 1:
            return np.asarray(nc.variables[n][:], dtype=np.float64)
    return None


def load_external_field(path: str, name: str, grid=None,
                        stagger: str = "T", scale: float = 1.0,
                        period: Optional[float] = None,
                        dtype=None) -> ExternalField:
    """Load variable ``name`` from NetCDF ``path`` as an ExternalField
    on the model grid.

    If the file carries 1D lon/lat coordinate variables and ``grid``
    is given, each time level is bilinearly regridded to the model's
    T/Cu/Cv points (``stagger``) on the host — the A-grid file case of
    wind_forcing_from_file (MOM_surface_forcing.F90:700).  Otherwise
    the field must already match the compute domain (``ongrid``) and
    is only halo-padded.
    """
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as nc:
        if name not in nc.variables:
            raise KeyError(f"variable '{name}' not in {path}; have: "
                           + ", ".join(sorted(nc.variables)))
        var = nc.variables[name]
        taxis, times, fperiod = _find_time(nc, var)
        arr = np.array(var[:], dtype=np.float64)
        src_lon = _coord_1d(nc, ("lon", "longitude", "xh", "grid_x_T",
                                 "LON", "x"))
        src_lat = _coord_1d(nc, ("lat", "latitude", "yh", "grid_y_T",
                                 "LAT", "y"))
    if taxis is None:
        arr = arr[None]                      # (1, ny, nx)
    elif taxis != 0:
        arr = np.moveaxis(arr, taxis, 0)
    if arr.ndim != 3:
        raise ValueError(f"{name}: expected 2D(+time) field, got shape "
                         f"{arr.shape}")
    if period is None:
        period = fperiod

    if grid is not None:
        H = grid.domain.halo
        nj, ni = grid.mask2dT.shape[-2] - 2 * H, \
            grid.mask2dT.shape[-1] - 2 * H
        dst_lon, dst_lat = {
            "T": (grid.geoLonT, grid.geoLatT),
            "U": (grid.geoLonCu, grid.geoLatCu),
            "V": (grid.geoLonCv, grid.geoLatCv),
        }[stagger.upper()]
        dst_lon = np.asarray(dst_lon)
        dst_lat = np.asarray(dst_lat)
        if arr.shape[-2:] == (nj, ni):
            # ongrid: halo-pad only
            out = np.pad(arr, ((0, 0), (H, H), (H, H)), mode="edge")
        elif arr.shape[-2:] == dst_lon.shape:
            out = arr                        # already halo-padded
        else:
            if src_lon is None or src_lat is None:
                raise ValueError(
                    f"{name}: shape {arr.shape[-2:]} does not match the "
                    f"({nj},{ni}) compute domain and the file has no 1D "
                    "lon/lat coordinates to regrid from")
            from mom6_tpu.initialization.horizontal_regrid import \
                bilinear_regrid
            out = bilinear_regrid(arr, src_lon, src_lat, dst_lon,
                                  dst_lat)
    else:
        out = arr
    if scale != 1.0:
        out = out * scale
    if dtype is None:
        dtype = jnp.result_type(float)
    return ExternalField(data=jnp.asarray(out, dtype=dtype),
                         times=np.asarray(times, np.float64),
                         period=period)
