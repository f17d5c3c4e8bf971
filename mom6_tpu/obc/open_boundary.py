"""Open boundary conditions.

Re-design of /root/reference/src/core/MOM_open_boundary.F90: the
``OBC_SEGMENT_%03d`` spec strings ("J=N,I=N:0,FLATHER,ORLANSKI", tc3
style) parse into edge segments; the barotropic solver applies the
Flather (1976) radiation at open faces

    ubt = 0.5*( (u_inlet + u_ext) ± (Cg/D)*(ssh_in − ssh_ext) )

(MOM_barotropic.F90:3028 apply_velocity_OBCs, with the CFL-upwinded
inlet simplified to the adjacent interior values), and the baroclinic
fields get zero-gradient (the v1 stand-in for Orlanski radiation)
through halo extension along open edges.

The current build supports whole-edge and partial (sub-edge strip)
segments on any of the four domain edges with FLATHER / ORLANSKI /
GRADIENT schemes, constant (``U=value:…``) or file-profile
(``U=file:name.nc(var)``, time-interpolated inside the jitted step
when the file has multiple records) external data, tracer
reservoirs with both in/out relaxation length scales, and decomposed
layouts: the per-edge 2D ownership masks make every edge operator an
identity on shards that do not own the boundary, so the same program
runs under shard_map on any layout (see blockify_obc).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mom6_tpu.parallel.domain import Domain

__all__ = ["Segment", "OpenBoundaries", "parse_segments",
           "build_open_boundaries", "build_obc_data_interp",
           "open_grid_masks", "blockify_obc"]


@dataclasses.dataclass(frozen=True)
class Segment:
    direction: str            # 'N' | 'S' | 'E' | 'W'
    flather: bool = True
    orlanski: bool = True
    gradient: bool = False
    # NUDGED radiation (OBC_SEGMENT_xxx_VELOCITY_NUDGING_TIMESCALES,
    # MOM_open_boundary.F90:1429): baroclinic velocities relax toward
    # the segment data with separate inflow/outflow timescales [s]
    nudged: bool = False
    tau_in: float = 0.0
    tau_out: float = 0.0
    u_ext: object = 0.0       # float, or along-edge profile array
    v_ext: object = 0.0
    ssh_ext: object = 0.0
    lo: int | None = None     # perpendicular global range [lo, hi);
    hi: int | None = None     # None = the whole edge
    tracer_ext: dict | None = None   # external tracer values by name
    # time-varying file data: key ('U'|'V'|'SSH') →
    # (series (nt[,len]), times_s, period_s); None when all static
    data_series: dict | None = None


def _load_segment_var(indir: str, fname: str, var: str):
    """Read a segment-data variable (``file:name.nc(var)`` refs,
    MOM_open_boundary.F90 segment fields): the first time record,
    depth-averaged if a vertical axis remains, squeezed to an
    along-edge profile (or a scalar)."""
    import os
    import numpy as np
    from mom6_tpu.framework.io import read_field
    arr = np.asarray(read_field(os.path.join(indir, fname), var),
                     dtype=np.float64)
    arr = np.squeeze(arr)
    if arr.ndim >= 3:
        arr = arr[0]              # first time record
    if arr.ndim == 2:
        arr = arr.mean(axis=0)    # depth-average for the BT fields
    return float(arr) if arr.ndim == 0 else arr


def _load_segment_series(indir: str, fname: str, var: str):
    """Read a segment-data variable keeping its time axis: returns
    (series, times_s, period_s) with series shaped (nt,) for scalars
    or (nt, edge_len) for profiles, depth-averaged like the static
    loader (per-segment external data via time_interp,
    MOM_open_boundary.F90:119-146)."""
    import os
    import numpy as np
    from scipy.io import netcdf_file
    from mom6_tpu.framework.interp_external import _find_time
    with netcdf_file(os.path.join(indir, fname), "r",
                     mmap=False) as nc:
        v = nc.variables[var]
        taxis, times, period = _find_time(nc, v)
        arr = np.array(v[:], dtype=np.float64)
    if taxis is None:
        arr, times = arr[None], np.zeros(1)
    elif taxis != 0:
        arr = np.moveaxis(arr, taxis, 0)
    # drop singleton cross-segment axes, then depth-average whatever
    # vertical axis remains (the static loader's arr.mean(axis=0))
    arr = arr.reshape((arr.shape[0],)
                      + tuple(n for n in arr.shape[1:] if n != 1))
    while arr.ndim > 2:
        arr = arr.mean(axis=1)
    return arr, times, period


def parse_segments(pf, indir: str = ".") -> list[Segment]:
    """Read OBC_NUMBER_OF_SEGMENTS + OBC_SEGMENT_%03d (+_DATA).

    _DATA entries support ``KEY=value:const`` and
    ``KEY=file:name.nc(var)``: the first record becomes the static
    edge value; files with multiple records also fill
    ``Segment.data_series`` for time interpolation inside the step
    (see build_obc_data_interp)."""
    n = pf.get("OBC_NUMBER_OF_SEGMENTS", int, 0)
    segs = []
    for i in range(1, n + 1):
        spec = pf.get(f"OBC_SEGMENT_{i:03d}", str, "")
        if not spec:
            continue
        up = spec.upper().replace(" ", "")
        m = re.match(r"(I|J)=(0|N)", up)
        if not m:
            raise ValueError(f"Cannot parse OBC segment spec '{spec}'")
        axis, pos = m.group(1), m.group(2)
        # perpendicular range, e.g. "J=N,I=3:10" (reversed and "N"
        # endpoints normalized); a full-span range stays None
        lo = hi = None
        rm = re.search(r",(?:I|J)=(N|-?\d+):(N|-?\d+)", up)
        if rm and not (set(rm.groups()) == {"0", "N"}
                       or set(rm.groups()) == {"N", "0"}):
            a_, b_ = rm.groups()
            if "N" not in (a_, b_):
                lo, hi = sorted((int(a_), int(b_)))
            else:
                v = int(b_ if a_ == "N" else a_)
                lo, hi = v, None      # v..edge end
        if axis == "I":
            direction = "W" if pos == "0" else "E"
        else:
            direction = "S" if pos == "0" else "N"
        data = pf.get(f"OBC_SEGMENT_{i:03d}_DATA", str, "")
        vals = {"U": 0.0, "V": 0.0, "SSH": 0.0}
        tracer_ext = {}
        data_series = {}
        for part in data.split(","):
            dm = re.match(r'\s*(\w+)=value:([-0-9.eE+]+)', part)
            fm = re.match(r'\s*(\w+)=file:([^(]+)\((\w+)\)', part)
            if dm:
                key, v = dm.group(1), float(dm.group(2))
            elif fm:
                key = fm.group(1)
                series, times, period = _load_segment_series(
                    indir, fm.group(2), fm.group(3))
                v0 = series[0]
                v = float(v0) if np.ndim(v0) == 0 else v0
                if series.shape[0] > 1 and key in vals:
                    data_series[key] = (series, times, period)
            else:
                continue
            if key in vals:
                vals[key] = v
            else:
                # external tracer concentration for the reservoirs;
                # TEMP/SALT map to the T/S advection names
                name = {"TEMP": "T", "PTEMP": "T",
                        "SALT": "S"}.get(key, key.lower())
                tracer_ext[name] = v
        nudged = "NUDGED" in up
        tau_in = tau_out = 0.0
        if nudged:
            tn = pf.get(f"OBC_SEGMENT_{i:03d}"
                        "_VELOCITY_NUDGING_TIMESCALES", list,
                        [0.0, 0.0], units="days")
            tau_in = float(tn[0]) * 86400.0
            tau_out = float(tn[1]) * 86400.0 if len(tn) > 1 else tau_in
        segs.append(Segment(direction=direction,
                            flather="FLATHER" in up,
                            orlanski="ORLANSKI" in up,
                            gradient="GRADIENT" in up,
                            nudged=nudged, tau_in=tau_in,
                            tau_out=tau_out,
                            u_ext=vals["U"], v_ext=vals["V"],
                            ssh_ext=vals["SSH"], lo=lo, hi=hi,
                            tracer_ext=tracer_ext,
                            data_series=data_series or None))
    return segs


def build_obc_data_interp(pf, domain: Domain, obc: "OpenBoundaries",
                          indir: str = "."):
    """Time-interpolated OBC segment data (the reference's
    per-segment external data via time_interp,
    MOM_open_boundary.F90:119-146 / update_OBC_segment_data): when any
    ``KEY=file:...`` segment datum has multiple time records, returns
    ``fn(obc, grid, h, t) -> obc`` that replaces the affected
    ssh_*/u_*/v_* edge fields with values linearly interpolated to the
    traced model time.  Returns None when all segment data are static.

    TPU framing: every time level is painted onto the edge's 2D field
    at build time; inside jit the interpolation is a searchsorted +
    two gathers on the stacked (nt, njh, nih) array (the
    interp_external pattern), so time-varying boundaries never
    retrace."""
    segs = parse_segments(pf, indir)
    if not any(s.data_series for s in segs):
        return None
    from mom6_tpu.framework.interp_external import ExternalField
    H = domain.halo
    ni, nj = domain.ni, domain.nj
    extent = {"W": nj, "E": nj, "S": ni, "N": ni}
    field_of = {("W", "U"): "u_w", ("E", "U"): "u_e",
                ("S", "V"): "v_s", ("N", "V"): "v_n",
                ("W", "SSH"): "ssh_w", ("E", "SSH"): "ssh_e",
                ("S", "SSH"): "ssh_s", ("N", "SSH"): "ssh_n"}
    stacks = {}   # field -> (np stack (nt,njh,nih), times, period)
    for s in segs:
        for key, (series, times, period) in (s.data_series
                                             or {}).items():
            fname = field_of.get((s.direction, key))
            if fname is None:
                continue
            base = getattr(obc, fname)
            base2d = np.asarray(base) * np.ones((nj + 2 * H,
                                                 ni + 2 * H))
            n = extent[s.direction]
            lo = 0 if s.lo is None else max(0, s.lo)
            hi = n if s.hi is None else min(n, s.hi)
            whole = s.lo is None and s.hi is None
            plo, phi = (0, n + 2 * H) if whole else (H + lo, H + hi)
            nt = series.shape[0]
            if fname in stacks:
                stack, t_prev, p_prev = stacks[fname]
                if stack.shape[0] != nt \
                        or not np.array_equal(t_prev, times):
                    raise ValueError(
                        f"OBC segment data for {fname}: segments on "
                        "the same edge must share one time axis")
            else:
                stack = np.repeat(base2d[None], nt, axis=0)
            vals = series if series.ndim == 2 \
                else np.repeat(series[:, None], phi - plo, axis=1)
            if vals.shape[1] == n:           # full-edge profile
                vals = vals[:, lo:hi] if not whole \
                    else np.pad(vals, ((0, 0), (H, H)), mode="edge")
            elif vals.shape[1] != phi - plo:
                raise ValueError(
                    f"{fname}: segment data profile length "
                    f"{vals.shape[1]} matches neither the segment "
                    f"extent {phi - plo} nor the edge length {n}")
            if s.direction in ("W", "E"):
                stack[:, plo:phi, :] = vals[:, :, None]
            else:
                stack[:, :, plo:phi] = vals[:, None, :]
            stacks[fname] = (stack, times, period)
    efs = {f: ExternalField(jnp.asarray(st), times=t, period=p)
           for f, (st, t, p) in stacks.items()}

    def update(obc, grid, h, t):
        return dataclasses.replace(
            obc, **{f: ef.at(t) for f, ef in efs.items()})
    return update


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpenBoundaries:
    """Precomputed masks + external data for whole-edge segments."""
    # which edges are open (static python bools)
    open_w: bool = dataclasses.field(metadata=dict(static=True))
    open_e: bool = dataclasses.field(metadata=dict(static=True))
    open_s: bool = dataclasses.field(metadata=dict(static=True))
    open_n: bool = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    nil: int = dataclasses.field(metadata=dict(static=True))
    njl: int = dataclasses.field(metadata=dict(static=True))
    # external data per edge: scalars, or (njh, nih) fields painted
    # per segment (file-profile data varies along the edge)
    ssh_w: object = 0.0
    ssh_e: object = 0.0
    ssh_s: object = 0.0
    ssh_n: object = 0.0
    u_w: object = 0.0
    u_e: object = 0.0
    v_s: object = 0.0
    v_n: object = 0.0
    # per-edge ownership masks, (njh, nih) [blockified on decomposed
    # layouts]: 1 exactly at the cells this edge's operators may
    # modify (boundary face + halo band, restricted to the segment's
    # open strip).  Off the boundary-owning shard every written cell
    # reads mask 0, so the same program is a no-op there — the
    # shard-map-friendly replacement for segment-owning PE lists
    # (MOM_open_boundary.F90 open_boundary_config + mpp domains).
    strip_w: jnp.ndarray | None = None
    strip_e: jnp.ndarray | None = None
    strip_s: jnp.ndarray | None = None
    strip_n: jnp.ndarray | None = None
    # per-edge velocity-nudging timescales [s] (0 = not nudged)
    tau_in_w: float = dataclasses.field(default=0.0,
                                        metadata=dict(static=True))
    tau_out_w: float = dataclasses.field(default=0.0,
                                         metadata=dict(static=True))
    tau_in_e: float = dataclasses.field(default=0.0,
                                        metadata=dict(static=True))
    tau_out_e: float = dataclasses.field(default=0.0,
                                         metadata=dict(static=True))
    tau_in_s: float = dataclasses.field(default=0.0,
                                        metadata=dict(static=True))
    tau_out_s: float = dataclasses.field(default=0.0,
                                         metadata=dict(static=True))
    tau_in_n: float = dataclasses.field(default=0.0,
                                        metadata=dict(static=True))
    tau_out_n: float = dataclasses.field(default=0.0,
                                         metadata=dict(static=True))
    # OBC_RADIATION_MAX: cap on the nondimensional Orlanski radiation
    # CFL rx (MOM_open_boundary.F90:629,2322-2363)
    rx_max: float = dataclasses.field(default=10.0,
                                      metadata=dict(static=True))
    # tracer-reservoir length scales [m]
    # (OBC_TRACER_RESERVOIR_LENGTH_SCALE_OUT / _IN)
    res_len_out: float = dataclasses.field(
        default=1.0e4, metadata=dict(static=True))
    res_len_in: float = dataclasses.field(
        default=3.0e5, metadata=dict(static=True))
    # external tracer values from segment DATA, as nested tuples to
    # stay hashable for jit: (("E", (("T", 10.0), ...)), ...)
    tracer_ext: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    def _xval(self, v, col):
        """External datum at a W/E boundary column: per-row profile
        when the edge carries a painted 2D field, else the scalar."""
        return v[..., :, col] if getattr(v, "ndim", 0) == 2 else v

    def _yval(self, v, row):
        return v[..., row, :] if getattr(v, "ndim", 0) == 2 else v

    def _blend_x(self, a, cols, val, strip):
        """Set a[..., :, cols] = val where the W/E mask is open."""
        if strip is None:
            return a.at[..., :, cols].set(val)
        w = strip[:, cols]
        return a.at[..., :, cols].set(
            jnp.where(w > 0, val, a[..., :, cols]))

    def _blend_y(self, a, rows, val, strip):
        if strip is None:
            return a.at[..., rows, :].set(val)
        return a.at[..., rows, :].set(
            jnp.where(strip[rows, :] > 0, val, a[..., rows, :]))

    # -- halo extension (zero-gradient through open edges) -------------
    def extend(self, f):
        """Copy the interior edge value into all halo cells beyond each
        open edge (for any field kind; the baroclinic zero-gradient
        radiation and the thickness/tracer no-gradient inflow)."""
        H, ni, nj = self.halo, self.nil, self.njl

        def ext(a):
            if self.open_w:
                a = self._blend_x(a, slice(0, H), a[..., :, H:H + 1],
                                  self.strip_w)
            if self.open_e:
                a = self._blend_x(a, slice(H + ni, None),
                                  a[..., :, H + ni - 1:H + ni],
                                  self.strip_e)
            if self.open_s:
                a = self._blend_y(a, slice(0, H), a[..., H:H + 1, :],
                                  self.strip_s)
            if self.open_n:
                a = self._blend_y(a, slice(H + nj, None),
                                  a[..., H + nj - 1:H + nj, :],
                                  self.strip_n)
            return a
        return jax.tree.map(ext, f)

    # -- barotropic Flather update -------------------------------------
    def apply_flather_u(self, ubt, eta, D_u, g: float):
        """Set ubt at W/E boundary faces by Flather radiation.

        The E boundary face of the eastmost interior cell is at padded
        x-index H+nil-1... no: faces live at the cell index (east face
        of cell i at index i), so the open E boundary face is at
        H+nil-1's east = index H+nil-1?  The E boundary face is the
        east face of the last interior cell: index H+nil-1.  The W
        boundary face is the west face of the first interior cell:
        index H-1 (first halo column)."""
        H, ni = self.halo, self.nil
        if not (self.open_w or self.open_e):
            return ubt
        cg = jnp.sqrt(g * jnp.maximum(D_u, 1e-10))
        if self.open_e:
            iE = H + ni - 1
            ssh_in = eta[..., :, iE]              # eastmost interior cell
            u_inlet = ubt[..., :, iE - 1]
            val = 0.5 * ((u_inlet + self._xval(self.u_e, iE))
                         + (cg[..., :, iE] / jnp.maximum(D_u[..., :, iE],
                                                         1e-10))
                         * (ssh_in - self._xval(self.ssh_e, iE)))
            ubt = self._blend_x(ubt, iE, val, self.strip_e)
        if self.open_w:
            iW = H - 1
            ssh_in = eta[..., :, H]               # westmost interior cell
            u_inlet = ubt[..., :, H]
            val = 0.5 * ((u_inlet + self._xval(self.u_w, iW))
                         + (cg[..., :, iW] / jnp.maximum(D_u[..., :, iW],
                                                         1e-10))
                         * (self._xval(self.ssh_w, iW) - ssh_in))
            ubt = self._blend_x(ubt, iW, val, self.strip_w)
        return ubt

    def apply_flather_v(self, vbt, eta, D_v, g: float):
        H, nj = self.halo, self.njl
        if not (self.open_s or self.open_n):
            return vbt
        cg = jnp.sqrt(g * jnp.maximum(D_v, 1e-10))
        if self.open_n:
            jN = H + nj - 1
            ssh_in = eta[..., H + nj - 1, :]
            v_inlet = vbt[..., jN - 1, :]
            val = 0.5 * ((v_inlet + self._yval(self.v_n, jN))
                         + (cg[..., jN, :] / jnp.maximum(D_v[..., jN, :],
                                                         1e-10))
                         * (ssh_in - self._yval(self.ssh_n, jN)))
            vbt = self._blend_y(vbt, jN, val, self.strip_n)
        if self.open_s:
            jS = H - 1
            ssh_in = eta[..., H, :]
            v_inlet = vbt[..., H, :]
            val = 0.5 * ((v_inlet + self._yval(self.v_s, jS))
                         + (cg[..., jS, :] / jnp.maximum(D_v[..., jS, :],
                                                         1e-10))
                         * (self._yval(self.ssh_s, jS) - ssh_in))
            vbt = self._blend_y(vbt, jS, val, self.strip_s)
        return vbt


    # -- Orlanski radiation for baroclinic velocities ------------------
    @staticmethod
    def _nudge(val, ext, outflow, tau_in, tau_out, dt):
        """Relax the radiated boundary value toward the segment data
        with separate inflow/outflow timescales (the nudged branch of
        radiation_open_bdry_conds, MOM_open_boundary.F90); implicit in
        dt/tau so any timescale (including tau << dt) is stable."""
        if dt <= 0.0 or (tau_in <= 0.0 and tau_out <= 0.0):
            return val
        r_in = dt / tau_in if tau_in > 0.0 else 0.0
        r_out = dt / tau_out if tau_out > 0.0 else 0.0
        r = jnp.where(outflow, r_out, r_in)
        fac = r / (1.0 + r)
        return val + fac * (ext - val)

    def radiate_u(self, u_new, u_old, dt: float = 0.0):
        """Orlanski (1976) radiation at open E/W faces: the phase
        speed is estimated from the interior solution one face in,
        rx = (φ_old−φ_new)/(φ_old−φ_old_in) clipped to [0,1], and
        φ_b^{n+1} = (φ_b^n + rx φ_{b-1}^{n+1})/(1+rx)
        (radiation_open_bdry_conds, MOM_open_boundary.F90), plus the
        optional NUDGED relaxation toward the segment data."""
        H, ni = self.halo, self.nil
        eps = 1e-30

        def rad(iB, i1, i2, tau_in, tau_out):
            num = u_old[..., :, i1] - u_new[..., :, i1]
            den = u_old[..., :, i1] - u_old[..., :, i2]
            rx = jnp.clip(num / (den + jnp.where(jnp.abs(den) > eps,
                                                 0.0, eps)), 0.0,
                          self.rx_max)
            val = (u_old[..., :, iB] + rx * u_new[..., :, i1]) \
                / (1.0 + rx)
            east = iB >= H + ni - 1
            ext = self._xval(self.u_e if east else self.u_w, iB)
            # outflow = outward radiation (rx > 0), matching the
            # reference's dhdt*dhdx criterion rather than the sign of
            # the boundary velocity itself
            val = self._nudge(val, ext, rx > 0.0,
                              tau_in, tau_out, dt)
            strip = self.strip_e if east else self.strip_w
            return self._blend_x(u_new, iB, val, strip)

        if self.open_e:
            iE = H + ni - 1
            u_new = rad(iE, iE - 1, iE - 2,
                        self.tau_in_e, self.tau_out_e)
        if self.open_w:
            iW = H - 1
            u_new = rad(iW, iW + 1, iW + 2,
                        self.tau_in_w, self.tau_out_w)
        return u_new

    def radiate_v(self, v_new, v_old, dt: float = 0.0):
        H, nj = self.halo, self.njl
        eps = 1e-30

        def rad(jB, j1, j2, tau_in, tau_out):
            num = v_old[..., j1, :] - v_new[..., j1, :]
            den = v_old[..., j1, :] - v_old[..., j2, :]
            rx = jnp.clip(num / (den + jnp.where(jnp.abs(den) > eps,
                                                 0.0, eps)), 0.0,
                          self.rx_max)
            val = (v_old[..., jB, :] + rx * v_new[..., j1, :]) \
                / (1.0 + rx)
            north = jB >= H + nj - 1
            ext = self._yval(self.v_n if north else self.v_s, jB)
            val = self._nudge(val, ext, rx > 0.0,
                              tau_in, tau_out, dt)
            strip = self.strip_n if north else self.strip_s
            return self._blend_y(v_new, jB, val, strip)

        if self.open_n:
            jN = H + nj - 1
            v_new = rad(jN, jN - 1, jN - 2,
                        self.tau_in_n, self.tau_out_n)
        if self.open_s:
            jS = H - 1
            v_new = rad(jS, jS + 1, jS + 2,
                        self.tau_in_s, self.tau_out_s)
        return v_new

    # -- tracer reservoirs ---------------------------------------------
    def init_tracer_reservoirs(self, tracers: dict) -> dict:
        """Per-edge reservoir values seeded from the interior edge
        cells (update_segment_tracer_reservoirs,
        MOM_open_boundary.F90:5517 analog); segment-DATA external
        values (e.g. ``TEMP=value:10``) override the seed for that
        tracer on that edge.  Each tracer maps to a dict of
        edge → (nk, edge_len) arrays."""
        H, ni, nj = self.halo, self.nil, self.njl
        ext = {e: dict(kv) for e, kv in self.tracer_ext}
        out = {}
        for name, t in tracers.items():
            r = {}
            if self.open_w:
                r["W"] = t[..., :, H]
            if self.open_e:
                r["E"] = t[..., :, H + ni - 1]
            if self.open_s:
                r["S"] = t[..., H, :]
            if self.open_n:
                r["N"] = t[..., H + nj - 1, :]
            for edge in r:
                if name in ext.get(edge, {}):
                    r[edge] = jnp.full_like(r[edge], ext[edge][name])
            out[name] = r
        return out

    def update_tracer_reservoirs(self, reservoirs: dict, tracers: dict,
                                 u, v, dt, len_out=None, len_in=None):
        """Advance the reservoirs: outflow drags them toward the
        interior edge value at rate |u|dt/L_out; inflow relaxes them
        back toward the segment's external DATA value (when one was
        given) at |u|dt/L_in, as in the reference's
        update_segment_tracer_reservoirs, which applies both length
        scales (OBC_TRACER_RESERVOIR_LENGTH_SCALE_OUT/_IN).  Tracers
        without external data keep their reservoir on inflow."""
        H, ni, nj = self.halo, self.nil, self.njl
        len_out = self.res_len_out if len_out is None else len_out
        len_in = self.res_len_in if len_in is None else len_in
        ext = {e: dict(kv) for e, kv in self.tracer_ext}

        def upd(r, t_edge, vel_edge, outflow_positive, ext_val):
            vout = jnp.maximum(vel_edge if outflow_positive
                               else -vel_edge, 0.0)
            w = jnp.clip(vout * dt / len_out, 0.0, 1.0)
            r = r + w * (t_edge - r)
            if ext_val is not None:
                vin = jnp.maximum(-vel_edge if outflow_positive
                                  else vel_edge, 0.0)
                w_in = jnp.clip(vin * dt / len_in, 0.0, 1.0)
                r = r + w_in * (ext_val - r)
            return r

        new = {}
        for name, r in reservoirs.items():
            t = tracers[name]
            nr = dict(r)
            if "W" in nr:      # outflow is westward: u < 0
                nr["W"] = upd(nr["W"], t[..., :, H], u[..., :, H - 1],
                              False, ext.get("W", {}).get(name))
            if "E" in nr:      # outflow is eastward: u > 0
                nr["E"] = upd(nr["E"], t[..., :, H + ni - 1],
                              u[..., :, H + ni - 1], True,
                              ext.get("E", {}).get(name))
            if "S" in nr:
                nr["S"] = upd(nr["S"], t[..., H, :], v[..., H - 1, :],
                              False, ext.get("S", {}).get(name))
            if "N" in nr:
                nr["N"] = upd(nr["N"], t[..., H + nj - 1, :],
                              v[..., H + nj - 1, :], True,
                              ext.get("N", {}).get(name))
            new[name] = nr
        return new

    def keep_boundary(self, orig, filled):
        """Restore the pre-fill values inside the OBC halo bands after
        a domain halo fill: on non-periodic edges the fill writes
        zeros there, which would erase the open-boundary face
        transports and halo thicknesses that the boundary scheme
        maintains (killing tracer import on inflow)."""
        m = None
        for s in (self.strip_w, self.strip_e, self.strip_s,
                  self.strip_n):
            if s is not None:
                m = s if m is None else jnp.maximum(m, s)
        if m is None:
            return filled
        return jax.tree.map(lambda o, f: jnp.where(m > 0, o, f),
                            orig, filled)

    def apply_tracer_reservoirs(self, tracers: dict,
                                reservoirs: dict) -> dict:
        """Fill the halo cells beyond each open edge with the
        reservoir value, so inflowing water carries reservoir tracer
        instead of the zero-gradient extension."""
        H, ni, nj = self.halo, self.nil, self.njl
        out = {}
        for name, t in tracers.items():
            r = reservoirs.get(name, {})
            if "W" in r:
                t = self._blend_x(t, slice(0, H), r["W"][..., :, None],
                                  self.strip_w)
            if "E" in r:
                t = self._blend_x(t, slice(H + ni, None),
                                  r["E"][..., :, None], self.strip_e)
            if "S" in r:
                t = self._blend_y(t, slice(0, H), r["S"][..., None, :],
                                  self.strip_s)
            if "N" in r:
                t = self._blend_y(t, slice(H + nj, None),
                                  r["N"][..., None, :], self.strip_n)
            out[name] = t
        return out


def build_open_boundaries(pf, domain: Domain, indir: str = ".",
                          dye_tracers: int = 0
                          ) -> Optional[OpenBoundaries]:
    segs = parse_segments(pf, indir)
    if not segs:
        return None
    if dye_tracers:
        # dyed_channel / dyed_obcs convention: segment m is the unit
        # source of dye_m, zero for every other dye
        # (dyed_channel_set_OBC_tracer_data,
        # /root/reference/src/user/dyed_channel_initialization.F90:84)
        for m, s in enumerate(segs, 1):
            for n in range(1, dye_tracers + 1):
                s.tracer_ext.setdefault(f"dye_{n:02d}",
                                        1.0 if n == m else 0.0)
    H = domain.halo
    ni, nj = domain.ni, domain.nj
    kw = dict(open_w=False, open_e=False, open_s=False, open_n=False,
              halo=H, nil=domain.nil, njl=domain.njl)
    data = {}
    # Per-edge 2D ownership masks in the padded GLOBAL index space: 1
    # exactly at the cells the edge's operators write (the boundary
    # face column/row plus the halo band beyond it), restricted to the
    # segment's open range.  On a decomposed layout, blockification
    # places these cells only on the boundary-owning shards; every
    # other shard's edge ops read mask 0 and reduce to identity.
    extent = {"W": nj, "E": nj, "S": ni, "N": ni}
    strips = {d: None for d in extent}

    def seg_strip(d, s):
        st = jnp.zeros((nj + 2 * H, ni + 2 * H))
        n = extent[d]
        lo = 0 if s.lo is None else max(0, s.lo)
        hi = n if s.hi is None else min(n, s.hi)
        whole = s.lo is None and s.hi is None
        # whole-edge segments also own the corner halo rows/cols (the
        # historical whole-edge behavior wrote the full halo band)
        plo, phi = (0, n + 2 * H) if whole else (H + lo, H + hi)
        if d == "W":
            return st.at[plo:phi, 0:H].set(1.0)
        if d == "E":
            return st.at[plo:phi, H + ni - 1:].set(1.0)
        if d == "S":
            return st.at[0:H, plo:phi].set(1.0)
        return st.at[H + nj - 1:, plo:phi].set(1.0)

    ext_pairs = {d: [] for d in extent}     # (segment, ssh, vel) list
    for s in segs:
        d = s.direction
        kw["open_" + d.lower()] = True
        if s.nudged:
            data["tau_in_" + d.lower()] = s.tau_in
            data["tau_out_" + d.lower()] = s.tau_out
        ext_pairs[d].append(
            (s, s.ssh_ext, s.u_ext if d in ("W", "E") else s.v_ext))
        st = seg_strip(d, s)
        strips[d] = st if strips[d] is None else jnp.maximum(strips[d],
                                                             st)
    for d, key in (("W", "strip_w"), ("E", "strip_e"),
                   ("S", "strip_s"), ("N", "strip_n")):
        if strips[d] is not None:
            data[key] = strips[d]

    def paint_edge(d, pairs, which):
        """Per-edge external datum: one scalar stays a scalar; profile
        data / several segments paint a 2D (njh, nih) field, uniform
        across the perpendicular axis (blockify-safe)."""
        import numpy as np
        vals = [p[which] for p in pairs]
        if len(pairs) == 1 and np.ndim(vals[0]) == 0:
            return float(vals[0])
        n = extent[d]
        vec = np.zeros(n + 2 * H)
        for (s, *_), v in zip(pairs, vals):
            lo = 0 if s.lo is None else max(0, s.lo)
            hi = n if s.hi is None else min(n, s.hi)
            v = np.asarray(v, np.float64)
            if v.ndim == 1 and v.size not in (hi - lo, n):
                raise ValueError(
                    f"segment data profile length {v.size} matches "
                    f"neither the segment extent {hi - lo} nor the "
                    f"edge length {n}")
            vec[H + lo:H + hi] = v[lo:hi] if v.ndim == 1 \
                and v.size == n else v
        vec[:H] = vec[H]
        vec[n + H:] = vec[n + H - 1]
        if d in ("W", "E"):
            f2 = np.tile(vec[:, None], (1, ni + 2 * H))
        else:
            f2 = np.tile(vec[None, :], (nj + 2 * H, 1))
        return jnp.asarray(f2)

    for d, s_key, v_key in (("W", "ssh_w", "u_w"), ("E", "ssh_e", "u_e"),
                            ("S", "ssh_s", "v_s"), ("N", "ssh_n", "v_n")):
        if ext_pairs[d]:
            data[s_key] = paint_edge(d, ext_pairs[d], 1)
            data[v_key] = paint_edge(d, ext_pairs[d], 2)
    data["rx_max"] = pf.get("OBC_RADIATION_MAX", float, 10.0)
    data["res_len_out"] = pf.get(
        "OBC_TRACER_RESERVOIR_LENGTH_SCALE_OUT", float, 1.0e4,
        units="m")
    data["res_len_in"] = pf.get(
        "OBC_TRACER_RESERVOIR_LENGTH_SCALE_IN", float, 3.0e5,
        units="m")
    text = {}
    for s in segs:
        if s.tracer_ext:
            text.setdefault(s.direction, {}).update(s.tracer_ext)
    data["tracer_ext"] = tuple(
        (e, tuple(sorted(kv.items()))) for e, kv in sorted(text.items()))
    return OpenBoundaries(**kw, **data)


def blockify_obc(domain_sharded: Domain,
                 obc: OpenBoundaries) -> OpenBoundaries:
    """Re-block the edge ownership masks for a decomposed layout (the
    blockify_grid counterpart): after blockification only the
    boundary-owning shards carry nonzero mask cells, so the edge
    operators become identity on every other shard."""
    import dataclasses as dc
    from mom6_tpu.core.grid import blockify
    kw = {}
    for key in ("strip_w", "strip_e", "strip_s", "strip_n",
                "ssh_w", "ssh_e", "ssh_s", "ssh_n",
                "u_w", "u_e", "v_s", "v_n"):
        v = getattr(obc, key)
        if getattr(v, "ndim", 0) == 2:
            kw[key] = blockify(domain_sharded, v)
    return dc.replace(obc, nil=domain_sharded.nil,
                      njl=domain_sharded.njl, **kw)


def open_grid_masks(grid, obc: OpenBoundaries):
    """Open the land masks across open edges: halo cells beyond a
    segment become ocean (zero-gradient depth), re-deriving face
    masks (the reference reads halo topography through mpp and the
    segments override wall masks)."""
    import dataclasses as dc
    from mom6_tpu.parallel.stencil import ip1, jp1
    maskT = obc.extend(grid.mask2dT)
    bathy = obc.extend(grid.bathyT)
    maskCu = maskT * ip1(maskT)
    maskCv = maskT * jp1(maskT)
    maskBu = maskCu * jp1(maskCu)
    return dc.replace(grid, mask2dT=maskT, bathyT=bathy,
                      mask2dCu=maskCu, mask2dCv=maskCv, mask2dBu=maskBu)
