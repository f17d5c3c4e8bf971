"""Tracer advection from accumulated mass transports.

Re-design of /root/reference/src/tracer/MOM_tracer_advect.F90:52
advect_tracer: directionally-split upwind advection using the mass
transports uhtr/vhtr accumulated over the tracer timestep, with
monotonized PLM (or PPM:H3) reconstruction of the tracer within the
upwind cell and the swept-volume CFL entering the face value exactly as
in the thickness continuity solver.  The thickness field ``hprev`` is
updated alongside the tracers so tracer and mass stay mutually
consistent (uniform tracer stays exactly uniform).

The reference's ``domore`` narrow re-sweep masks (for CFL>1 residual
transports) become a fixed number of alternating x/y passes, each
moving at most a CFL-limited fraction of the remaining transport —
branch-free and layout-invariant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["TracerAdvectCfg", "advect_tracers"]

_H_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class TracerAdvectCfg:
    scheme: str = "PLM"        # TRACER_ADVECTION_SCHEME (PLM | PPM:H3)
    n_sweep_pairs: int = 2     # alternating x/y pass pairs (re-sweeps)
    # per-FACE transported fraction limit: a cell can drain through
    # both of its faces in one sweep, so keep 2*max_cfl < 1 to
    # guarantee positive volumes
    max_cfl: float = 0.45


def _plm_slope(t, mask):
    t_up = im1(t)
    t_dn = ip1(t)
    s_c = 0.5 * (t_dn - t_up)
    s_l = t - t_up
    s_r = t_dn - t
    slope = jnp.sign(s_c) * jnp.minimum(
        jnp.abs(s_c), 2.0 * jnp.minimum(jnp.abs(s_l), jnp.abs(s_r)))
    slope = jnp.where(s_l * s_r > 0.0, slope, 0.0)
    return slope * mask * im1(mask) * ip1(mask)


def _sweep_x(grid: Grid, tracers, hvol, uhtr_rem, dt_frac_cfg):
    """One x-direction pass: move min(remaining, CFL-limited) transport.

    hvol: cell volume content h*areaT [m3]; uhtr_rem: remaining
    accumulated transport through east faces [m3]."""
    mask = grid.mask2dT
    pos = uhtr_rem > 0.0
    # upwind cell volume
    vol_up = jnp.where(pos, hvol, ip1(hvol))
    # transported volume limited to a fraction of the upwind cell
    move = jnp.clip(uhtr_rem, -dt_frac_cfg * ip1(hvol),
                    dt_frac_cfg * hvol)
    cfl = jnp.abs(move) / (vol_up + _H_NEGLECT)

    new_tracers = {}
    flux = {}
    for name, t in tracers.items():
        slp = _plm_slope(t, mask)
        # face value: mean of the reconstruction over the swept volume
        t_face_pos = t + 0.5 * slp * (1.0 - cfl)
        t_face_neg = ip1(t) - 0.5 * ip1(slp) * (1.0 - cfl)
        t_face = jnp.where(pos, t_face_pos, t_face_neg)
        flux[name] = move * t_face * grid.mask2dCu

    hvol_new = hvol - (move * grid.mask2dCu - im1(move * grid.mask2dCu))
    for name, t in tracers.items():
        tv = t * hvol - (flux[name] - im1(flux[name]))
        new_tracers[name] = jnp.where(
            mask > 0, tv / (hvol_new + _H_NEGLECT), t)
    return new_tracers, hvol_new, uhtr_rem - move * grid.mask2dCu


def _sweep_y(grid: Grid, tracers, hvol, vhtr_rem, dt_frac_cfg):
    mask = grid.mask2dT
    pos = vhtr_rem > 0.0
    vol_up = jnp.where(pos, hvol, jp1(hvol))
    move = jnp.clip(vhtr_rem, -dt_frac_cfg * jp1(hvol),
                    dt_frac_cfg * hvol)
    cfl = jnp.abs(move) / (vol_up + _H_NEGLECT)

    new_tracers = {}
    flux = {}
    for name, t in tracers.items():
        t_up = jm1(t)
        t_dn = jp1(t)
        s_c = 0.5 * (t_dn - t_up)
        s_l = t - t_up
        s_r = t_dn - t
        slp = jnp.sign(s_c) * jnp.minimum(
            jnp.abs(s_c), 2.0 * jnp.minimum(jnp.abs(s_l), jnp.abs(s_r)))
        slp = jnp.where(s_l * s_r > 0.0, slp, 0.0)
        slp = slp * mask * jm1(mask) * jp1(mask)
        t_face = jnp.where(pos, t + 0.5 * slp * (1.0 - cfl),
                           jp1(t) - 0.5 * jp1(slp) * (1.0 - cfl))
        flux[name] = move * t_face * grid.mask2dCv

    hvol_new = hvol - (move * grid.mask2dCv - jm1(move * grid.mask2dCv))
    for name, t in tracers.items():
        tv = t * hvol - (flux[name] - jm1(flux[name]))
        new_tracers[name] = jnp.where(
            mask > 0, tv / (hvol_new + _H_NEGLECT), t)
    return new_tracers, hvol_new, vhtr_rem - move * grid.mask2dCv


@jax.named_scope("tracer_advect")
def advect_tracers(domain, grid: Grid, tracers: dict, h_end, uhtr, vhtr,
                   cfg: TracerAdvectCfg = TracerAdvectCfg(),
                   x_first: bool = True):
    """Advect ``tracers`` by accumulated transports.

    h_end: thickness AFTER the dynamics accumulated uhtr/vhtr [m];
    uhtr/vhtr: time-integrated mass transports [m3] through faces.
    The pre-transport thickness is reconstructed internally as
    hprev = h_end + div(transports)/areaT, which stays exactly
    consistent with the transports for any accumulation interval
    (the reference builds hprev the same way,
    MOM_tracer_advect.F90:165).  Returns (new_tracers, h_out,
    resid_cfl) with h_out == h_end once all transports are swept;
    resid_cfl is the largest un-swept face transport as a fraction of
    its upwind cell volume — the analog of the reference's ``domore``
    loop terminating with work left (it loops until domore clears;
    here the sweep count is derived from the accumulated-CFL bound at
    build time and this diagnostic proves the bound held).
    """
    hvol = (h_end * grid.areaT + (uhtr - im1(uhtr))
            + (vhtr - jm1(vhtr)))
    uh_rem = uhtr
    vh_rem = vhtr
    ts = dict(tracers)
    frac = cfg.max_cfl

    # lax.fori_loop keeps the graph one-pair-sized regardless of the
    # accumulated-CFL-derived pair count (a 15-pair unroll at
    # DT_THERM=12*DT fell off an XLA compilation cliff)
    def pair(_, carry):
        # NOTE: the refresh of (ts, hvol, *_rem) halos happens at the
        # END of the body, not the top — the caller paints OBC tracer
        # reservoirs and boundary-face transports into the halo bands
        # before calling, and a top-of-body fill would zero them on
        # the FIRST pair and silence all open-boundary tracer import
        # (the round-4 fori_loop refactor did exactly that)
        ts, hvol, uh_rem, vh_rem = carry
        if x_first:
            ts, hvol, uh_rem = _sweep_x(grid, ts, hvol, uh_rem, frac)
            ts = domain.fill_halos(ts, width=2)
            hvol, uh_rem = domain.fill_halos((hvol, uh_rem), width=2)
            ts, hvol, vh_rem = _sweep_y(grid, ts, hvol, vh_rem, frac)
        else:
            ts, hvol, vh_rem = _sweep_y(grid, ts, hvol, vh_rem, frac)
            ts = domain.fill_halos(ts, width=2)
            hvol, vh_rem = domain.fill_halos((hvol, vh_rem), width=2)
            ts, hvol, uh_rem = _sweep_x(grid, ts, hvol, uh_rem, frac)
        ts = domain.fill_halos(ts, width=2)
        hvol, uh_rem, vh_rem = domain.fill_halos(
            (hvol, uh_rem, vh_rem), width=2)
        return ts, hvol, uh_rem, vh_rem

    ts, hvol, uh_rem, vh_rem = jax.lax.fori_loop(
        0, cfg.n_sweep_pairs, pair, (ts, hvol, uh_rem, vh_rem))
    h_end = hvol / grid.areaT
    # residual-transport diagnostic: max un-swept face CFL (should be
    # ~0 when n_sweep_pairs covers the accumulated-CFL bound)
    vol_up_x = jnp.where(uh_rem > 0.0, hvol, ip1(hvol))
    vol_up_y = jnp.where(vh_rem > 0.0, hvol, jp1(hvol))
    resid = jnp.maximum(
        domain.global_max(jnp.abs(uh_rem) / (vol_up_x + _H_NEGLECT)),
        domain.global_max(jnp.abs(vh_rem) / (vol_up_y + _H_NEGLECT)))
    return ts, h_end, resid
