"""Porous topographic barriers.

Re-design of /root/reference/src/core/MOM_porous_barriers.F90: faces
partially blocked by unresolved sills expose only a fraction of their
area to flow.  Given an effective sill depth at each face and the
layer interface heights, the open fraction of each layer's face is the
overlap of the layer with the water column above the sill.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, jp1

__all__ = ["porous_widths_layer"]

_EPS = 1e-14


def porous_widths_layer(grid: Grid, e, sill_depth_u=None,
                        sill_depth_v=None):
    """(por_face_areaU, por_face_areaV): per-layer open fractions.

    e: interface heights (nk+1, ...); sill_depth_[uv]: effective sill
    depth (positive down) at faces; None → fully open faces."""
    nk = e.shape[0] - 1

    def frac(e_face, sill):
        if sill is None:
            return jnp.ones_like(e_face[:-1])
        top = e_face[:-1]
        bot = e_face[1:]
        hmax = top - bot
        # open part of the layer lies above z = -sill
        open_h = jnp.clip(top - jnp.maximum(bot, -sill[None]), 0.0,
                          hmax)
        return open_h / (hmax + _EPS)

    e_u = 0.5 * (e + ip1(e))
    e_v = 0.5 * (e + jp1(e))
    return frac(e_u, sill_depth_u), frac(e_v, sill_depth_v)
