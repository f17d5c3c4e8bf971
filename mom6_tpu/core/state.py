"""Prognostic model state containers.

The functional counterpart of the reference's pointer soup
(``MOM_variables.F90:77 thermo_var_ptrs`` and the u/v/h/T/S arrays of
``MOM_control_struct``, /root/reference/src/core/MOM.F90:194): a single
pytree holding all prognostic fields in the halo-padded local view,
shape (nk, njh, nih).  Pure step functions map State → State.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["State"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    u: jnp.ndarray                    # zonal velocity at Cu [m s-1]
    v: jnp.ndarray                    # meridional velocity at Cv [m s-1]
    h: jnp.ndarray                    # layer thickness [m (Bouss)]
    T: Optional[jnp.ndarray] = None   # potential/conservative temp [degC]
    S: Optional[jnp.ndarray] = None   # salinity [ppt]
    # prognostic parameterized mesoscale eddy energy [m2 s-2]
    # (MOM_MEKE.F90 MEKE%MEKE), present when USE_MEKE
    meke: Optional[jnp.ndarray] = None
    # accumulated not-yet-extracted frazil heat deficit [J m-2]
    # (tv%frazil, MOM_variables.F90; a restartable thermo field the
    # ice model drains; RECLAIM_FRAZIL melts it back when the surface
    # warms above freezing)
    frazil: Optional[jnp.ndarray] = None

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)
