"""Vertical grid description.

Re-design of ``verticalGrid_type``
(/root/reference/src/core/MOM_verticalGrid.F90:24): layer count, layer
target densities, gravitational constants, and the thickness-unit
bookkeeping.  Thickness h is carried in meters-equivalent units in
both modes.  Boussinesq: h is a geometric thickness (H_to_m = 1).
Non-Boussinesq (``boussinesq=False``): h carries mass — Rho0*h is the
layer mass per unit area — which is the reference's default
*semi*-Boussinesq convention (MOM_verticalGrid.F90:138,208:
H_to_Z = H_to_kg_m2 / Rho0), so all kinematic/mixing paths are shared
and only the pressure force (specific-volume FV form,
MOM_PressureForce_FV.F90:89) and mass bookkeeping branch on the flag.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["VerticalGrid"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VerticalGrid:
    nk: int = dataclasses.field(metadata=dict(static=True))
    g_Earth: float = dataclasses.field(default=9.8, metadata=dict(static=True))
    Rho0: float = dataclasses.field(default=1035.0, metadata=dict(static=True))
    boussinesq: bool = dataclasses.field(default=True,
                                         metadata=dict(static=True))
    # minimum layer thickness [m] — the reference's Angstrom
    angstrom: float = dataclasses.field(default=1e-10,
                                        metadata=dict(static=True))
    # per-layer target potential densities [kg m-3], shape (nk,)
    Rlay: jnp.ndarray = None
    # reduced gravity across interfaces [m s-2], shape (nk+1,):
    # g_prime[0] = g (free surface), g_prime[K] = g*(Rlay[K]-Rlay[K-1])/Rho0
    g_prime: jnp.ndarray = None

    @staticmethod
    def from_rlay(rlay, g_Earth: float = 9.8, Rho0: float = 1035.0,
                  g_fs: float | None = None, **kw) -> "VerticalGrid":
        """Layer densities given directly (the COORD_CONFIG ts_range /
        layer_ref / linear families, MOM_coord_initialization.F90):
        g_prime(1) = g_fs (default g), g_prime(K) = g·ΔRlay/Rho0."""
        rlay = np.asarray(rlay, dtype=np.float64)
        nk = rlay.shape[0]
        gp = np.zeros(nk + 1)
        gp[0] = g_Earth if g_fs is None else g_fs
        gp[1:nk] = (g_Earth / Rho0) * (rlay[1:] - rlay[:-1])
        return VerticalGrid(nk=nk, g_Earth=g_Earth, Rho0=Rho0,
                            Rlay=jnp.asarray(rlay),
                            g_prime=jnp.asarray(gp), **kw)

    @staticmethod
    def uniform(nk: int, g_Earth: float = 9.8, Rho0: float = 1035.0,
                gint: float | None = None, light: float | None = None,
                **kw) -> "VerticalGrid":
        """Layer densities from a uniform interface reduced gravity
        ``gint`` (the reference's GINT/GFS layered setup,
        MOM_coord_initialization.F90 'ts_range'/'gprime' configs)."""
        gp = np.zeros(nk + 1)
        gp[0] = g_Earth
        if gint is not None:
            gp[1:] = gint
        r0 = light if light is not None else Rho0
        rlay = np.zeros(nk)
        rlay[0] = r0
        for k in range(1, nk):
            rlay[k] = rlay[k - 1] + gp[k] * Rho0 / g_Earth
        return VerticalGrid(nk=nk, g_Earth=g_Earth, Rho0=Rho0,
                            Rlay=jnp.asarray(rlay), g_prime=jnp.asarray(gp),
                            **kw)
