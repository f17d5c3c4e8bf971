"""Mechanical and buoyancy forcing containers.

Slimmed re-design of /root/reference/src/core/MOM_forcing_type.F90:
``mech_forcing`` (:258 — surface stresses, pressure) and ``forcing``
(:80 — heat/salt/mass fluxes).  Fields are halo-padded (njh, nih)
arrays or None.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["MechForcing", "Fluxes"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MechForcing:
    taux: Optional[jnp.ndarray] = None      # zonal stress at u pts [Pa]
    tauy: Optional[jnp.ndarray] = None      # meridional stress at v pts [Pa]
    p_surf: Optional[jnp.ndarray] = None    # surface pressure at h pts [Pa]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Fluxes:
    sw: Optional[jnp.ndarray] = None        # shortwave [W m-2]
    lw: Optional[jnp.ndarray] = None
    latent: Optional[jnp.ndarray] = None
    sensible: Optional[jnp.ndarray] = None
    evap: Optional[jnp.ndarray] = None      # [kg m-2 s-1]
    lprec: Optional[jnp.ndarray] = None
    fprec: Optional[jnp.ndarray] = None
    salt_flux: Optional[jnp.ndarray] = None
    # coupler-supplied gas-exchange boundary fields (the
    # coupler_bc_type tables of MOM_couplertype_infra.F90:1-120): a
    # dict of 2D arrays — atmospheric partial pressures keyed by the
    # BGC registry's atm_field names (pco2_atm, po2_atm, pcfc11_atm,
    # ...), plus optionally "u10" and "ice_frac".  In coupled mode
    # these take precedence over the BGC package's own
    # constants/file registry.
    gas_fields: Optional[dict] = None
