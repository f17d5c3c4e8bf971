"""Roquet et al. (2015) polyTEOS equations of state — placeholders.

Counterparts of /root/reference/src/equation_of_state/
MOM_EOS_Roquet_rho.F90 and MOM_EOS_Roquet_SpV.F90.
"""

from __future__ import annotations

import dataclasses

from mom6_tpu.eos.base import EOS


@dataclasses.dataclass(frozen=True)
class RoquetRhoEOS(EOS):
    name = "ROQUET_RHO"

    def density(self, T, S, p, rho_ref: float = 0.0):
        raise NotImplementedError(
            "ROQUET_RHO EOS not yet implemented; use WRIGHT_FULL")


@dataclasses.dataclass(frozen=True)
class RoquetSpVEOS(EOS):
    name = "ROQUET_SPV"

    def density(self, T, S, p, rho_ref: float = 0.0):
        raise NotImplementedError(
            "ROQUET_SPV EOS not yet implemented; use WRIGHT_FULL")
