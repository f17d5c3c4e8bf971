"""TEOS-10 (GSW) equation of state — placeholder.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_TEOS10.F90
(which delegates to the GSW-Fortran toolbox).  The needed gsw
polynomials (rho, specvol, CT/PT conversion, freezing) will be
implemented natively in a later pass.
"""

from __future__ import annotations

import dataclasses

from mom6_tpu.eos.base import EOS


@dataclasses.dataclass(frozen=True)
class TEOS10EOS(EOS):
    name = "TEOS10"

    def density(self, T, S, p, rho_ref: float = 0.0):
        raise NotImplementedError(
            "TEOS10 EOS not yet implemented; use WRIGHT_FULL or ROQUET_RHO")
