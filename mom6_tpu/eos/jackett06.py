"""Jackett et al. (2006) equation of state — placeholder.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_Jackett06.F90.
"""

from __future__ import annotations

import dataclasses

from mom6_tpu.eos.base import EOS


@dataclasses.dataclass(frozen=True)
class Jackett06EOS(EOS):
    name = "JACKETT_06"

    def density(self, T, S, p, rho_ref: float = 0.0):
        raise NotImplementedError(
            "JACKETT_06 EOS not yet implemented; use WRIGHT_FULL")
