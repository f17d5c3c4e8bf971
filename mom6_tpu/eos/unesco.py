"""UNESCO (Jackett & McDougall 1995) equation of state — placeholder.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_UNESCO.F90.
Full polynomial fit to be filled in a later pass; constructing the
class works (for registry/breadth), using it raises.
"""

from __future__ import annotations

import dataclasses

from mom6_tpu.eos.base import EOS


@dataclasses.dataclass(frozen=True)
class UnescoEOS(EOS):
    name = "UNESCO"

    def density(self, T, S, p, rho_ref: float = 0.0):
        raise NotImplementedError(
            "UNESCO EOS polynomial not yet implemented; use WRIGHT_FULL")
