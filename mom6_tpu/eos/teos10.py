"""TEOS-10 equation of state via the polyTEOS-10 fit.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_TEOS10.F90
(which delegates to the GSW-Fortran toolbox — an empty submodule in the
reference checkout, pkg/GSW-Fortran).  The 75-term gsw specific-volume
polynomial is itself a fit to TEOS-10; here the TEOS10 selection maps
to the Roquet et al. (2015) 55-term polyTEOS-10 density polynomial —
the same family of approximation the GSW toolbox uses — pending a
native port of the full gsw polynomials (rho, specvol, CT/PT
conversion, freezing).
"""

from __future__ import annotations

import dataclasses

from mom6_tpu.eos.roquet import RoquetRhoEOS


@dataclasses.dataclass(frozen=True)
class TEOS10EOS(RoquetRhoEOS):
    name = "TEOS10"
