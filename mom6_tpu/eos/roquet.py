"""Roquet et al. (2015) polyTEOS-10 equations of state.

Counterpart of /root/reference/src/equation_of_state/
MOM_EOS_Roquet_rho.F90 (55-term density polynomial, Roquet, Madec,
McDougall & Barker 2015, Ocean Modelling 90, 29) and
MOM_EOS_Roquet_SpV.F90 (specific-volume form).  Inputs are
conservative temperature [degC], absolute salinity [g kg-1], pressure
[Pa].  The published coefficients are tabulated raw and scaled
programmatically by I_Ts**(T power) and Pa2kb**(p power).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.eos.base import EOS

_PA2KB = 1.0e-8
_I_TS = 0.025
_RDELTAS = 32.0
_R1_S0 = 0.875 / 35.16504

# raw coefficients keyed (zs_power, T_power, p_power)
_EOS = {
    (0, 0, 0): 8.0189615746e+02, (1, 0, 0): 8.6672408165e+02,
    (2, 0, 0): -1.7864682637e+03, (3, 0, 0): 2.0375295546e+03,
    (4, 0, 0): -1.2849161071e+03, (5, 0, 0): 4.3227585684e+02,
    (6, 0, 0): -6.0579916612e+01,
    (0, 1, 0): 2.6010145068e+01, (1, 1, 0): -6.5281885265e+01,
    (2, 1, 0): 8.1770425108e+01, (3, 1, 0): -5.6888046321e+01,
    (4, 1, 0): 1.7681814114e+01, (5, 1, 0): -1.9193502195,
    (0, 2, 0): -3.7074170417e+01, (1, 2, 0): 6.1548258127e+01,
    (2, 2, 0): -6.0362551501e+01, (3, 2, 0): 2.9130021253e+01,
    (4, 2, 0): -5.4723692739,
    (0, 3, 0): 2.1661789529e+01, (1, 3, 0): -3.3449108469e+01,
    (2, 3, 0): 1.9717078466e+01, (3, 3, 0): -3.1742946532,
    (0, 4, 0): -8.3627885467, (1, 4, 0): 1.1311538584e+01,
    (2, 4, 0): -5.3563304045,
    (0, 5, 0): 5.4048723791e-01, (1, 5, 0): 4.8169980163e-01,
    (0, 6, 0): -1.9083568888e-01,
    (0, 0, 1): 1.9681925209e+01, (1, 0, 1): -4.2549998214e+01,
    (2, 0, 1): 5.0774768218e+01, (3, 0, 1): -3.0938076334e+01,
    (4, 0, 1): 6.6051753097,
    (0, 1, 1): -1.3336301113e+01, (1, 1, 1): -4.4870114575,
    (2, 1, 1): 5.0042598061, (3, 1, 1): -6.5399043664e-01,
    (0, 2, 1): 6.7080479603, (1, 2, 1): 3.5063081279,
    (2, 2, 1): -1.8795372996,
    (0, 3, 1): -2.4649669534, (1, 3, 1): -5.5077101279e-01,
    (0, 4, 1): 5.5927935970e-01,
    (0, 0, 2): 2.0660924175, (1, 0, 2): -4.9527603989,
    (2, 0, 2): 2.5019633244,
    (0, 1, 2): 2.0564311499, (1, 1, 2): -2.1311365518e-01,
    (0, 2, 2): -1.2419983026,
    (0, 0, 3): -2.3342758797e-02, (1, 0, 3): -1.8507636718e-02,
    (0, 1, 3): 3.7969820455e-01,
}
# T&S-independent pressure polynomial rho00p = Σ R0n zp^(n+1)
_R0 = [4.6494977072e+01, -5.2099962525, 2.2601900708e-01,
       6.4326772569e-02, 1.5616995503e-02, -1.7243708991e-03]


@dataclasses.dataclass(frozen=True)
class RoquetRhoEOS(EOS):
    name = "ROQUET_RHO"

    def density(self, T, S, p, rho_ref: float = 0.0):
        zt = T
        zs = jnp.sqrt(jnp.abs(S + _RDELTAS) * _R1_S0)
        zp = p
        rho = -rho_ref + 0.0 * zt
        # Horner-free dense evaluation (55 fused multiply-adds; the
        # XLA fuser handles this fine on the VPU)
        for (i, j, k), raw in _EOS.items():
            c = raw * (_I_TS ** j) * (_PA2KB ** k)
            rho = rho + c * (zs ** i) * (zt ** j) * (zp ** k)
        rho00p = 0.0
        for n, raw in enumerate(_R0):
            rho00p = rho00p + raw * (_PA2KB ** (n + 1)) * zp ** (n + 1)
        return rho + rho00p


@dataclasses.dataclass(frozen=True)
class RoquetSpVEOS(RoquetRhoEOS):
    """Specific-volume-oriented variant.  Until the SpV polynomial is
    tabulated, densities come from the rho polynomial and specific
    volume by reciprocal (adequate for Boussinesq use; the
    non-Boussinesq SpV-native path is a planned refinement)."""
    name = "ROQUET_SPV"

    def spec_vol(self, T, S, p, spv_ref: float = 0.0):
        return 1.0 / self.density(T, S, p) - spv_ref
