"""Linear equation of state.

Counterpart of /root/reference/src/equation_of_state/MOM_EOS_linear.F90:
rho = Rho_T0_S0 + dRho_dT*T + dRho_dS*S (pressure-independent).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mom6_tpu.eos.base import EOS


@dataclasses.dataclass(frozen=True)
class LinearEOS(EOS):
    rho_t0_s0: float = 1000.0
    drho_dt: float = -0.2
    drho_ds: float = 0.8

    name = "LINEAR"

    def density(self, T, S, p, rho_ref: float = 0.0):
        return ((self.rho_t0_s0 - rho_ref)
                + (self.drho_dt * T + self.drho_ds * S))

    def density_derivs(self, T, S, p):
        one = jnp.ones_like(T)
        return self.drho_dt * one, self.drho_ds * one

    def compressibility(self, T, S, p):
        return jnp.zeros_like(T)
