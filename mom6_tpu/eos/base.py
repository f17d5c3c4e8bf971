"""EOS interface.

Counterpart of ``MOM_EOS_base_type``
(/root/reference/src/equation_of_state/MOM_EOS_base_type.F90): density
and specific volume with first derivatives; all methods are pure
vectorized jnp functions usable inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class EOS:
    """Base equation of state: rho(T, S, p)."""

    name = "?"

    def density(self, T, S, p, rho_ref: float = 0.0):
        """In-situ density [kg m-3] (minus rho_ref, computed to avoid
        cancellation where the subclass supports it)."""
        raise NotImplementedError

    def spec_vol(self, T, S, p, spv_ref: float = 0.0):
        return 1.0 / self.density(T, S, p) - spv_ref

    def density_derivs(self, T, S, p):
        """(drho_dT, drho_dS) via jax.grad-free analytic forms when
        overridden; default uses forward-mode autodiff."""
        drho_dT = jax.jvp(lambda t: self.density(t, S, p), (T,),
                          (jnp.ones_like(T),))[1]
        drho_dS = jax.jvp(lambda s: self.density(T, s, p), (S,),
                          (jnp.ones_like(S),))[1]
        return drho_dT, drho_dS

    def compressibility(self, T, S, p):
        """drho_dp [s2 m-2] via autodiff unless overridden."""
        return jax.jvp(lambda q: self.density(T, S, q), (p,),
                       (jnp.ones_like(p),))[1]

    def density_second_derivs(self, T, S, p):
        """The five second derivatives of density
        (drho_dS_dS, drho_dS_dT, drho_dT_dT, drho_dS_dP, drho_dT_dP),
        the calculate_density_second_derivs analog
        (/root/reference/src/equation_of_state/MOM_EOS.F90): nested
        forward-mode AD over the subclass's closed-form density, so
        every EOS gets elementwise-exact second derivatives with no
        per-form hand differentiation."""
        def dT(t, s, q):
            return jax.jvp(lambda tt: self.density(tt, s, q), (t,),
                           (jnp.ones_like(t),))[1]

        def dS(t, s, q):
            return jax.jvp(lambda ss: self.density(t, ss, q), (s,),
                           (jnp.ones_like(s),))[1]

        oT = jnp.ones_like(T)
        oS = jnp.ones_like(S)
        oP = jnp.ones_like(p)
        d2_SS = jax.jvp(lambda s: dS(T, s, p), (S,), (oS,))[1]
        d2_ST = jax.jvp(lambda t: dS(t, S, p), (T,), (oT,))[1]
        d2_TT = jax.jvp(lambda t: dT(t, S, p), (T,), (oT,))[1]
        d2_SP = jax.jvp(lambda q: dS(T, S, q), (p,), (oP,))[1]
        d2_TP = jax.jvp(lambda q: dT(T, S, q), (p,), (oP,))[1]
        return d2_SS, d2_ST, d2_TT, d2_SP, d2_TP
