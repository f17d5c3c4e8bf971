"""Energy requirement of diapycnal mixing (diagnostic).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diapyc_energy_req.F90 (diapyc_energy_req_calc, :79): the
mechanical energy needed to carry out a prescribed diapycnal
diffusivity profile equals the potential-energy increase it causes.
The reference integrates the tridiagonal mixing operator analytically
in several equivalent forms; here the PE difference is evaluated
directly: apply the same implicit vertical diffusion used by the
model (tracer_vertdiff) to T and S, and return

  ΔPE = g Σ_k ρ_k z_k h_k |_after − |_before      [J m-2]

with z the (downward-positive) layer-centre depth, so mixing a stably
stratified column yields a positive energy requirement.
"""

from __future__ import annotations

import jax.numpy as jnp

from mom6_tpu.tracer.vertdiff import tracer_vertdiff

__all__ = ["diapyc_energy_req"]


def _pe(h, T, S, eos, g):
    z_bot = jnp.cumsum(h, axis=0)
    z_c = z_bot - 0.5 * h                  # depth, positive down
    rho = eos.density(T, S, jnp.zeros_like(T))
    # PE relative to z=0 with depth positive down: lifting dense water
    # up (mixing) INCREASES −Σ ρ g z h ... use sign so that mixing a
    # stable profile gives a positive requirement
    return -g * jnp.sum(rho * z_c * h, axis=0)


def diapyc_energy_req(h, T, S, kd_int, dt, eos, g=9.81):
    """Energy per unit area [J m-2] required to apply kd_int for dt.

    h/T/S: (nk, nj, ni); kd_int: (nk+1, nj, ni) interface diffusivity.
    Returns (nj, ni); positive where mixing raises the centre of
    mass."""
    pe0 = _pe(h, T, S, eos, g)
    T2 = tracer_vertdiff(T, h, kd_int, dt)
    S2 = tracer_vertdiff(S, h, kd_int, dt)
    return _pe(h, T2, S2, eos, g) - pe0
