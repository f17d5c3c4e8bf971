"""Full convective adjustment.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_full_convection.F90: mix statically unstable portions of each
column to neutral stability.  The reference solves for the mixed-layer
extents directly; here a fixed number of adjacent-pair mixing sweeps
(each sweep homogenizes T/S across every unstable interface,
thickness-weighted, in parallel over odd/even interface sets so
updates never conflict) converges to a stable column — conservative by
construction.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["FullConvectionCfg", "full_convection"]

_EPS = 1e-20


@dataclasses.dataclass(frozen=True)
class FullConvectionCfg:
    # pairwise mixing converges like diffusion: a fully inverted
    # column needs O(nk²) sweeps.  0 → auto (2·nk²).
    n_sweeps: int = 0


def _mix_pairs(T, S, h, dRdT, dRdS, start: int):
    """Homogenize unstable pairs (k, k+1) for k = start, start+2, …"""
    nk = T.shape[0]
    drho = (dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1]))
    # unstable where density decreases downward
    unstable = drho < 0.0
    parity = (jnp.arange(nk - 1) % 2) == (start % 2)
    act = unstable & parity.reshape((-1,) + (1,) * (T.ndim - 1))

    hw = h + _EPS

    def mixed(a):
        pair_sum = a[:-1] * hw[:-1] + a[1:] * hw[1:]
        pair_h = hw[:-1] + hw[1:]
        m = pair_sum / pair_h
        up = jnp.where(act, m, a[:-1])
        dn = jnp.where(act, m, a[1:])
        out = a
        out = out.at[:-1].set(up)
        # the lower member of each acted pair: combine without clobber
        out = out.at[1:].set(jnp.where(act, m, out[1:]))
        return out

    return mixed(T), mixed(S)


def full_convection(cfg: FullConvectionCfg, T, S, h, eos, p_int=None):
    """Convectively adjust (T, S); returns the stabilized fields."""
    if p_int is None:
        p_int = jnp.zeros_like(h[1:])
    n_sweeps = cfg.n_sweeps or 2 * T.shape[0] ** 2
    T_i = 0.5 * (T[:-1] + T[1:])
    S_i = 0.5 * (S[:-1] + S[1:])
    for n in range(n_sweeps):
        dRdT, dRdS = eos.density_derivs(T_i, S_i, p_int)
        T, S = _mix_pairs(T, S, h, dRdT, dRdS, n)
        T_i = 0.5 * (T[:-1] + T[1:])
        S_i = 0.5 * (S[:-1] + S[1:])
    return T, S
