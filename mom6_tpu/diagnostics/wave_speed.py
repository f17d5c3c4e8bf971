"""Baroclinic gravity-wave speeds.

Re-design of /root/reference/src/diagnostics/MOM_wave_speed.F90: the
first internal-mode speed per column.  Two estimators:

* ``wave_speed_wkb`` — the WKB integral c1 = (1/π) ∫ N dz (cheap,
  used for resolution functions / VarMix);
* ``wave_speed_modal`` — the proper generalized eigenproblem on the
  interface-displacement tridiagonal operator, solved by inverse
  power iteration with the same Thomas solve used elsewhere (the
  reference's tridiagonal eigen-solve, MOM_wave_speed.F90:1757 file).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mom6_tpu.core.vertical_grid import VerticalGrid

__all__ = ["wave_speed_wkb", "brunt_vaisala2", "wave_speeds"]

_H_NEGLECT = 1e-20


def brunt_vaisala2(vgrid: VerticalGrid, h, T=None, S=None, eos=None,
                   p_int=None):
    """N² at interior interfaces (nk-1, ...) from the EOS or Rlay."""
    g = vgrid.g_Earth
    rho0 = vgrid.Rho0
    if T is not None and eos is not None:
        if p_int is None:
            zs = jnp.cumsum(h, axis=0)
            p_int = rho0 * g * zs[:-1]
        T_i = 0.5 * (T[:-1] + T[1:])
        S_i = 0.5 * (S[:-1] + S[1:])
        dRdT, dRdS = eos.density_derivs(T_i, S_i, p_int)
        drho = dRdT * (T[1:] - T[:-1]) + dRdS * (S[1:] - S[:-1])
    else:
        rl = vgrid.Rlay.reshape((-1,) + (1,) * (h.ndim - 1))
        drho = jnp.broadcast_to(rl[1:] - rl[:-1], h[1:].shape)
    dz = 0.5 * (h[:-1] + h[1:]) + _H_NEGLECT
    n2 = (g / rho0) * drho / dz
    return jnp.maximum(n2, 0.0)


def wave_speed_wkb(vgrid: VerticalGrid, h, T=None, S=None, eos=None):
    """First-mode speed c1 ≈ (1/π) ∫ N dz per column → (...,) array."""
    n2 = brunt_vaisala2(vgrid, h, T, S, eos)
    dz = 0.5 * (h[:-1] + h[1:])
    return jnp.sum(jnp.sqrt(n2) * dz, axis=0) / math.pi


def _thomas_rows(lo, dg, up, rhs):
    """Per-column tridiagonal solve along the leading axis."""
    def fwd(carry, row):
        cp, dp_ = carry
        l, d, u_, b = row
        denom = d - l * cp
        inv = 1.0 / denom
        return (u_ * inv, (b - l * dp_) * inv), (u_ * inv,
                                                 (b - l * dp_) * inv)

    z = jnp.zeros_like(rhs[0])
    _, (cps, dps) = jax.lax.scan(fwd, (z, z), (lo, dg, up, rhs))

    def bwd(carry, row):
        cp, dp_ = row
        x = dp_ - cp * carry
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return xs


def wave_speeds(vgrid: VerticalGrid, h, T=None, S=None, eos=None,
                n_mode: int = 1, iters: int = 10, c_min: float = 1e-3):
    """Baroclinic mode speeds c_1..c_nMode per column → (n_mode, ...).

    The proper discrete eigenproblem of MOM_wave_speed.F90
    wave_speeds: interface displacements e solve A e = (1/c²) e with
    the tridiagonal A_K = [−1/(g'_K h_{k−1}),
    (1/h_{k−1}+1/h_k)/g'_K, −1/(g'_K h_k)] (two-layer limit:
    c² = g' h0 h1/(h0+h1) exactly).  Instead of the reference's
    root-bracketing on the characteristic determinant, each mode runs
    fixed-count shifted inverse power iteration (branch-free Thomas
    scans) from the WKB estimate c_wkb/m, followed by a Rayleigh
    quotient — cubically accurate with static control flow."""
    nk = h.shape[0]
    if nk < 2:
        return jnp.zeros((n_mode,) + h.shape[1:])
    n2 = brunt_vaisala2(vgrid, h, T, S, eos)          # (nk-1, ...)
    dz_i = 0.5 * (h[:-1] + h[1:])
    gp = jnp.maximum(n2 * dz_i, 1e-12)                # g' at interfaces
    h_up = jnp.maximum(h[:-1], _H_NEGLECT)            # layer above K
    h_dn = jnp.maximum(h[1:], _H_NEGLECT)             # layer below K
    lo = -1.0 / (gp * h_up)
    up = -1.0 / (gp * h_dn)
    dg = (1.0 / h_up + 1.0 / h_dn) / gp
    c_wkb = jnp.sum(jnp.sqrt(n2) * dz_i, axis=0) / math.pi
    ok = c_wkb > c_min
    c_safe = jnp.where(ok, c_wkb, 1.0)

    nf = nk - 1
    K = jnp.arange(nf).reshape((-1,) + (1,) * (h.ndim - 1))

    out = []
    for m in range(1, n_mode + 1):
        sigma = ((m / c_safe) ** 2)[None]
        # mode-m-shaped start vector so the iteration locks onto the
        # intended branch even when eigenvalues are closely spaced
        x = jnp.sin(m * math.pi * (K + 1.0) / nk) + 0.0 * gp
        for _ in range(iters):
            x = _thomas_rows(lo, dg - sigma, up, x)
            x = x / (jnp.sqrt(jnp.sum(x * x, axis=0))[None]
                     + _H_NEGLECT)
        # Rayleigh quotient on the unshifted operator
        Ax = dg * x
        Ax = Ax.at[1:].add(lo[1:] * x[:-1])
        Ax = Ax.at[:-1].add(up[:-1] * x[1:])
        lam = jnp.sum(x * Ax, axis=0) / (jnp.sum(x * x, axis=0)
                                         + _H_NEGLECT)
        c_m = jnp.where(ok & (lam > 0.0),
                        1.0 / jnp.sqrt(jnp.maximum(lam, 1e-30)), 0.0)
        out.append(c_m)
    return jnp.stack(out)
