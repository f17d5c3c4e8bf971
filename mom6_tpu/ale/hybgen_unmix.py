"""Hybgen unmixing: prepare columns for hybrid regridding.

Re-design of /root/reference/src/ALE/MOM_hybgen_unmix.F90
(hybgen_unmix :120, hybgen_column_unmix :237): before a HYCOM-style
hybrid regrid, the deepest inflated layer is checked against its
coordinate-density target and, when it is too light, water is
entrained, swapped, or split so the layer density relaxes toward the
target without creating new water masses ("runaway" T/S growth is
bounded by the properties of the overlying layers).

TPU form: the reference's per-column searches and branches become
vectorized one-hot updates at the dynamically located deepest
inflated layer ``kp`` — gathers via take_along_axis, scatters via
``K == kp`` masks, and the three mutually exclusive cases blended
with jnp.where.  No data-dependent Python control flow, so the whole
pass jits into one fused elementwise program.

Simplifications vs the reference (documented for parity review):
``fixlay`` (the deepest fixed-coordinate layer) is a static config
integer rather than the per-column hybgen_column_init computation,
and the terrain-following exclusion is a static flag; the relaxation
coefficient qhrlx is a scalar (QHYBRLX).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["HybgenUnmixCfg", "hybgen_unmix"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class HybgenUnmixCfg:
    hybiso: float = 0.01      # HYBGEN_REMAP_DENSITY_MATCH [kg m-3]
    qhybrlx: float = 0.25     # HYBGEN_REGRID_RELAX (qhybrlx) [nondim]
    fixlay: int = 2           # deepest fixed-coordinate layer (1-based)
    ref_pressure: float = 2.0e7   # P_REF [Pa]
    h_thin: float = 1e-6      # vanished-layer threshold [m]


def _gather(x, idx):
    """x[idx] along the layer axis per column: idx (nj, ni) ints."""
    return jnp.take_along_axis(x, idx[None], axis=0)[0]


def _scatter(x, idx, val, K):
    """x with x[idx] := val per column."""
    return jnp.where(K == idx[None], val[None], x)


def hybgen_unmix(h, T, S, tracers, eos, rlay,
                 cfg: HybgenUnmixCfg = HybgenUnmixCfg()):
    """Returns (h, T, S, tracers) with the deepest inflated layer
    unmixed toward its target density (hybgen_column_unmix).

    ``rlay``: the (nk,) coordinate target densities; ``tracers`` a
    dict of (nk, njh, nih) passive tracers (trcflg=3 standard
    handling) or None."""
    nk = h.shape[0]
    if nk < 3 or eos is None:
        return h, T, S, tracers
    tracers = tracers or {}
    K = jnp.arange(nk).reshape((-1,) + (1,) * (h.ndim - 1))
    p_ref = jnp.full_like(T, cfg.ref_pressure)
    Rcv = eos.density(T, S, p_ref)
    tgt = jnp.asarray(rlay).reshape((-1,) + (1,) * (h.ndim - 1)) \
        * jnp.ones_like(h)
    # the reference requires 1-based k > fixlay+1 before unmixing
    # (MOM_hybgen_unmix.F90:361): 0-based kp must exceed fixlay
    fix0 = cfg.fixlay

    # deepest layer k >= 2 (0-based) with significant thickness
    kp = jnp.max(jnp.where((h >= cfg.h_thin) & (K >= 2), K, 1), axis=0)

    def at(x, idx):
        return _gather(x, idx)

    def col(idx):
        return (at(h, idx), at(T, idx), at(S, idx), at(Rcv, idx),
                at(tgt, idx))

    km1 = jnp.maximum(kp - 1, 0)
    ka = jnp.maximum(kp - 2, 0)
    h_k, T_k, S_k, R_k, G_k = col(kp)
    h_m, T_m, S_m, R_m, G_m = col(km1)
    R_a = at(Rcv, ka)

    base = (kp > fix0) & (h_m >= cfg.h_thin) & (G_k > R_k)
    cond_A = base & (R_m > R_k) & (R_a > R_k)
    cond_B = base & (R_m > R_k) & ~cond_A

    # ---- case A: entrain the whole too-light bottom layer upward ----
    qA = h_k / ((h_k + h_m) + _EPS)
    TA_m = T_m - qA * (T_m - T_k)
    SA_m = S_m - qA * (S_m - S_k)
    hA_m = h_m + h_k

    # ---- case B: swap the layer with (a portion of) the one above ----
    thin_b = h_k <= h_m
    qB = jnp.where(thin_b, h_k / (h_m + _EPS), h_m / (h_k + _EPS))
    # thin bottom: k-1 gets a q-weighted pull toward k's properties,
    # k receives k-1's old properties (full swap of the bottom layer)
    TB_m = jnp.where(thin_b, T_m + qB * (T_k - T_m), T_k)
    SB_m = jnp.where(thin_b, S_m + qB * (S_k - S_m), S_k)
    TB_k = jnp.where(thin_b, T_m, T_k + qB * (T_m - T_k))
    SB_k = jnp.where(thin_b, S_m, S_k + qB * (S_m - S_k))

    # blend cases A/B into the fields (mutually exclusive one-hots)
    def apply_AB(x, xA_m, xB_m, xB_k):
        x_m_new = jnp.where(cond_A, xA_m, jnp.where(cond_B, xB_m,
                                                    at(x, km1)))
        x_k_new = jnp.where(cond_B, xB_k, at(x, kp))
        x = _scatter(x, km1, x_m_new, K)
        return _scatter(x, kp, x_k_new, K)

    T = apply_AB(T, TA_m, TB_m, TB_k)
    S = apply_AB(S, SA_m, SB_m, SB_k)
    new_tr = {}
    for name, tr in tracers.items():
        t_k, t_m = at(tr, kp), at(tr, km1)
        trA_m = t_m - qA * (t_m - t_k)
        trB_m = jnp.where(thin_b, t_m + qB * (t_k - t_m), t_k)
        trB_k = jnp.where(thin_b, t_m, t_k + qB * (t_m - t_k))
        new_tr[name] = apply_AB(tr, trA_m, trB_m, trB_k)
    tracers = new_tr
    h = _scatter(h, km1, jnp.where(cond_A, hA_m, h_m), K)
    h = _scatter(h, kp, jnp.where(cond_A, jnp.zeros_like(h_k), h_k), K)
    # after a full entrainment the deepest inflated layer moves up one
    kp = jnp.where(cond_A, km1, kp)

    # ---- case C: split the too-light layer into a target-density
    # sublayer and one matching the layer above (lunmix) ----
    Rcv = eos.density(T, S, p_ref)
    km1 = jnp.maximum(kp - 1, 0)
    h_k, T_k, S_k, R_k, G_k = col(kp)
    h_m, T_m, S_m, R_m, G_m = col(km1)
    km2 = jnp.maximum(kp - 2, 0)
    G_m2 = at(tgt, km2)

    cond_C = ((kp > fix0) & (h_m >= cfg.h_thin)
              & (R_k < G_k) & (R_k > G_m)
              & (jnp.abs(G_m - R_m) < cfg.hybiso)
              & (R_k - R_m > 0.001 * (G_k - G_m)))

    # reference anchor layer ka: deepest kt <= kp-2 whose density is at
    # least one target-interval lighter than layer kp-1
    dG_ref = G_m - G_m2
    cand = (K <= (kp - 2)[None]) & (K >= 1) \
        & ((R_m[None] - Rcv) >= dG_ref[None])
    kaC = jnp.max(jnp.where(cand, K, 0), axis=0)
    T_a = at(T, kaC)
    S_a = at(S, kaC)

    delsm = jnp.abs(S_a - S_m)
    dels = jnp.abs(S_m - S_k)
    deltm = jnp.abs(T_a - T_m)
    delt = jnp.abs(T_m - T_k)
    dRdT, dRdS = eos.density_derivs(T_m, S_m,
                                    jnp.full_like(T_m,
                                                  cfg.ref_pressure))
    abs_dRdT = jnp.abs(dRdT) + _EPS
    abs_dRdS = jnp.abs(dRdS) + _EPS
    dG = G_k - G_m
    deltm = jnp.minimum(deltm, dG / abs_dRdT)
    delsm = jnp.minimum(delsm, dG / abs_dRdS)

    qts = jnp.zeros_like(dels)
    lim_s = jnp.minimum(delsm - dels, dels)
    qts = jnp.where(qts * dels < lim_s, lim_s / (dels + _EPS), qts)
    lim_t = jnp.minimum(deltm - delt, delt)
    qts = jnp.where(qts * delt < lim_t, lim_t / (delt + _EPS), qts)

    use_R = (1.0 + qts) * (G_k - R_k) < qts * (G_k - R_m)
    q = jnp.where(use_R,
                  cfg.qhybrlx * (G_k - R_k) / ((G_k - R_m) + _EPS),
                  cfg.qhybrlx * qts / (1.0 + qts))
    q = jnp.clip(q, 0.0, 0.5)
    frac_dts = q / (1.0 - q)
    h_hat = jnp.where(cond_C, q * h_k, 0.0)
    h_m_new = h_m + h_hat
    h_k_new = h_k - h_hat
    TC_k = T_k + frac_dts * (T_k - T_m)
    SC_k = S_k + frac_dts * (S_k - S_m)

    h = _scatter(h, km1, h_m_new, K)
    h = _scatter(h, kp, h_k_new, K)
    T = _scatter(T, kp, jnp.where(cond_C, TC_k, T_k), K)
    S = _scatter(S, kp, jnp.where(cond_C, SC_k, S_k), K)
    qtr = h_hat / (h_m_new + _EPS)
    new_tr = {}
    for name, tr in tracers.items():
        t_k, t_m = at(tr, kp), at(tr, km1)
        t_m_new = t_m + qtr * (t_k - t_m)
        new_tr[name] = _scatter(tr, km1,
                                jnp.where(cond_C, t_m_new, t_m), K)
    return h, T, S, new_tr
