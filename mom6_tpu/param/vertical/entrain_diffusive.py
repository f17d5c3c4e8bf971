"""Layer-mode diapycnal entrainment (diffusive limit).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_entrain_diffusive.F90 (entrainment_diffusive, :59; Hallberg,
MWR 2000): in isopycnal mode, interior diapycnal diffusion Kd
migrates interfaces, expressed as the entrainments ea/eb of each
layer from its neighbors.

Two solvers:

* ``implicit=True`` (default; the reference's scheme): solve for the
  layer density fluxes F_k — the density flux through layer k over
  the step divided by the density difference across the interface
  below — from the implicit relation

    F_k · h_k^new = grats_k/(4(1+dsp1_ds_k)) · dt·Kd_k,
    h_k^new = h_k + (1+dsp1_ds_k)F_k − F_{k-1} − dsp1_ds_{k+1}F_{k+1}

  (MOM_entrain_diffusive.F90:538-585) with dsp1_ds the ratio of
  g_prime across the interfaces below/above the layer, via the
  reference's damped-Newton sweep: per iteration, the stable quadratic
  root per layer plus the tridiagonal coupling correction (the
  c1/b1 forward elimination + backward substitution of :571-585),
  clamped into [minF, maxF] where maxF encodes the no-depletion
  bounds accumulated up and down the column (:407-470) and minF the
  no-interaction lower bound (:498-503).  ea/eb then follow the
  non-BULKMIXEDLAYER branch of F_to_ent (:1019-1033), and h/tracers
  update with a Thomas solve of the implicit entrainment tridiagonal
  (triDiagTS semantics).  Fixed iteration counts, branch-free,
  jittable; the bulk-mixed-layer buffer coupling (kb/Ent_bl) is NOT
  carried — BML runs route through bulk_mixed_layer first and the
  interior solve treats all layers as interior.

* ``implicit=False``: the v1 explicit donor-limited exchange
  (unconditionally stable, same diffusive equilibrium, but per-step
  rates are forward-Euler).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["EntrainDiffusiveCfg", "entrainment_diffusive"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class EntrainDiffusiveCfg:
    frac_max: float = 0.2        # max fraction of a donor layer / step
    h_min: float = 1e-3          # thickness floor in the 1/h rates
    implicit: bool = True        # Hallberg-2000 implicit F solve
    max_ent_it: int = 5          # MAX_ENT_IT (Newton sweeps)
    angstrom: float = 1e-10      # minimum layer thickness [m]
    h_neglect: float = 1e-30


def _no_deplete_bounds(cfg: EntrainDiffusiveCfg, h, dsp1_ds, ds_dsp1):
    """maxF: the largest flux that depletes no layer below Angstrom
    (MOM_entrain_diffusive.F90:407-470, zero surface-buoyancy branch
    — with buoy=0 the downward maxF stay nonnegative so the
    maxF_correct redistribution of :424-433 is identically zero)."""
    nk = h.shape[0]
    Ang = cfg.angstrom
    havail = h - Ang

    def fwd(carry, xs):
        mprev, htot = carry
        dd_k, hav_k = xs
        m_k = dd_k * (mprev + htot)
        return (m_k, htot + hav_k), m_k

    (_, _), m_tail = jax.lax.scan(
        fwd, (jnp.zeros_like(h[0]), havail[0]),
        (ds_dsp1[1:], havail[1:]))
    maxF = jnp.concatenate([jnp.zeros_like(h[:1]), m_tail], axis=0)
    maxF = maxF.at[nk - 1].set(0.0)

    def bwd(carry, xs):
        mnext, htot = carry
        m_k, dd_kp1, hav_k = xs
        m_new = jnp.minimum(m_k, dd_kp1 * mnext + htot)
        return (m_new, htot + hav_k), m_new

    (_, _), m_head = jax.lax.scan(
        bwd, (maxF[nk - 1], havail[nk - 1]),
        (maxF[:nk - 1], dsp1_ds[1:nk], havail[:nk - 1]),
        reverse=True)
    return jnp.concatenate([m_head, maxF[nk - 1:]], axis=0)


def _implicit_F(cfg: EntrainDiffusiveCfg, h, dtkd, dsp1_ds, ds_dsp1):
    """The damped-Newton / tridiagonal sweep for the layer fluxes F
    (MOM_entrain_diffusive.F90:538-585), fixed ``max_ent_it``
    iterations, F pinned to 0 in the top and bottom layers."""
    nk = h.shape[0]
    hm = h + cfg.h_neglect
    I2p2 = 0.5 / (1.0 + dsp1_ds)
    fkq = (2.0 * (2.0 + dsp1_ds + ds_dsp1)) * dtkd      # grats·dtKd

    maxF = _no_deplete_bounds(cfg, h, dsp1_ds, ds_dsp1)

    # initial guess (:505-509) and the no-interaction lower bound
    # (:498-503), both capped by maxF
    F = jnp.minimum(jnp.minimum(maxF, jnp.sqrt(ds_dsp1 * dtkd)),
                    0.5 * (ds_dsp1 + 1.0) * (dtkd / hm))
    minF = jnp.minimum(maxF, 0.9 * I2p2 * fkq
                       / (hm + jnp.sqrt(hm * hm + fkq)))
    zero_row = jnp.zeros_like(h[:1])
    F = jnp.concatenate([zero_row, F[1:nk - 1], zero_row], axis=0)
    minF = jnp.concatenate([zero_row, minF[1:nk - 1], zero_row],
                           axis=0)

    # per-k static inputs for the sweep (k = 1..nk-2)
    sl = slice(1, nk - 1)
    accel = (jnp.arange(1, nk - 1) >= 2).reshape(
        (-1,) + (1,) * (h.ndim - 1))

    def sweep(F):
        def fwd(carry, xs):
            b1, F_km1, dF_km1 = carry
            (h_k, d_k, d_kp1, F_kp1_old, F_k_old, maxF_k, fk_k,
             I2_k, acc) = xs
            fm = (F_km1 - h_k) + d_kp1 * F_kp1_old
            fr = jnp.sqrt(fm * fm + fk_k)
            Fhat = jnp.where(
                fm >= 0.0, I2_k * (fm + fr),
                I2_k * fk_k / jnp.maximum(fr - fm, _EPS))
            Fhat = jnp.minimum(Fhat, maxF_k)
            dF = jnp.where((Fhat >= maxF_k) | (fr <= 0.0), 0.0,
                           I2_k * (fr + fm) / jnp.maximum(fr, _EPS))
            # tridiagonal coupling acceleration (:571-577)
            c1 = dF_km1 * (d_k * b1)
            b1n = 1.0 / jnp.maximum(1.0 - c1 * dF, 1e-12)
            F_acc = jnp.minimum(b1n * (Fhat - F_k_old) + F_k_old,
                                maxF_k)
            F_k = jnp.where(acc, F_acc, Fhat)
            dF = jnp.where(acc & (F_k >= maxF_k), 0.0, dF)
            b1_out = jnp.where(acc, b1n, b1)
            c1_out = jnp.where(acc, c1, 0.0)
            return (b1_out, F_k, dF), (F_k, F_k_old, c1_out)

        carry0 = (jnp.ones_like(h[0]), F[0], jnp.zeros_like(h[0]))
        xs = (h[sl], dsp1_ds[sl], dsp1_ds[2:nk], F[2:nk], F[sl],
              maxF[sl], fkq[sl], I2p2[sl],
              jnp.broadcast_to(accel, h[sl].shape))
        _, (F_mid, Fprev_mid, c1_mid) = jax.lax.scan(fwd, carry0, xs)

        def bwd(carry, xs):
            F_kp1, Fprev_kp1, c1_kp1 = carry
            F_k, Fprev_k, c1_k, maxF_k = xs
            F_fin = jnp.minimum(F_k + c1_kp1 * (F_kp1 - Fprev_kp1),
                                maxF_k)
            return (F_fin, Fprev_k, c1_k), F_fin

        z = jnp.zeros_like(h[0])
        _, F_fin = jax.lax.scan(bwd, (z, z, z),
                                (F_mid, Fprev_mid, c1_mid, maxF[sl]),
                                reverse=True)
        F_new = jnp.concatenate([zero_row, F_fin, zero_row], axis=0)
        return jnp.maximum(F_new, minF)

    for _ in range(cfg.max_ent_it):
        F = sweep(F)
    return F


def _thomas_entrain(ea, eb, h, h_new, tr):
    """Implicit tracer update on the entrainments (triDiagTS
    semantics, MOM_diabatic_aux.F90): (h+ea+eb)T_k − ea T_{k-1}
    − eb T_{k+1} = h T_k_old; conserves Σ h_new·T exactly against
    the matching thickness update."""
    nk = h.shape[0]

    def fwd(carry, xs):
        q_km1, r_km1 = carry
        h_k, ea_k, eb_k, rhs_k = xs
        b = (h_k + ea_k + eb_k) - ea_k * q_km1
        binv = 1.0 / jnp.maximum(b, _EPS)
        q_k = eb_k * binv
        r_k = (rhs_k + ea_k * r_km1) * binv
        return (q_k, r_k), (q_k, r_k)

    rhs = h * tr
    zq = jnp.zeros_like(h[0])
    zr = jnp.zeros_like(rhs[0])
    _, (q, r) = jax.lax.scan(fwd, (zq, zr), (h, ea, eb, rhs))

    def bwd(carry, xs):
        t_kp1 = carry
        q_k, r_k = xs
        t_k = r_k + q_k * t_kp1
        return t_k, t_k

    _, t_new = jax.lax.scan(bwd, zr, (q, r), reverse=True)
    return t_new


def _entrain_implicit(cfg: EntrainDiffusiveCfg, h, kd_int, dt,
                      tracers, gprime):
    nk = h.shape[0]
    kd_lay = 0.5 * (kd_int[:-1] + kd_int[1:nk + 1])
    dtkd = dt * kd_lay
    if gprime is not None:
        # guard degenerate (unstratified) interfaces: g'=0 would make
        # the flux ratios 0/0; treat them as uniform steps instead
        gp = jnp.maximum(jnp.asarray(gprime, h.dtype), _EPS)
        gp = jnp.where(jnp.asarray(gprime, h.dtype) > 0.0, gp, 1.0)
        shape = (-1,) + (1,) * (h.ndim - 1)
        # ds_dsp1_k = g'_k / g'_{k+1} (:295); rows 0 and nk-1 unused
        # (F pinned) / forced to 0 like the reference (:290-291)
        dd = jnp.ones((nk,), h.dtype)
        dd = dd.at[1:nk - 1].set(gp[1:nk - 1] / gp[2:nk])
        dd = dd.at[nk - 1].set(0.0)
        ds_dsp1 = dd.reshape(shape) * jnp.ones_like(h)
        dp = jnp.ones((nk,), h.dtype)
        dp = dp.at[1:nk - 1].set(gp[2:nk] / gp[1:nk - 1])
        dp = dp.at[nk - 1].set(0.0)
        dsp1_ds = dp.reshape(shape) * jnp.ones_like(h)
    else:
        ds_dsp1 = jnp.ones_like(h).at[nk - 1].set(0.0)
        dsp1_ds = jnp.ones_like(h).at[nk - 1].set(0.0)

    F = _implicit_F(cfg, h, dtkd, dsp1_ds, ds_dsp1)

    # F → (ea, eb): the non-BULKMIXEDLAYER branch of F_to_ent
    # (:1019-1033); with buoy=0 all F ≥ 0, but keep the general
    # negative-flux fix-up for completeness
    eb = jnp.maximum(F, 0.0)
    F_km1 = jnp.concatenate([jnp.zeros_like(F[:1]), F[:-1]], axis=0)
    eb_km1 = jnp.concatenate([jnp.zeros_like(F[:1]), eb[:-1]], axis=0)
    ea_raw = dsp1_ds * F - (F_km1 - eb_km1)
    ea = jnp.maximum(ea_raw, 0.0).at[0].set(0.0)
    neg = jnp.minimum(ea_raw, 0.0).at[0].set(0.0)
    # eb(k-1) absorbs a clipped-negative ea(k)
    eb = eb - jnp.concatenate([neg[1:], jnp.zeros_like(F[:1])],
                              axis=0)
    eb = eb.at[nk - 1].set(0.0)

    ea_kp1 = jnp.concatenate([ea[1:], jnp.zeros_like(ea[:1])], axis=0)
    eb_km1 = jnp.concatenate([jnp.zeros_like(eb[:1]), eb[:-1]], axis=0)
    h_new = h + (ea + eb) - (ea_kp1 + eb_km1)

    out = None
    if tracers is not None:
        out = {}
        names = list(tracers)
        stacked = jnp.stack([tracers[n] for n in names], axis=1)
        bc = lambda a: a[:, None]                         # noqa: E731
        t_new = _thomas_entrain(bc(ea), bc(eb), bc(h), bc(h_new),
                                stacked)
        for i, n in enumerate(names):
            out[n] = t_new[:, i]

    # interface exchange diagnostic: net gain of the layer below
    # interface k from above
    f_full = jnp.concatenate(
        [jnp.zeros_like(h[:1]), ea[1:] - eb[:-1],
         jnp.zeros_like(h[:1])], axis=0)
    return h_new, out, f_full


def entrainment_diffusive(cfg: EntrainDiffusiveCfg, h, kd_int, dt,
                          tracers: dict | None = None, gprime=None):
    """Apply diffusive entrainment to thicknesses (and tracers).

    h: (nk, nj, ni) layer thickness; kd_int: (nk+1, nj, ni) interface
    diffusivity [m2 s-1] (rows 0 and nk are ignored — no entrainment
    through the surface or bottom); gprime: optional (nk+1,) reduced
    gravities weighting the flux ratios (implicit path).  Returns
    (h_new, tracers_new, f) with f the (nk+1, ...) interface exchange
    (positive = the layer below the interface gained mass from
    above)."""
    if cfg.implicit:
        kdi = jnp.broadcast_to(kd_int, (h.shape[0] + 1,) + h.shape[1:])
        return _entrain_implicit(cfg, h, kdi, dt, tracers, gprime)
    nk = h.shape[0]
    h_up = h[:-1]                       # layer above interface 1..nk-1
    h_dn = h[1:]                        # layer below
    f = kd_int[1:nk] * dt * (1.0 / jnp.maximum(h_dn, cfg.h_min)
                             - 1.0 / jnp.maximum(h_up, cfg.h_min))
    # donor limiting: downward transfer draws on the layer above,
    # upward transfer on the layer below
    f = jnp.clip(f, -cfg.frac_max * h_dn, cfg.frac_max * h_up)
    zero = jnp.zeros_like(h[:1])
    f_full = jnp.concatenate([zero, f, zero], axis=0)   # (nk+1, ...)

    # dh_k = f_k − f_{k+1}: telescoping, exact mass conservation
    h_new = h + f_full[:-1] - f_full[1:]

    out = None
    if tracers is not None:
        out = {}
        for name, t in tracers.items():
            t_up = jnp.concatenate([t[:1], t[:-1]], axis=0)
            # donor tracer at each interface: the upper layer when the
            # flux is downward (f>0), else the lower layer
            t_don = jnp.where(f_full[:-1] > 0, t_up, t)
            t_don_b = jnp.concatenate([t_don[1:], t[-1:]], axis=0)
            content = (t * h + f_full[:-1] * t_don
                       - f_full[1:] * t_don_b)
            out[name] = content / jnp.maximum(h_new, _EPS)
    return h_new, out, f_full
