"""Kraus-Turner-type bulk mixed layer (layer mode).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_bulk_mixed_layer.F90 (bulkmixedlayer, :259): the surface layer is
a bulk mixed layer that deepens by entraining interior layers when the
turbulent kinetic energy supplied by wind work (m* u*^3 dt), surface
buoyancy loss, and the mean kinetic energy released by homogenizing
the velocity shear (bulk_Ri_ML) exceeds the potential-energy cost of
lifting the denser water into the mixed layer.

The energetics follow mechanical_entrainment
(MOM_bulk_mixed_layer.F90:1783-1850):
  * the TKE available at depth decays as exp(-htot * Idecay) with
    Idecay = TKE_DECAY * absf / u*  (:1536-1537), where absf blends
    |f| with the full planetary rotation 2*Omega through
    ML_OMEGA_FRAC (:1530-1534);
  * entraining a layer of thickness h costs h * dRL with
    dRL = g/(2 Rho0) * (R0_k * htot - sum R0 h)  (:1787) and releases
    bulk_Ri_ML * dMKE of mean kinetic energy from the velocity
    difference between the mixed layer and the entrained layer
    (:1789);
  * the mixed layer never ends shallower than HMIX_MIN (:1783,1956).

The reference additionally tracks NKML sublayers, buffer-layer
detrainment (LIMIT_BUFFER_DETRAIN), and density re-sorting; this
version is a single-bulk-layer scan down the column — branch-free and
jit-friendly — that reproduces the deepening energetics.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["BulkMixedLayerCfg", "bulk_mixed_layer"]

_EPS = 1e-30


@dataclasses.dataclass(frozen=True)
class BulkMixedLayerCfg:
    mstar: float = 1.2           # wind-work efficiency (MSTAR)
    nstar: float = 0.15          # convective release efficiency (NSTAR)
    bulk_ri: float = 0.05        # BULK_RI_ML: MKE->entrainment efficiency
    tke_decay: float = 2.5       # TKE_DECAY: Ekman-depth/decay-scale ratio
    hmix_min: float = 0.0        # HMIX_MIN [m]
    omega_frac: float = 0.0      # ML_OMEGA_FRAC: 2*Omega vs f blend
    omega: float = 7.2921e-5     # OMEGA [s-1]
    g: float = 9.81
    rho0: float = 1035.0
    h_min: float = 1e-3


def bulk_mixed_layer(cfg: BulkMixedLayerCfg, h, T, S, eos, ustar,
                     buoy_flux, dt, tracers: dict | None = None,
                     u=None, v=None, absf=None):
    """Energetic mixed-layer deepening + homogenization.

    h/T/S: (nk, nj, ni); ustar: (nj, ni) friction velocity [m s-1];
    buoy_flux: (nj, ni) surface buoyancy flux, positive = buoyancy
    LOSS (destabilizing) [m2 s-3]; u/v: cell-centered velocities
    (nk, nj, ni) for the bulk-Ri MKE release (None -> no MKE term);
    absf: (nj, ni) |f| at h points for the TKE decay scale (None ->
    no decay).  Returns (h, T, S, tracers, hml)."""
    nk = h.shape[0]
    rho = eos.density(T, S, jnp.zeros_like(T))     # R0: potential density

    # available TKE per unit area [m3 s-2]
    tke0 = dt * (cfg.mstar * ustar ** 3
                 + cfg.nstar * jnp.maximum(buoy_flux, 0.0)
                 * jnp.maximum(h[0], cfg.h_min))

    # TKE decay scale (Idecay_len_TKE, :1536): absf blended with the
    # full rotation rate by ML_OMEGA_FRAC (:1530-1534)
    if absf is not None and cfg.tke_decay > 0.0:
        af = absf
        if cfg.omega_frac > 0.0:
            af = jnp.sqrt(cfg.omega_frac * 4.0 * cfg.omega ** 2
                          + (1.0 - cfg.omega_frac) * af ** 2)
        idecay = cfg.tke_decay * af / jnp.maximum(ustar, 1e-10)
    else:
        idecay = jnp.zeros_like(ustar)

    g_2rho0 = cfg.g / (2.0 * cfg.rho0)
    have_uv = u is not None and v is not None and cfg.bulk_ri > 0.0

    def scan_body(carry, xs):
        tke, htot, r0h, th, sh, uh, vh = carry
        h_k, r0_k, t_k, s_k, u_k, v_k = xs
        # nondimensional TKE decay across this layer (:1790-1792)
        kh = idecay * h_k
        exp_kh = jnp.exp(-kh)
        f1_kh = jnp.where(kh > 2e-5, (1.0 - exp_kh)
                          / jnp.maximum(kh, _EPS),
                          1.0 - kh * (0.5 - kh / 6.0))
        # PE cost per unit entrained thickness (dRL, :1787)
        dRL = g_2rho0 * (r0_k * htot - r0h)
        # MKE released by homogenizing the velocity jump (dMKE, :1789):
        # exact reduced-mass form 0.5 * h*htot/(h+htot) * |dU|^2
        if have_uv:
            u_ml = uh / jnp.maximum(htot, _EPS)
            v_ml = vh / jnp.maximum(htot, _EPS)
            du2 = (u_ml - u_k) ** 2 + (v_ml - v_k) ** 2
            red_m = h_k * htot / jnp.maximum(h_k + htot, _EPS)
            dmke_full = cfg.bulk_ri * 0.5 * red_m * du2
        else:
            du2 = 0.0
            dmke_full = jnp.zeros_like(h_k)
        # TKE left if the whole layer were entrained (:1840)
        tke_full = exp_kh * tke - h_k * dRL * f1_kh + dmke_full
        force_min = htot + h_k <= cfg.hmix_min
        full = (tke_full >= 0.0) | force_min
        # partial entrainment: root of exp(-i*h)*TKE - h*dRL = 0 by
        # one Newton refinement from h0 = TKE/dRL (the reference's
        # dTKE_dh Newton, :1923-1936), floored by the HMIX_MIN
        # deficit (:1956)
        h0 = tke / jnp.maximum(dRL, _EPS)
        e0 = jnp.exp(-jnp.minimum(idecay * h0, 40.0))
        g0 = e0 * tke - h0 * dRL
        gp = idecay * e0 * tke + dRL          # = -g'(h0) > 0
        h_part = h0 + g0 / jnp.maximum(gp, _EPS)
        h_part = jnp.where(dRL > 0.0, h_part, h_k)
        h_part = jnp.maximum(h_part, cfg.hmix_min - htot)
        h_ent = jnp.clip(jnp.where(full, h_k, h_part), 0.0, h_k)
        # budget after the actual entrainment
        khe = idecay * h_ent
        f1e = jnp.where(khe > 2e-5, (1.0 - jnp.exp(-khe))
                        / jnp.maximum(khe, _EPS),
                        1.0 - khe * (0.5 - khe / 6.0))
        if have_uv:
            red_e = h_ent * htot / jnp.maximum(h_ent + htot, _EPS)
            dmke_e = cfg.bulk_ri * 0.5 * red_e * du2
        else:
            dmke_e = 0.0
        tke_new = jnp.maximum(
            jnp.exp(-khe) * tke - h_ent * dRL * f1e + dmke_e, 0.0)
        new_carry = (tke_new, htot + h_ent, r0h + r0_k * h_ent,
                     th + t_k * h_ent, sh + s_k * h_ent,
                     uh + (u_k * h_ent if have_uv else 0.0),
                     vh + (v_k * h_ent if have_uv else 0.0))
        return new_carry, h_ent

    u3 = u if have_uv else jnp.zeros_like(h)
    v3 = v if have_uv else jnp.zeros_like(h)
    init = (tke0, h[0], rho[0] * h[0], T[0] * h[0], S[0] * h[0],
            u3[0] * h[0], v3[0] * h[0])
    xs = (h[1:], rho[1:], T[1:], S[1:], u3[1:], v3[1:])
    (_, h_ml, _, th, sh, _, _), h_ent = jax.lax.scan(scan_body, init, xs)

    dh = jnp.concatenate([jnp.zeros_like(h[:1]), h_ent], axis=0)
    t_ml = th / jnp.maximum(h_ml, _EPS)
    s_ml = sh / jnp.maximum(h_ml, _EPS)
    fully = dh >= h - 1e-12 * jnp.maximum(h, _EPS)

    def homog(t, t_ml_val):
        t_new = jnp.where(fully, t_ml_val[None], t)
        return t_new.at[0].set(t_ml_val)

    T_new = homog(T, t_ml)
    S_new = homog(S, s_ml)
    h_new = (h - dh).at[0].set(h_ml)
    out = None
    if tracers is not None:
        out = {}
        for name, t in tracers.items():
            tr_ml = (t[0] * h[0] + jnp.sum(dh * t, axis=0)) \
                / jnp.maximum(h_ml, _EPS)
            out[name] = homog(t, tr_ml)
    return h_new, T_new, S_new, out, h_ml
