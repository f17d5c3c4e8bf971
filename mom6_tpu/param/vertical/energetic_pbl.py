"""Energetically-constrained planetary boundary layer (ePBL).

Re-design of /root/reference/src/parameterizations/vertical/
MOM_energetic_PBL.F90: the surface boundary layer deepens only as far
as the available mechanical + convective TKE can pay the potential
energy cost of mixing.  This branch-free formulation reproduces the
reference's energetic structure:

* mechanical TKE input mstar·u*³ with MSTAR_MODE options: a constant
  (MSTAR_MODE=0) or the OM4-style rotation/stabilization-dependent
  form mstar = c/(1 + (a·|f|·h_bl/u*)^b) (find_mstar, :2100);
* convective release nstar·⟨w'B'⟩ integrated over the boundary layer,
  with the TKE_DECAY exponential penetration discount exp(−z/h_decay)
  where h_decay scales with u*/|f| (:1478);
* the PE cost of homogenizing the column above each interface
  (computed in closed form from cumulative moments rather than the
  reference's per-interface marching loop);
* the mixing depth is the deepest interface the budget affords; the
  MLD↔decay-scale coupling is resolved by a fixed-count iteration
  (the reference iterates per column to convergence, :860);
* interface diffusivity Kd = c_K·v*·l(z) from the turbulent velocity
  v* = (c·(u*³ + nstar w*³))^{1/3} and the parabolic mixing length
  l(z) = z(1 − z/MLD) (+ the reference's minimum mixing length), in
  place of round 1's borrowed KPP shape.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["EPBLCfg", "energetic_pbl"]

_EPS = 1e-14
_VON_KARMAN = 0.4


@dataclasses.dataclass(frozen=True)
class EPBLCfg:
    mstar: float = 1.2           # EPBL_MSTAR mechanical efficiency
    mstar_mode: int = 0          # 0: constant; 2: OM4 rotation-dep.
    mstar_at_xint: float = 0.095  # OM4 fit parameters (MSTAR2_COEF*)
    mstar_slope: float = 0.85
    nstar: float = 0.2           # convective efficiency
    tke_decay: float = 2.5       # TKE_DECAY: e-foldings over h_bl
    min_mld: float = 1.0
    max_mld: float = 0.0         # 0 → no cap
    # USE_MLD_ITERATION (MOM_energetic_PBL.F90:2252, default true):
    # resolve the MLD<->mstar/decay coupling by fixed-point iteration;
    # False makes a single pass from the initial MLD guess
    use_mld_iteration: bool = True
    mld_iters: int = 3           # MLD↔decay fixed-point iterations
                                 # (EPBL_MLD_MAX_ITS analog)
    c_k: float = 0.55            # Kd = c_k · v* · l(z)
    vstar_scale: float = 1.0
    min_mix_len: float = 1.0     # [m]
    kd_max: float = 0.1          # cap on boundary-layer Kd [m2 s-1]


class EPBLResult(NamedTuple):
    kd_int: jnp.ndarray
    mld: jnp.ndarray


def _mstar_value(cfg: EPBLCfg, ustar, absf, h_bl):
    if cfg.mstar_mode == 0:
        return jnp.full_like(ustar, cfg.mstar)
    # OM4-style: mixing efficiency drops when the boundary layer is
    # deep compared with the Ekman depth u*/f (find_mstar)
    x = absf * h_bl / jnp.maximum(ustar, 1e-10)
    return cfg.mstar / (1.0 + (cfg.mstar_at_xint * x) ** cfg.mstar_slope)


def energetic_pbl(cfg: EPBLCfg, h, T, S, eos, rho0, g, dt,
                  ustar=None, buoy_flux=None, absf=None):
    """Returns boundary-layer Kd (nk+1, ...) and the MLD [m].

    buoy_flux: destabilizing-positive surface buoyancy flux [m2 s-3];
    absf: |f| (njh, nih) for the rotation-dependent mstar mode."""
    nk = h.shape[0]
    if ustar is None:
        ustar = jnp.zeros_like(h[0])
    if buoy_flux is None:
        buoy_flux = jnp.zeros_like(h[0])
    if absf is None:
        absf = jnp.full_like(h[0], 1e-4)

    z_int = jnp.concatenate([jnp.zeros_like(h[:1]),
                             jnp.cumsum(h, axis=0)], axis=0)
    z_mid = 0.5 * (z_int[:-1] + z_int[1:])
    # surface-referenced potential density: the PE cost of mixing
    # must not include compressibility
    if T is not None and eos is not None:
        rho = eos.density(T, S, jnp.zeros_like(T))
    else:
        rho = jnp.full_like(h, rho0)

    # PE cost of homogenizing everything above interface K (J m-2):
    # g·[ Σ ρ h z_mid − ρ̄ Σ h z_mid ] above each interface (z is
    # depth, positive down; stable columns give cost ≥ 0)
    m_cum = jnp.cumsum(rho * h, axis=0)                  # mass/area
    hz_cum = jnp.cumsum(h * z_mid, axis=0)
    rhz_cum = jnp.cumsum(rho * h * z_mid, axis=0)
    h_cum = jnp.cumsum(h, axis=0)
    rho_bar = m_cum / (h_cum + _EPS)
    cost = jnp.maximum(g * (rhz_cum - rho_bar * hz_cum), 0.0)

    w_star3 = jnp.maximum(buoy_flux, 0.0)      # [m2 s-3] × depth later

    # TKE penetration decay over the natural (Ekman-like) depth
    # u*/(TKE_DECAY·|f|) (MOM_energetic_PBL.F90 TKE_DECAY: "ratio of
    # the natural Ekman depth to the TKE decay scale"), with the
    # convective velocity contributing in free convection
    w_conv = (jnp.maximum(w_star3, 0.0) * 50.0) ** (1.0 / 3.0)
    v_scale = jnp.maximum(jnp.maximum(ustar, 0.5 * w_conv), 1e-8)
    decay = jnp.maximum(
        v_scale / (jnp.maximum(absf, 1e-8) * cfg.tke_decay), 1.0)

    # fixed-point iteration: mstar depends on the MLD it determines
    # (the reference iterates per column, :860)
    mld = jnp.maximum(h[0], cfg.min_mld)
    n_its = max(cfg.mld_iters, 1) if cfg.use_mld_iteration else 1
    for _ in range(n_its):
        mstar = _mstar_value(cfg, ustar, absf, mld)
        mech = mstar * rho0 * ustar[None] ** 3 * dt
        conv = cfg.nstar * rho0 * w_star3[None] * z_int[1:] * dt
        avail = mech * jnp.exp(-z_int[1:] / decay[None]) + conv
        affordable = cost <= avail
        z_aff = jnp.where(affordable, z_int[1:], 0.0)
        mld = jnp.maximum(jnp.max(z_aff, axis=0), cfg.min_mld)
        if cfg.max_mld > 0.0:
            mld = jnp.minimum(mld, cfg.max_mld)

    # diffusivity from v* and the parabolic mixing length
    vstar = cfg.vstar_scale * (
        ustar[None] ** 3
        + cfg.nstar * w_star3[None] * mld[None]) ** (1.0 / 3.0)
    zfrac = jnp.clip(z_int / jnp.maximum(mld[None], _EPS), 0.0, 1.0)
    mix_len = jnp.maximum(
        mld[None] * zfrac * (1.0 - zfrac), 0.0)
    in_bl = (z_int > 0.0) & (zfrac < 1.0)
    mix_len = jnp.where(in_bl, jnp.maximum(mix_len, cfg.min_mix_len),
                        mix_len)
    kd = jnp.minimum(cfg.c_k * vstar * mix_len, cfg.kd_max)
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    return EPBLResult(kd_int=kd, mld=mld)
