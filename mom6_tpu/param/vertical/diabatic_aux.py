"""Diabatic auxiliaries: surface-flux application, frazil, u,v at h.

Re-design of /root/reference/src/parameterizations/vertical/
MOM_diabatic_aux.F90: `applyBoundaryFluxesInOut` (:1097) deposits the
surface heat / salt / freshwater-mass fluxes into the upper ocean
(with penetrating shortwave distributed by the opacity profile),
`make_frazil` (:95) clamps water below the (pressure- and
salinity-dependent) freezing point back to it and accumulates the
required heat as frazil [J m-2] for the ice model; `find_uv_at_h`
(:305) averages the staggered velocities to thickness points with
face-thickness weights.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mom6_tpu.parallel.stencil import im1, jm1, ip1, jp1

__all__ = ["FrazilCfg", "make_frazil", "find_uv_at_h",
           "apply_boundary_fluxes", "BoundaryFluxResult"]

_H_NEGLECT = 1e-30
_CP = 3991.86795711963      # J kg-1 K-1 (reference C_P default)


@dataclasses.dataclass(frozen=True)
class FrazilCfg:
    # linear freezing point Tf = dtfr_ds·S + tfr_s0_p0 + dtfr_dp·p
    # (TFREEZE_FORM = "LINEAR" defaults, MOM_TFreeze.F90)
    tfr_s0_p0: float = 0.0        # [degC]
    dtfr_ds: float = -0.054       # [degC ppt-1]
    dtfr_dp: float = -7.75e-8     # [degC Pa-1]
    rho0: float = 1035.0
    cp: float = 3991.86795711963  # [J kg-1 K-1]
    g: float = 9.81
    # RECLAIM_FRAZIL (MOM_diabatic_aux.F90:59-80 of make_frazil):
    # pending frazil heat deficit not yet extracted by the ice model
    # is reclaimed by an above-freezing surface layer before any new
    # frazil forms
    reclaim: bool = True


def t_freeze(cfg: FrazilCfg, S, p):
    return cfg.tfr_s0_p0 + cfg.dtfr_ds * S + cfg.dtfr_dp * p


def make_frazil(cfg: FrazilCfg, h, T, S, angstrom: float = 1e-10,
                p_surf=None, frazil_prev=None):
    """Frazil formation with the reference's bottom-up deficit march
    (make_frazil, MOM_diabatic_aux.F90:95-210): sub-freezing layers
    add their heat deficit to an upward-propagating column deficit
    which WARMER layers above absorb (cooling toward their own
    freezing point) before any residual surfaces as frazil — not an
    independent per-layer clamp.  Very thin layers are clamped but
    never cooled by the propagating deficit (:195).

    ``frazil_prev`` is the accumulated, not-yet-extracted column
    frazil [J m-2] (the reference's tv%frazil): with cfg.reclaim it
    is reclaimed by an above-freezing surface layer (cooling it
    toward the surface freezing point) before this step's deficit
    march, and the returned frazil is the ACCUMULATED total
    (tv%frazil += fraz_col, MOM_diabatic_aux.F90:205).

    Returns (T_new, frazil) with frazil the surface heat deficit
    [J m-2] ≥ 0 that the ice model must extract as ice formation."""
    z_mid = jnp.cumsum(h, axis=0) - 0.5 * h
    p = cfg.rho0 * cfg.g * z_mid
    if p_surf is not None:
        # USE_PSURF_IN_EOS: the surface load (atmosphere/ice shelf)
        # enters the freezing-point pressure (MOM.F90:2428,2757;
        # make_frazil's pressure loop starts from p_surf, :162)
        p = p + p_surf
    tf = t_freeze(cfg, S, p)
    hc = cfg.rho0 * cfg.cp * jnp.maximum(h, _H_NEGLECT)
    thin = h <= 10.0 * angstrom

    carried = jnp.zeros_like(T[0]) if frazil_prev is None \
        else frazil_prev
    if cfg.reclaim and frazil_prev is not None:
        # surface reclaim (:59-80): above-freezing surface water
        # melts the pending frazil, cooling toward T_freeze(surface)
        warm = hc[0] * jnp.maximum(T[0] - tf[0], 0.0)
        melt = jnp.minimum(carried, warm)
        T = T.at[0].add(-melt / hc[0])
        carried = carried - melt

    def up(fraz_col, xs):
        t_k, tf_k, hc_k, thin_k = xs
        # thick layer: absorb the deficit down to its freezing point,
        # then contribute its own sub-freezing deficit
        t_thick = jnp.maximum(tf_k, t_k - fraz_col / hc_k)
        f_thick = jnp.maximum(fraz_col + hc_k * (tf_k - t_k), 0.0)
        # thin layer: clamp only; the deficit passes through
        t_thin = jnp.maximum(tf_k, t_k)
        f_thin = fraz_col + hc_k * jnp.maximum(tf_k - t_k, 0.0)
        t_new = jnp.where(thin_k, t_thin, t_thick)
        f_new = jnp.where(thin_k, f_thin, f_thick)
        return f_new, t_new

    frazil, T_new = jax.lax.scan(
        up, jnp.zeros_like(T[0]),
        (T[::-1], tf[::-1], hc[::-1], thin[::-1]))
    return T_new[::-1], carried + frazil


class BoundaryFluxResult(NamedTuple):
    h: jnp.ndarray
    T: jnp.ndarray
    S: jnp.ndarray
    net_heat: jnp.ndarray       # surface heat into the ocean [W m-2]
    net_salt: jnp.ndarray       # salt flux [ppt m s-1 equivalent]
    net_massin: jnp.ndarray     # freshwater mass in [kg m-2 s-1]


def apply_boundary_fluxes(h, T, S, fluxes, dt, rho0: float,
                          cp: float = _CP, opacity_cfg=None,
                          pen_sw_frac: float = 0.42,
                          angstrom: float = 1e-10,
                          depth_limit_fluxes: float = 0.0):
    """Deposit surface fluxes into the upper ocean over dt.

    The explicit counterpart of applyBoundaryFluxesInOut
    (MOM_diabatic_aux.F90:1097):

    * non-penetrative heat (LW + latent + sensible + the
      non-penetrating shortwave fraction) warms the top layer;
    * penetrative shortwave is distributed over layers with the
      opacity-band flux convergence (MOM_opacity.F90) when an
      ``opacity_cfg`` is given, else absorbed in the top layer;
    * freshwater mass (lprec + fprec − evap) enters/leaves the top
      layer, diluting/concentrating its salinity (precip carries no
      salt and enters at the SST, so T is unchanged);
    * explicit salt flux (e.g. brine rejection) salts the top layer.

    Returns BoundaryFluxResult; h/T/S are only modified in the top
    layer except for penetrative shortwave.
    """
    zero = jnp.zeros_like(h[0])
    if fluxes is None:
        return BoundaryFluxResult(h, T, S, zero, zero, zero)

    # DEPTH_LIMIT_FLUXES: surface fluxes are scaled away where the
    # total ocean thickness is shallower than the limit, so near-dry
    # columns do not blow up (extractFluxes1d's H_limit_fluxes
    # scaling, MOM_forcing_type.F90 / MOM_bulk_mixed_layer.F90:4072)
    flux_scale = None
    if depth_limit_fluxes > 0.0:
        flux_scale = jnp.minimum(jnp.sum(h, axis=0)
                                 / depth_limit_fluxes, 1.0)
        fluxes = jax.tree.map(
            lambda f: f * flux_scale if f is not None else None,
            fluxes, is_leaf=lambda x: x is None)

    heat_nonpen = zero
    for f in (fluxes.lw, fluxes.latent, fluxes.sensible):
        if f is not None:
            heat_nonpen = heat_nonpen + f
    net_heat = heat_nonpen
    sw = fluxes.sw
    if sw is not None:
        net_heat = net_heat + sw

    # shortwave: split into a non-penetrating top-layer part and a
    # penetrating profile.
    if sw is not None and opacity_cfg is not None:
        from mom6_tpu.param.vertical.opacity import sw_absorption_profile
        heating, sw_bottom = sw_absorption_profile(opacity_cfg, h, sw)
        # unabsorbed shortwave reaching the bottom goes into the
        # deepest layer (the reference adds it to the bottom layer
        # rather than losing it through the sea floor)
        heating = heating.at[-1].add(sw_bottom)
        T = T + heating * (dt / (rho0 * cp)) / jnp.maximum(h, _H_NEGLECT)
    elif sw is not None:
        # no opacity profile: the whole shortwave is absorbed in the
        # top layer together with the non-penetrative components
        heat_nonpen = heat_nonpen + sw

    # freshwater mass flux into the top layer [kg m-2 s-1]
    massin = zero
    for f in (fluxes.lprec, fluxes.fprec):
        if f is not None:
            massin = massin + f
    if fluxes.evap is not None:
        massin = massin - fluxes.evap
    dh = massin * dt / rho0                       # [m]
    h0_old = h[0]
    h0_new = jnp.maximum(h0_old + dh, angstrom)
    if S is not None:
        # salt content conserved under freshwater addition/removal
        S = S.at[0].set(S[0] * h0_old / jnp.maximum(h0_new, _H_NEGLECT))
    h = h.at[0].set(h0_new)

    # non-penetrative heat into the top layer
    net_salt = zero
    if T is not None:
        T = T.at[0].add(heat_nonpen * dt / (rho0 * cp)
                        / jnp.maximum(h[0], _H_NEGLECT))
    if S is not None and fluxes.salt_flux is not None:
        net_salt = fluxes.salt_flux * (1000.0 / rho0)   # [ppt m s-1]
        S = S.at[0].add(net_salt * dt / jnp.maximum(h[0], _H_NEGLECT))

    return BoundaryFluxResult(h, T, S, net_heat, net_salt, massin)


def find_uv_at_h(u, v, h):
    """Thickness-weighted average of face velocities at h points
    (find_uv_at_h, MOM_diabatic_aux.F90:305).

    u[j,i] is the east face of cell (j,i); the h-point value averages
    the west (i-1) and east (i) faces weighted by the face
    thicknesses."""
    h_e = 0.5 * (h + ip1(h))          # at east faces (u points)
    h_n = 0.5 * (h + jp1(h))          # at north faces (v points)
    u_h = (im1(h_e * u) + h_e * u) / (im1(h_e) + h_e + _H_NEGLECT)
    v_h = (jm1(h_n * v) + h_n * v) / (jm1(h_n) + h_n + _H_NEGLECT)
    return u_h, v_h
