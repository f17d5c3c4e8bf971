"""Internal tide energy propagation (ray tracing in angle space).

Re-design of /root/reference/src/parameterizations/lateral/
MOM_internal_tides.F90 (propagate_int_tide :219, refract :1048,
propagate_x/y :1712/:1793, itidal_lowmode_loss :932): the internal
tide energy density En(angle, y, x) per frequency is forced by the
barotropic→baroclinic conversion, refracted in angle by β and
phase-speed gradients, advected horizontally at the group velocity,
and damped by background decay, quadratic bottom drag, small-scale
wave drag and Froude-limited breaking.  The surviving wave-drag loss
map is what the tidal mixing scheme consumes in place of the
local-dissipation assumption.

TPU framing: the angle dimension is one more dense axis — every
angular wedge refracts/advects at once with jnp.roll for the circular
angle topology and the standard halo exchange for x/y; the whole
update is branch-free and identical on every shard.  Horizontal
advection is the reference's first-order upwind option (upwind_1st).
Energy is in column-integral units [J m-2].

Vertical modes: En carries a leading mode axis (nMode, nAngle, y, x)
with per-mode phase speeds (cn/m in the uniform-stratification limit
the reference notes at MOM_internal_tides.F90:353, or caller-supplied
per-mode speeds) and the ENERGY_FRACTION_PER_MODE input partition.

Topographic reflection (reflect :1130): cells carrying a refl_angle
redistribute incident wedges across the specular angle with partial
reflectance refl_pref and the double-sided ridge option refl_dbl; the
per-cell integer angle arithmetic becomes a static unroll over source
wedges with one-hot scatters onto the reflected wedge.  (One noted
deviation: for ridge cells the incidence test is re-evaluated against
the flipped wall so rays from *either* side reflect — the intent of
the reference's branch, whose as-written test leaves the flipped wall
unreachable.)
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from mom6_tpu.core.grid import Grid
from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["InternalTidesCfg", "step_internal_tides", "init_en",
           "f2_at_h", "reflect"]

_CN_SUB = 1e-30
_EN_SUB = 1e-30


@dataclasses.dataclass(frozen=True)
class InternalTidesCfg:
    n_angle: int = 24                 # INTERNAL_TIDE_ANGLES
    freq: float = 1.4052e-4           # M2 [rad s-1] (FIRST_MODE_PERIOD)
    # frequency axis (the reference's nFreq bins, each fed by its own
    # constituent's conversion, MOM_internal_tides.F90:219 En(:,:,:,
    # freq, mode)); () → single bin at ``freq``
    freqs: tuple = ()
    # fraction of the total conversion forcing each frequency bin
    # (per-constituent TKE partition, int_tide_input per freq);
    # () → all into the first bin
    freq_fraction: tuple = ()
    q_itides: float = 0.3333          # GAMMA_ITIDES: fraction lost at
                                      # the source (local dissipation)
    decay_rate: float = 0.0           # background leakage [s-1]
    cdrag: float = 0.003              # CDRAG (quadratic bottom drag)
    drag_min_depth: float = 1.0       # DRAG_MIN_DEPTH [m]
    kappa_itides: float = 2.0 * math.pi / 125e3  # ITIDE wavenumber
    kappa_h2_factor: float = 0.75     # KAPPA_H2_FACTOR
    apply_background_drag: bool = False
    apply_bottom_drag: bool = True
    apply_wave_drag: bool = True
    apply_froude_drag: bool = False
    rho0: float = 1035.0
    h2_default: float = 2500.0        # roughness variance [m2] when no
                                      # H2_FILE map is provided
    n_mode: int = 1                   # INTERNAL_TIDE_MODES
    # ENERGY_FRACTION_PER_MODE; () → all conversion into mode 1
    mode_fraction: tuple = ()
    # horizontal advection: 'upwind_1st' or 'ppm' (INTERNAL_TIDE_
    # X_SCHEME; the reference's PPM option, propagate_x :1712)
    scheme: str = "upwind_1st"

    @property
    def freq_list(self):
        return tuple(self.freqs) if self.freqs else (self.freq,)

    @property
    def n_freq(self):
        return len(self.freq_list)


class IntTideResult(NamedTuple):
    En: jnp.ndarray                # (n_freq, n_mode, n_angle, njh, nih)
    tot_En: jnp.ndarray            # summed over freq+modes+angles
    itidal_loss: jnp.ndarray       # wave-drag dissipation [W m-2]
    leak_loss: jnp.ndarray         # background loss [W m-2]
    quad_loss: jnp.ndarray         # bottom-drag loss [W m-2]
    froude_loss: jnp.ndarray = 0.0  # wave-breaking loss [W m-2]
    # per-frequency loss budgets (n_freq, njh, nih) [W m-2]
    itidal_loss_freq: jnp.ndarray = None
    leak_loss_freq: jnp.ndarray = None
    quad_loss_freq: jnp.ndarray = None
    froude_loss_freq: jnp.ndarray = None


def init_en(cfg: InternalTidesCfg, shape) -> jnp.ndarray:
    return jnp.zeros((cfg.n_freq, cfg.n_mode, cfg.n_angle)
                     + tuple(shape))


def _mode_fractions(cfg: InternalTidesCfg):
    if cfg.mode_fraction:
        fr = list(cfg.mode_fraction) + [0.0] * cfg.n_mode
        return fr[:cfg.n_mode]
    return [1.0] + [0.0] * (cfg.n_mode - 1)


def _freq_fractions(cfg: InternalTidesCfg):
    nf = cfg.n_freq
    if cfg.freq_fraction:
        fr = list(cfg.freq_fraction) + [0.0] * nf
        return fr[:nf]
    return [1.0] + [0.0] * (nf - 1)


def reflect(cfg: InternalTidesCfg, En, refl_angle, refl_pref,
            refl_dbl=None):
    """Specular redistribution of wave energy at tagged cells
    (reflect, MOM_internal_tides.F90:1130).

    En: (n_angle, njh, nih) for one mode.  refl_angle [rad]: local
    wall orientation, NaN where no reflection; refl_pref: reflected
    fraction in [0, 1]; refl_dbl: True where the cell is a ridge that
    reflects rays incident from either side."""
    na = cfg.n_angle
    na2 = na // 2
    dtheta = 2.0 * math.pi / na
    has = ~jnp.isnan(refl_angle)
    ang = jnp.where(has, refl_angle, 0.0)
    wall = jnp.round(jnp.mod(ang, 2.0 * math.pi) / dtheta
                     ).astype(jnp.int32) % na
    pref = jnp.where(has, refl_pref, 0.0)
    ridge = jnp.zeros_like(has) if refl_dbl is None else refl_dbl
    bins = jnp.arange(na, dtype=jnp.int32).reshape(
        (-1,) + (1,) * (refl_angle.ndim))
    En_out = En
    En_ref = jnp.zeros_like(En)
    for a0 in range(na):
        attw = (a0 - wall) % na
        flip = ridge & (attw > na2) & (attw < na)
        wall_e = jnp.where(flip, (wall + na2) % na, wall)
        attw_e = (a0 - wall_e) % na
        incident = has & (attw_e > 0) & (attw_e < na2)
        angle_r = (2 * wall_e - a0) % na
        frac = jnp.where(incident & (angle_r != a0), pref, 0.0)
        moved = frac * En[a0]
        En_out = En_out.at[a0].add(-moved)
        En_ref = En_ref + jnp.where(bins == angle_r[None],
                                    moved[None], 0.0)
    return En_out + En_ref


def f2_at_h(grid: Grid):
    """Squared Coriolis parameter averaged to h points."""
    fB = grid.CoriolisBu
    return 0.25 * ((fB ** 2 + im1(jm1(fB ** 2)))
                   + (im1(fB ** 2) + jm1(fB ** 2)))


def _cn_face(cn, shift):
    """Face-average of the mode speed skipping zero (land) values
    (refract :1092-1104)."""
    m = (cn != 0.0).astype(cn.dtype)
    mn = shift(m)
    w1 = m - 0.5 * m * mn
    w2 = mn - 0.5 * m * mn
    return w1 * cn + w2 * shift(cn)


def _refract(cfg: InternalTidesCfg, grid: Grid, En, cn, dt,
             freq=None):
    """Angular upwind advection at the refraction rate
    (refract :1048): dθ/dt = cosθ·Dl − sinθ·Dk with
    D(k,l)/Dt/|K| = −(f·∇f + (ω²−f²)∇ln c_n)/ω|K|."""
    freq = cfg.freq if freq is None else freq
    na = cfg.n_angle
    fB = grid.CoriolisBu
    f2 = f2_at_h(grid)
    favg = 0.25 * ((fB + im1(jm1(fB))) + (im1(fB) + jm1(fB)))
    df_dx = 0.5 * ((fB + jm1(fB)) - (im1(fB) + im1(jm1(fB)))) \
        * grid.IdxT
    df_dy = 0.5 * ((fB + im1(fB)) - (jm1(fB) + im1(jm1(fB)))) \
        * grid.IdyT
    cn_u = _cn_face(cn, ip1)
    cn_v = _cn_face(cn, jp1)
    dlnCn_dx = grid.IdxT * (cn_u - im1(cn_u)) \
        / (0.5 * (cn_u + im1(cn_u)) + _CN_SUB)
    dlnCn_dy = grid.IdyT * (cn_v - jm1(cn_v)) \
        / (0.5 * (cn_v + jm1(cn_v)) + _CN_SUB)
    kmag2 = (freq ** 2 - f2) / (cn ** 2 + _CN_SUB ** 2)
    i_kmag = jnp.where(kmag2 > 0.0,
                       1.0 / jnp.sqrt(jnp.maximum(kmag2, 1e-300)), 0.0)
    ifreq = 1.0 / freq
    dk = -ifreq * (favg * df_dx + (freq ** 2 - f2) * dlnCn_dx) * i_kmag
    dl = -ifreq * (favg * df_dy + (freq ** 2 - f2) * dlnCn_dy) * i_kmag
    dk = jnp.where(kmag2 > 0.0, dk, 0.0)
    dl = jnp.where(kmag2 > 0.0, dl, 0.0)

    dtheta = 2.0 * math.pi / na
    # angular EDGE A sits between wedges A and A+1; its angle is
    # (A+0.5-0.5)*dtheta per the reference's (A-0.5) with 1-based A
    import numpy as np
    edge_ang = (np.arange(na) + 0.5) * dtheta
    cosA = jnp.asarray(np.cos(edge_ang)).reshape(-1, 1, 1)
    sinA = jnp.asarray(np.sin(edge_ang)).reshape(-1, 1, 1)
    cfl = jnp.clip((cosA * dl[None] - sinA * dk[None]) * (dt / dtheta),
                   -1.0, 1.0)
    # upwind flux across edge A: from wedge A if cfl>0 else wedge A+1
    En_up = jnp.roll(En, -1, axis=0)          # wedge A+1
    flux = jnp.where(cfl > 0.0, cfl * En, cfl * En_up)
    return En + (jnp.roll(flux, 1, axis=0) - flux)


def _ppm_face(c, up2, up1, dn1, cfl):
    """PPM face value for flux-form advection: parabola over the
    upwind cell (up2|up1|dn1 from far-upwind to downwind), integrated
    over the CFL sweep (the reference's PPM option, zonal_flux_layer
    shape; monotonized central edge estimates)."""
    # monotonized edge values of the upwind cell
    dl = 0.5 * (up1 - up2) + 0.5 * (dn1 - up1)
    slp = jnp.sign(dl) * jnp.minimum(
        jnp.abs(dl), 2.0 * jnp.minimum(jnp.abs(up1 - up2),
                                       jnp.abs(dn1 - up1)))
    slp = jnp.where((up1 - up2) * (dn1 - up1) > 0.0, slp, 0.0)
    eL = up1 - 0.5 * slp
    eR = up1 + 0.5 * slp
    curv3 = eL + eR - 2.0 * up1
    return eR + cfl * (0.5 * (eL - eR) + curv3 * (cfl - 1.5))


def _propagate(cfg: InternalTidesCfg, domain, grid: Grid, En, cn, dt,
               freq=None):
    """Flux-form x/y advection at the per-angle group velocity
    (propagate_x/propagate_y): first-order upwind or the PPM
    reconstruction (cfg.scheme)."""
    freq = cfg.freq if freq is None else freq
    na = cfg.n_angle
    f2 = f2_at_h(grid)
    speed = cn * jnp.sqrt(jnp.maximum(freq ** 2 - f2, 0.0)) / freq
    speed_u = 0.5 * (speed + ip1(speed)) * grid.mask2dCu
    speed_v = 0.5 * (speed + jp1(speed)) * grid.mask2dCv
    import numpy as np
    dtheta = 2.0 * math.pi / na
    # wedge-average of cos/sin over each wedge
    a0 = np.arange(na) * dtheta
    a1 = a0 + dtheta
    cgx_av = jnp.asarray((np.sin(a1) - np.sin(a0)) / dtheta
                         ).reshape(-1, 1, 1)
    cgy_av = jnp.asarray((np.cos(a0) - np.cos(a1)) / dtheta
                         ).reshape(-1, 1, 1)

    use_ppm = cfg.scheme.lower() == "ppm"

    cg_x = speed_u[None] * cgx_av            # (na, njh, nih) at u
    if use_ppm:
        cfl_x = jnp.abs(cg_x) * dt * grid.IdxCu
        f_pos = _ppm_face(cg_x, im1(En), En, ip1(En), cfl_x)
        f_neg = _ppm_face(cg_x, ip1(ip1(En)), ip1(En), En, cfl_x)
        face = jnp.where(cg_x > 0.0, f_pos, f_neg)
        face = jnp.maximum(face, 0.0)
    else:
        face = jnp.where(cg_x > 0.0, En, ip1(En))
    flux_x = face * cg_x * grid.dyCu
    En = En + dt * grid.IareaT * (im1(flux_x) - flux_x)
    En = domain.fill_halos(En)
    cg_y = speed_v[None] * cgy_av
    if use_ppm:
        cfl_y = jnp.abs(cg_y) * dt * grid.IdyCv
        f_pos = _ppm_face(cg_y, jm1(En), En, jp1(En), cfl_y)
        f_neg = _ppm_face(cg_y, jp1(jp1(En)), jp1(En), En, cfl_y)
        face = jnp.where(cg_y > 0.0, f_pos, f_neg)
        face = jnp.maximum(face, 0.0)
    else:
        face = jnp.where(cg_y > 0.0, En, jp1(En))
    flux_y = face * cg_y * grid.dxCv
    En = En + dt * grid.IareaT * (jm1(flux_y) - flux_y)
    return jnp.maximum(En, 0.0) * grid.mask2dT


def step_internal_tides(cfg: InternalTidesCfg, domain, grid: Grid,
                        En, cn, dt, tke_input, Nb, htot,
                        u_bt2=0.0, h2_rough=None, refl_angle=None,
                        refl_pref=None, refl_dbl=None) -> IntTideResult:
    """One internal-tide energy step (propagate_int_tide :219).

    En: (n_mode, n_angle, njh, nih) [J m-2]; cn: mode-1 speed [m s-1]
    (per-mode speeds are cn/m, the uniform-stratification limit noted
    at :353) or (n_mode, njh, nih) caller-supplied per-mode speeds;
    tke_input: barotropic conversion [W m-2]; Nb: near-bottom
    buoyancy frequency [s-1]; htot: column depth [m]; u_bt2: squared
    barotropic tidal speed [m2 s-2]; h2_rough: topographic roughness
    variance [m2] (defaults to (kappa_h2_factor/kappa)²);
    refl_angle/refl_pref/refl_dbl: topographic reflection maps (see
    :func:`reflect`).

    En carries (n_freq, n_mode, n_angle, njh, nih) — the reference's
    full En(i, j, angle, freq, mode) energy density (:219); legacy
    (n_mode, n_angle, ...) and (n_angle, ...) layouts are promoted.
    The conversion forcing is partitioned across frequency bins by
    ``freq_fraction`` and across modes by ``mode_fraction``; each
    (freq, mode) pair refracts and propagates at its own rates, and
    the loss budgets are returned both summed and per frequency."""
    na = cfg.n_angle
    nm = cfg.n_mode
    nf = cfg.n_freq
    freqs = cfg.freq_list
    f2 = f2_at_h(grid)
    if En.ndim == 3:                     # single-mode legacy layout
        En = En[None]
    if En.ndim == 4:                     # single-frequency legacy
        En = En[None]

    # source: the non-local fraction of the conversion, spread evenly
    # over the angular wedges, partitioned across frequency bins
    # (per-constituent conversion) and across the vertical modes by
    # ENERGY_FRACTION_PER_MODE (:362-378)
    frac_m = jnp.asarray(_mode_fractions(cfg)).reshape(-1, 1, 1, 1)
    frac_f = _freq_fractions(cfg)
    src0 = dt * ((1.0 - cfg.q_itides) / na) * tke_input
    En = En + jnp.stack([
        frac_f[f] * frac_m
        * (src0 * ((freqs[f] ** 2 > f2).astype(En.dtype)
                   * grid.mask2dT))[None, None]
        for f in range(nf)])

    cn_modes = [cn[m] if cn.ndim == 3 else cn / (m + 1.0)
                for m in range(nm)] if nm > 1 or cn.ndim == 3 \
        else [cn]

    def transport(En_m, cn_m, freq):
        En_m = domain.fill_halos(En_m)
        En_m = _refract(cfg, grid, En_m, cn_m, 0.5 * dt, freq=freq)
        En_m = domain.fill_halos(En_m)
        En_m = _propagate(cfg, domain, grid, En_m, cn_m, dt, freq=freq)
        if refl_angle is not None:
            En_m = reflect(cfg, En_m, refl_angle,
                           refl_pref if refl_pref is not None
                           else jnp.ones_like(refl_angle), refl_dbl)
        return En_m

    En = jnp.stack([
        jnp.stack([transport(En[f, m], cn_modes[m], freqs[f])
                   for m in range(nm)]) for f in range(nf)])

    i_d = 1.0 / jnp.maximum(htot, cfg.drag_min_depth)
    zero_f = jnp.zeros((nf,) + htot.shape, dtype=En.dtype)

    leak_f = zero_f
    if cfg.apply_background_drag and cfg.decay_rate > 0.0:
        leak_f = jnp.sum(En, axis=(1, 2)) * cfg.decay_rate
        En = En / (1.0 + dt * cfg.decay_rate)

    quad_f = zero_f
    if cfg.apply_bottom_drag:
        # the near-bottom drag velocity collects every bin's energy
        tot_all = jnp.sum(En, axis=(0, 1, 2))
        drag_scale = cfg.cdrag * jnp.sqrt(jnp.maximum(
            0.0, u_bt2 + tot_all * i_d / cfg.rho0)) * i_d
        quad_f = jnp.sum(En, axis=(1, 2)) * drag_scale[None]
        En = En / (1.0 + dt * drag_scale[None, None, None])

    itidal_f = zero_f
    if cfg.apply_wave_drag:
        # Jayne & St. Laurent small-scale wave drag
        # (itidal_lowmode_loss :932): loss = q κ h² Nb Ub², with each
        # mode's near-bottom velocity estimated by energy
        # equipartition Ub² ≈ 2 E_m/(ρ0 D) (the reference projects
        # the vertical mode structure; this is its flat-bottom limit)
        if h2_rough is None:
            h2_rough = cfg.h2_default
        loss_fixed = 0.5 * cfg.kappa_h2_factor * cfg.kappa_itides \
            * h2_rough * cfg.rho0
        tot_fm = jnp.sum(En, axis=2)             # (nf, nm, ...)
        ub2 = 2.0 * tot_fm * (i_d / cfg.rho0)[None, None]
        loss_m = cfg.q_itides * loss_fixed * Nb[None, None] * ub2
        loss_rate = loss_m / (tot_fm + _EN_SUB)
        itidal_f = jnp.sum(loss_m * (tot_fm > 0.0), axis=1)
        En = En / (1.0 + dt * loss_rate[:, :, None])

    froude_f = zero_f
    if cfg.apply_froude_drag:
        # wave breaking where the modal velocity exceeds the phase
        # speed: En /= Fr² when Fr > 1 (propagate_int_tide Froude
        # branch, MOM_internal_tides.F90; the modal near-bottom
        # velocity from energy equipartition as in the wave drag)
        tot_fm = jnp.sum(En, axis=2)
        ub2 = 2.0 * tot_fm * (i_d / cfg.rho0)[None, None]
        c2 = jnp.stack([cn_modes[m] ** 2 for m in range(nm)])
        fr2 = ub2 / jnp.maximum(c2[None], _CN_SUB)
        scale = jnp.where(fr2 > 1.0, 1.0 / fr2, 1.0)
        froude_f = jnp.sum(tot_fm * (1.0 - scale), axis=1) / dt
        En = En * scale[:, :, None]

    En = jnp.stack([
        jnp.stack([_refract(cfg, grid, domain.fill_halos(En[f, m]),
                            cn_modes[m], 0.5 * dt, freq=freqs[f])
                   for m in range(nm)]) for f in range(nf)])
    En = jnp.maximum(En, 0.0) * grid.mask2dT
    return IntTideResult(
        En=En, tot_En=jnp.sum(En, axis=(0, 1, 2)),
        itidal_loss=jnp.sum(itidal_f, axis=0),
        leak_loss=jnp.sum(leak_f, axis=0),
        quad_loss=jnp.sum(quad_f, axis=0),
        froude_loss=jnp.sum(froude_f, axis=0),
        itidal_loss_freq=itidal_f, leak_loss_freq=leak_f,
        quad_loss_freq=quad_f, froude_loss_freq=froude_f)
