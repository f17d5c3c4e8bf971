"""Conservative vertical remapping between column grids.

Re-design of /root/reference/src/ALE/MOM_remapping.F90 (remapping_core_h
:160, build_reconstructions_1d :257, remap_via_sub_cells :463) and the
reconstruction modules PCM/PLM/PPM_functions.F90.

The reference remaps by scanning merged sub-cells — a sequential,
data-dependent loop.  Here the same integral is evaluated in closed
form: each source cell carries a polynomial reconstruction; the
indefinite depth-integral of the column is evaluated at every target
interface position (interval location by dense one-hot comparisons
against source interfaces — O(nk²) per column but branch-free and
vectorized over all (j, i) columns at once), and target cell means are
differences of that integral.  Exactly conservative when the column
totals agree, which ALE regridding guarantees.

Schemes: PCM, PLM (monotonized), PPM_H4 / PPM_IH4 (4th-order edge
values + monotonic limiter), PPM_CW.  Naming follows
REMAPPING_SCHEME (MOM_remapping.F90:50-59).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RemapCfg", "remap_column_means", "reconstruct",
           "edge_values_h2", "edge_values_h4", "interface_positions"]

_H_NEGLECT = 1e-30


@dataclasses.dataclass(frozen=True)
class RemapCfg:
    scheme: str = "PPM_H4"        # REMAPPING_SCHEME
    boundary_extrap: bool = False  # REMAP_BOUNDARY_EXTRAP
    force_monotonic: bool = True


class Reconstruction(NamedTuple):
    """Per-cell polynomial u(ξ) = Σ c_n ξ^n, ξ∈[0,1] downward (up to
    quartic for PQM)."""
    c0: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray | None = None
    c4: jnp.ndarray | None = None

    def cell_mean(self):
        m = self.c0 + 0.5 * self.c1 + self.c2 / 3.0
        if self.c3 is not None:
            m = m + 0.25 * self.c3 + 0.2 * self.c4
        return m

    def integral_to(self, xi):
        """∫_0^ξ u dξ' (fraction of the cell's thickness-integral)."""
        r = (self.c0 * xi + 0.5 * self.c1 * xi * xi
             + self.c2 * xi * xi * xi / 3.0)
        if self.c3 is not None:
            x4 = xi * xi * xi * xi
            r = r + 0.25 * self.c3 * x4 + 0.2 * self.c4 * x4 * xi
        return r


def _shift_k(f, n):
    """Shift along the leading (layer) axis with edge clamping."""
    nk = f.shape[0]
    idx = jnp.clip(jnp.arange(nk) + n, 0, nk - 1)
    return f[idx]


def edge_values_h2(h, u):
    """2nd-order thickness-weighted edge values at interfaces 0..nk
    (edge_values_explicit_h2 of regrid_edge_values.F90)."""
    hk = h + _H_NEGLECT
    h_up = _shift_k(hk, -1)
    u_up = _shift_k(u, -1)
    # interior interface K between cells K-1,K: harmonic-style average
    eint = (u_up * hk + u * h_up) / (hk + h_up)
    top = u[0:1]
    bot = u[-1:]
    return jnp.concatenate([top, eint[1:], bot], axis=0)


def edge_values_h4(h, u):
    """4th-order explicit edge estimates (edge_values_explicit_h4),
    falling back to h2 at the two boundary interfaces."""
    nk = h.shape[0]
    if nk < 4:
        return edge_values_h2(h, u)
    e2 = edge_values_h2(h, u)
    # uniform-grid 4th-order interior estimate (nonuniform weights are a
    # planned refinement): e_K = (7(u_{K-1}+u_K) − (u_{K-2}+u_{K+1}))/12
    um1 = u                      # cell K-1 at interface K → index K-1
    # build interface-indexed (nk+1) arrays
    uK = jnp.concatenate([u, u[-1:]], axis=0)        # cell K (clamped)
    uKm1 = jnp.concatenate([u[0:1], u], axis=0)      # cell K-1
    uKm2 = jnp.concatenate([u[0:1], u[0:1], u[:-1]], axis=0)
    uKp1 = jnp.concatenate([u[1:], u[-1:], u[-1:]], axis=0)
    e4 = (7.0 * (uKm1 + uK) - (uKm2 + uKp1)) / 12.0
    # valid only at interior interfaces 2..nk-2
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    interior = (K >= 2) & (K <= nk - 2)
    return jnp.where(interior, e4, e2)


def _limit_edges(u, eL, eR):
    """Bound edge values between adjacent cell means (monotonic prep)."""
    u_up = _shift_k(u, -1)
    u_dn = _shift_k(u, 1)
    lo_L = jnp.minimum(u, u_up)
    hi_L = jnp.maximum(u, u_up)
    lo_R = jnp.minimum(u, u_dn)
    hi_R = jnp.maximum(u, u_dn)
    return jnp.clip(eL, lo_L, hi_L), jnp.clip(eR, lo_R, hi_R)


def _ppm_limit(u, eL, eR):
    """PPM monotonic limiter (PPM_limit_ppm / CW84 style)."""
    eL, eR = _limit_edges(u, eL, eR)
    dh = eR - eL
    curv = 6.0 * u - 3.0 * (eL + eR)
    pc = (eR - u) * (u - eL) <= 0.0
    eL = jnp.where(pc, u, jnp.where(dh * curv > dh * dh,
                                    3.0 * u - 2.0 * eR, eL))
    eR = jnp.where(pc, u, jnp.where(dh * curv < -dh * dh,
                                    3.0 * u - 2.0 * eL, eR))
    return eL, eR


def reconstruct(h, u, cfg: RemapCfg) -> Reconstruction:
    """Build per-cell polynomials over ξ∈[0,1] (top→bottom of cell)."""
    scheme = cfg.scheme.upper()
    if scheme == "PCM":
        z = jnp.zeros_like(u)
        return Reconstruction(c0=u, c1=z, c2=z)
    if scheme == "PLM":
        u_up = _shift_k(u, -1)
        u_dn = _shift_k(u, 1)
        s_c = 0.5 * (u_dn - u_up)
        s_l = u - u_up
        s_r = u_dn - u
        slope = jnp.sign(s_c) * jnp.minimum(
            jnp.abs(s_c), 2.0 * jnp.minimum(jnp.abs(s_l), jnp.abs(s_r)))
        slope = jnp.where(s_l * s_r > 0.0, slope, 0.0)
        return Reconstruction(c0=u - 0.5 * slope, c1=slope,
                              c2=jnp.zeros_like(u))
    if scheme in ("PQM_IH4IH3", "PQM_IH6IH5"):
        # White & Adcroft (2008) piecewise quartic: cell mean + h4 edge
        # values + 4th-order edge slopes pin the quartic; currently
        # unlimited (the PQM limiter is a planned refinement).
        import numpy as _np
        edges = edge_values_h4(h, u)
        eL, eR = edges[:-1], edges[1:]
        # 4th-order interface gradient (per unit ξ of the lower cell):
        # d_K ≈ (27(u_K − u_{K-1}) − (u_{K+1} − u_{K-2}))/24
        uK = jnp.concatenate([u, u[-1:]], axis=0)
        uKm1 = jnp.concatenate([u[0:1], u], axis=0)
        uKm2 = jnp.concatenate([u[0:1], u[0:1], u[:-1]], axis=0)
        uKp1 = jnp.concatenate([u[1:], u[-1:], u[-1:]], axis=0)
        d_int = (27.0 * (uK - uKm1) - (uKp1 - uKm2)) / 24.0
        dL, dR = d_int[:-1], d_int[1:]
        # solve [1,1,1; 2,3,4; 1/3,1/4,1/5] (a2,a3,a4) = rhs
        Minv = _np.linalg.inv(_np.array([[1.0, 1.0, 1.0],
                                         [2.0, 3.0, 4.0],
                                         [1.0 / 3, 1.0 / 4, 1.0 / 5]]))
        a0, a1 = eL, dL
        r1 = eR - eL - a1
        r2 = dR - a1
        r3 = u - eL - 0.5 * a1
        a2 = Minv[0, 0] * r1 + Minv[0, 1] * r2 + Minv[0, 2] * r3
        a3 = Minv[1, 0] * r1 + Minv[1, 1] * r2 + Minv[1, 2] * r3
        a4 = Minv[2, 0] * r1 + Minv[2, 1] * r2 + Minv[2, 2] * r3
        return Reconstruction(c0=a0, c1=a1, c2=a2, c3=a3, c4=a4)
    if scheme in ("PPM_H4", "PPM_IH4", "PPM_CW", "PPM_HYBGEN"):
        if scheme == "PPM_CW":
            edges = edge_values_h2(h, u)
        else:
            edges = edge_values_h4(h, u)
        eL = edges[:-1]      # top edge of each cell
        eR = edges[1:]       # bottom edge
        if cfg.force_monotonic:
            eL, eR = _ppm_limit(u, eL, eR)
        # u(ξ) = eL + ξ(ΔU + u6(1−ξ)) = eL + (ΔU+u6)ξ − u6 ξ²
        dU = eR - eL
        u6 = 6.0 * u - 3.0 * (eL + eR)
        return Reconstruction(c0=eL, c1=dU + u6, c2=-u6)
    raise ValueError(f"Unknown REMAPPING_SCHEME '{cfg.scheme}'")


def interface_positions(h):
    """Downward positions of interfaces: z[0]=0, z[K]=Σ_{l<K} h_l."""
    zero = jnp.zeros_like(h[:1])
    return jnp.concatenate([zero, jnp.cumsum(h, axis=0)], axis=0)


def _column_integral_at(h_src, rec: Reconstruction, z_eval):
    """I(z) = ∫_0^z u dz' for each position in z_eval (m, ...)."""
    zs = interface_positions(h_src)          # (nk+1, ...)
    hk = h_src + _H_NEGLECT
    # cumulative integral at source interfaces
    cell_int = h_src * rec.cell_mean()
    Icum = jnp.concatenate([jnp.zeros_like(h_src[:1]),
                            jnp.cumsum(cell_int, axis=0)], axis=0)
    total_z = zs[-1]
    z = jnp.clip(z_eval, 0.0, total_z[None])

    # one-hot interval location: cell k contains z if zs[k] <= z < zs[k+1]
    zk = zs[:-1]                 # (nk, ...)
    zk1 = zs[1:]
    # broadcast (m, 1, ...) vs (1, nk, ...)
    zb = z[:, None]
    inside = (zb >= zk[None]) & (zb < zk1[None] + _H_NEGLECT)
    # exactly one cell per z except z == total: clamp into last cell
    last = jnp.zeros_like(inside).at[:, -1].set(
        zb[:, 0] >= zk1[None][:, -1])
    sel = inside | last
    # keep only the FIRST matching cell (vanished layers share interfaces)
    first = jnp.cumsum(sel.astype(jnp.int32), axis=1) == 1
    sel = sel & first

    xi = (zb - zk[None]) / hk[None]
    xi = jnp.clip(xi, 0.0, 1.0)
    partial = hk[None] * rec.integral_to(xi)           # (m, nk, ...)
    Icum_k = Icum[:-1]
    I_at = jnp.sum(jnp.where(sel, Icum_k[None] + partial, 0.0), axis=1)
    return I_at


def remap_column_means(h_src, u_src, h_dst, cfg: RemapCfg = RemapCfg()):
    """Conservative remap of cell means from (h_src, u_src) → h_dst.

    All arrays (nk, ...) with matching trailing dims; column totals of
    h_src and h_dst should agree (tails are clamped).  Returns u_dst
    with vanished target cells filled with the local integral mean.
    """
    rec = reconstruct(h_src, u_src, cfg)
    z_dst = interface_positions(h_dst)
    I = _column_integral_at(h_src, rec, z_dst)
    du = I[1:] - I[:-1]
    u_dst = du / (h_dst + _H_NEGLECT)
    # vanished cells: use the value at the (shared) interface position
    tiny = h_dst <= 1e-9 * (jnp.sum(h_src, axis=0, keepdims=True)
                            + _H_NEGLECT)
    # neighbor fill: take value from above (top cell falls back to below)
    u_fill = jnp.where(tiny, _shift_k(u_dst, -1), u_dst)
    return jnp.where(tiny, u_fill, u_dst)
