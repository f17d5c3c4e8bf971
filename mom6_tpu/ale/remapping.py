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

Schemes: PCM, PLM (monotonized), PLM_HYBGEN, PPM_H4 (explicit
non-uniform 4th-order edges), PPM_IH4 (implicit 4th-order edges via a
column tridiagonal), PPM_CW, PPM_HYBGEN, WENO_HYBGEN (the
Shchepetkin/Engwirda WENO-reconciled parabola of
MOM_hybgen_remap.F90:hybgen_weno_coefs), and PQM_IH4IH3 (White &
Adcroft quartic with implicit edges; reduced limiter).  Naming
follows REMAPPING_SCHEME (MOM_remapping.F90:50-59); edge formulas
follow regrid_edge_values.F90 (edge_values_explicit_h4 :222 in its
post-2018 non-uniform form, edge_values_implicit_h4 :491, boundary
cubic fits via the 4-cell integral Vandermonde solve).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RemapCfg", "remap_column_means", "reconstruct",
           "edge_values_h2", "edge_values_h4", "edge_values_ih4",
           "edge_values_ih6", "edge_slopes_ih3", "edge_slopes_ih5",
           "interface_positions"]

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


def _iface_cells(f, off):
    """Cell value f[K+off] as an interface-indexed (nk+1, ...) array
    with edge clamping (only interior interfaces consume the clamps)."""
    nk = f.shape[0]
    idx = jnp.clip(jnp.arange(nk + 1) + off, 0, nk - 1)
    return f[idx]


def _gauss_unrolled(a, b):
    """Closed-form Gaussian elimination (no pivoting) of an n x n
    system per point: ``a`` is an n x n nested list of broadcastable
    arrays, ``b`` a list of n arrays.  Pure elementwise arithmetic
    that XLA fuses — batched ``jnp.linalg.solve`` on hundreds of
    thousands of tiny systems is two to three orders of magnitude
    slower on TPU.  The integral Vandermonde / White & Adcroft moment
    systems solved here are diagonally graded and well conditioned
    after normalizing widths by the stencil mean, so unpivoted
    elimination is safe.  Returns the solution as a list."""
    n = len(b)
    a = [row[:] for row in a]
    b = list(b)
    for k in range(n):
        inv = 1.0 / a[k][k]
        for j in range(k + 1, n):
            a[k][j] = a[k][j] * inv
        b[k] = b[k] * inv
        for i in range(k + 1, n):
            f = a[i][k]
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - f * a[k][j]
            b[i] = b[i] - f * b[k]
    x = [None] * n
    for i in reversed(range(n)):
        xi = b[i]
        for j in range(i + 1, n):
            xi = xi - a[i][j] * x[j]
        x[i] = xi
    return x


def _solve4(A, B):
    """4x4 special case of :func:`_gauss_unrolled` with stacked-array
    inputs A (4, 4, ...) and B (4, ...)."""
    return tuple(_gauss_unrolled(
        [[A[i, j] for j in range(4)] for i in range(4)],
        [B[i] for i in range(4)]))


def _boundary_cubic(h, u, bottom: bool):
    """Edge values at the outermost two interfaces from an integral
    cubic fit over the 4 cells nearest the boundary — the boundary
    closure of edge_values_explicit/implicit_h4
    (regrid_edge_values.F90:594-607): solve the 4x4 Vandermonde
    integral-matching system and evaluate the cubic at the boundary
    and at the first interior interface.  Returns (e_edge, e_next).

    Positions are normalized by the 4-cell depth so the Vandermonde
    stays well conditioned; the fit value is invariant under the
    rescaling."""
    if bottom:
        hh = h[::-1][:4]
        uu = u[::-1][:4]
    else:
        hh = h[:4]
        uu = u[:4]
    tot = jnp.sum(hh, axis=0) + _H_NEGLECT
    h_min = 1e-10
    dz = jnp.maximum(hh / tot[None], h_min)   # normalized widths
    x = jnp.concatenate([jnp.zeros_like(dz[:1]),
                         jnp.cumsum(dz, axis=0)], axis=0)  # (5, ...)
    xi = x[:-1]                                            # (4, ...)
    xip = x[1:]
    # A[i, j] = (x_{i+1}^{j+1} − x_i^{j+1})/(j+1)
    A = jnp.stack([jnp.stack([
        (xip[i] ** (j + 1) - xi[i] ** (j + 1)) / (j + 1)
        for j in range(4)], axis=0) for i in range(4)], axis=0)
    B = uu * dz                                            # (4, ...)
    C0, C1, C2, C3 = _solve4(A, B)
    x1 = x[1]
    e_edge = C0
    e_next = C0 + x1 * (C1 + x1 * (C2 + x1 * C3))
    return e_edge, e_next


def edge_values_h4(h, u):
    """4th-order explicit edge estimates on a non-uniform grid
    (edge_values_explicit_h4, post-2018 expressions,
    regrid_edge_values.F90:299-313), with integral-cubic boundary
    closures at the outer two interfaces on each end."""
    nk = h.shape[0]
    if nk < 4:
        return edge_values_h2(h, u)
    hn = jnp.maximum(h, _H_NEGLECT)
    # interface-indexed neighbor cells: K-2, K-1, K, K+1 (0-based
    # interface K between cells K-1 and K)
    h0 = _iface_cells(hn, -2)
    h1 = _iface_cells(hn, -1)
    h2 = _iface_cells(hn, 0)
    h3 = _iface_cells(hn, 1)
    um2 = _iface_cells(u, -2)
    um1 = _iface_cells(u, -1)
    u0 = _iface_cells(u, 0)
    up1 = _iface_cells(u, 1)
    I_h12 = 1.0 / (h1 + h2)
    I_den_et2 = 1.0 / (((h0 + h1) + h2) * (h0 + h1))
    I_h012 = (h0 + h1) * I_den_et2
    I_den_et3 = 1.0 / ((h1 + (h2 + h3)) * (h2 + h3))
    I_h123 = (h2 + h3) * I_den_et3
    et1 = ((1.0 + (h1 * I_h012 + (h0 + h1) * I_h123))
           * I_h12 * (h2 * (h2 + h3)) * um1
           + (1.0 + (h2 * I_h123 + (h2 + h3) * I_h012))
           * I_h12 * (h1 * (h0 + h1)) * u0)
    et2 = (h1 * (h2 * (h2 + h3)) * I_den_et2) * (um1 - um2)
    et3 = (h2 * (h1 * (h0 + h1)) * I_den_et3) * (u0 - up1)
    e4 = (et1 + (et2 + et3)) / ((h0 + h1) + (h2 + h3))
    # boundary closures
    top0, top1 = _boundary_cubic(h, u, bottom=False)
    bot0, bot1 = _boundary_cubic(h, u, bottom=True)
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    e = jnp.where((K >= 2) & (K <= nk - 2), e4, 0.0)
    e = jnp.where(K == 0, top0[None], e)
    e = jnp.where(K == 1, top1[None], e)
    e = jnp.where(K == nk - 1, bot1[None], e)
    e = jnp.where(K == nk, bot0[None], e)
    return e


def _thomas_interfaces(lo, dg, up, rhs):
    """Solve a tridiagonal system along the leading (interface) axis
    with lax.scan (the column solver pattern of vert_friction)."""
    nki = rhs.shape[0]

    def fwd(carry, row):
        cp, dp_ = carry
        l, d, u_, b = row
        denom = d - l * cp
        cpn = u_ / denom
        dpn = (b - l * dp_) / denom
        return (cpn, dpn), (cpn, dpn)

    z = jnp.zeros_like(rhs[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (z, z), (lo, dg, up, rhs))

    def bwd(carry, row):
        cp, dp_ = row
        x = dp_ - cp * carry
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return xs


def edge_values_ih4(h, u):
    """Implicit 4th-order edge values (edge_values_implicit_h4,
    regrid_edge_values.F90:491): a tridiagonal system over the column
    interfaces with integral-cubic boundary closures."""
    nk = h.shape[0]
    if nk < 4:
        return edge_values_h2(h, u)
    hn = jnp.maximum(h, _H_NEGLECT)
    h0 = _iface_cells(hn, -1)          # cell above interface K
    h1 = _iface_cells(hn, 0)           # cell below
    u0 = _iface_cells(u, -1)
    u1 = _iface_cells(u, 0)
    I_h2 = 1.0 / ((h0 + h1) ** 2)
    alpha = (h1 * h1) * I_h2
    beta = (h0 * h0) * I_h2
    abmix = (h0 * h1) * I_h2
    a = 2.0 * alpha * (alpha + 2.0 * beta + 3.0 * abmix)
    b = 2.0 * beta * (beta + 2.0 * alpha + 3.0 * abmix)
    lo = alpha
    dg = jnp.ones_like(alpha)
    up = beta
    rhs = a * u0 + b * u1
    # boundary rows: pinned to the cubic end values
    top0, _ = _boundary_cubic(h, u, bottom=False)
    bot0, _ = _boundary_cubic(h, u, bottom=True)
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    edge_row = (K == 0) | (K == nk)
    lo = jnp.where(edge_row, 0.0, lo)
    up = jnp.where(edge_row, 0.0, up)
    dg = jnp.where(edge_row, 1.0, dg)
    rhs = jnp.where(K == 0, top0[None], rhs)
    rhs = jnp.where(K == nk, bot0[None], rhs)
    return _thomas_interfaces(lo, dg, up, rhs)


def _boundary_fit(h, u, n: int, bottom: bool):
    """Integral polynomial fit over the ``n`` cells nearest a column
    boundary (the boundary-closure pattern of
    regrid_edge_values.F90:594,1369): returns the fit coefficients
    C[0..n-1] in the boundary-anchored coordinate normalized by the
    n-cell depth, plus that depth, so callers can evaluate the edge
    value (C[0]) or the physical edge slope (C[1]/depth, negated at
    the bottom where the coordinate runs inward)."""
    if bottom:
        hh = h[::-1][:n]
        uu = u[::-1][:n]
    else:
        hh = h[:n]
        uu = u[:n]
    tot = jnp.sum(hh, axis=0) + _H_NEGLECT
    dz = jnp.maximum(hh / tot[None], 1e-10)
    x = jnp.concatenate([jnp.zeros_like(dz[:1]),
                         jnp.cumsum(dz, axis=0)], axis=0)
    xi, xip = x[:-1], x[1:]
    A = [[(xip[i] ** (j + 1) - xi[i] ** (j + 1)) / (j + 1)
          for j in range(n)] for i in range(n)]
    B = [uu[i] * dz[i] for i in range(n)]
    return _gauss_unrolled(A, B), tot


def edge_slopes_ih3(h, u):
    """Implicit 3rd-order edge slopes (edge_slopes_implicit_h3,
    regrid_edge_values.F90:803, post-2019 nondimensionalized
    coefficients): a diagonally dominant tridiagonal over the column
    interfaces with cubic boundary-slope closures.  Returns physical
    slopes du/dh at the nk+1 interfaces."""
    nk = h.shape[0]
    hn = jnp.maximum(h, _H_NEGLECT)
    if nk < 4:
        h0 = _iface_cells(hn, -1)
        h1 = _iface_cells(hn, 0)
        du = _iface_cells(u, 0) - _iface_cells(u, -1)
        s = 2.0 * du / (h0 + h1)
        K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
        return jnp.where((K == 0) | (K == nk), 0.0, s)
    h0r = _iface_cells(hn, -1)
    h1r = _iface_cells(hn, 0)
    I_h = 1.0 / (h0r + h1r)
    h0 = h0r * I_h
    h1 = h1r * I_h
    h0h1 = h0 * h1
    I_d = 1.0 / (1.0 + h0h1)
    lo = (h0h1 - h1 * h1 * h1) * I_d
    up = (h0h1 - h0 * h0 * h0) * I_d
    dg = jnp.ones_like(lo)
    rhs = 12.0 * (h0h1 * I_d) * ((_iface_cells(u, 0)
                                  - _iface_cells(u, -1)) * I_h)
    Ct, tot_t = _boundary_fit(hn, u, 4, bottom=False)
    Cb, tot_b = _boundary_fit(hn, u, 4, bottom=True)
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    edge_row = (K == 0) | (K == nk)
    lo = jnp.where(edge_row, 0.0, lo)
    up = jnp.where(edge_row, 0.0, up)
    dg = jnp.where(edge_row, 1.0, dg)
    rhs = jnp.where(K == 0, (Ct[1] / tot_t)[None], rhs)
    rhs = jnp.where(K == nk, (-Cb[1] / tot_b)[None], rhs)
    return _thomas_interfaces(lo, dg, up, rhs)


def _q3(ha, hb):
    """((hb+ha)^3 - ha^3)/hb — the cumulative cubic moment factor of
    the White & Adcroft (2009) interior systems."""
    return 3.0 * ha * ha + hb * (3.0 * ha + hb)


def _q4(ha, hb):
    return 4.0 * ha ** 3 + hb * (6.0 * ha * ha + hb * (4.0 * ha + hb))


def _q5(ha, hb):
    return 5.0 * ha ** 4 + hb * (10.0 * ha ** 3 + hb * (
        10.0 * ha * ha + hb * (5.0 * ha + hb)))


def _q6(ha, hb):
    return 6.0 * ha ** 5 + hb * (15.0 * ha ** 4 + hb * (
        20.0 * ha ** 3 + hb * (15.0 * ha * ha + hb * (6.0 * ha + hb))))


def _wa6_value_system(h0, h1, h2, h3, kind: str):
    """The 6-equation White & Adcroft (2009) moment system for one
    interface's implicit *edge value* (edge_values_implicit_h6,
    regrid_edge_values.F90:1252): unknowns (alpha, beta, a, b, c, d)
    of  alpha*e_{K-1} + e_K + beta*e_{K+1} = a*u0 + b*u1 + c*u2 + d*u3
    over the 4-cell stencil (h0..h3).  ``kind``: 'interior' (Eq. 48),
    'right' (right-biased second row, Eq. 49), 'left' (left-biased
    second-to-last row, Eq. 50).  Rows transcribed 1:1 from the
    reference's Asys columns (each Fortran Asys(:,j) is equation j)."""
    one = jnp.ones_like(h0)
    zero = jnp.zeros_like(h0)
    h1_2, h1_3 = h1 * h1, h1 ** 3
    h1_4, h1_5 = h1 ** 4, h1 ** 5
    h2_2, h2_3 = h2 * h2, h2 ** 3
    h2_4, h2_5 = h2 ** 4, h2 ** 5
    # alpha / beta columns per kind
    if kind == "interior":
        al = [one, -2.0 * h1, 3.0 * h1_2, -4.0 * h1_3, 5.0 * h1_4,
              -6.0 * h1_5]
        be = [one, 2.0 * h2, 3.0 * h2_2, 4.0 * h2_3, 5.0 * h2_4,
              6.0 * h2_5]
        rhs = [-one, zero, zero, zero, zero, zero]
    elif kind == "right":
        hb = h0 + h1
        al = [one, -2.0 * hb, 3.0 * hb ** 2, -4.0 * hb ** 3,
              5.0 * hb ** 4, -6.0 * hb ** 5]
        be = [one, zero, zero, zero, zero, zero]
        rhs = [-one, 2.0 * h1, -3.0 * h1_2, 4.0 * h1_3, -5.0 * h1_4,
               6.0 * h1_5]
    else:                                     # 'left'
        hb = h2 + h3
        al = [one, zero, zero, zero, zero, zero]
        be = [one, 2.0 * hb, 3.0 * hb ** 2, 4.0 * hb ** 3,
              5.0 * hb ** 4, 6.0 * hb ** 5]
        rhs = [-one, -2.0 * h2, -3.0 * h2_2, -4.0 * h2_3,
               -5.0 * h2_4, -6.0 * h2_5]
    a_col = [-one, 2.0 * h1 + h0, -_q3(h1, h0), _q4(h1, h0),
             -_q5(h1, h0), _q6(h1, h0)]
    b_col = [-one, h1, -h1_2, h1_3, -h1_4, h1_5]
    c_col = [-one, -h2, -h2_2, -h2_3, -h2_4, -h2_5]
    d_col = [-one, -(2.0 * h2 + h3), -_q3(h2, h3), -_q4(h2, h3),
             -_q5(h2, h3), -_q6(h2, h3)]
    # unknown ordering (a, beta, d, c, alpha, b): numerically searched
    # to maximize the worst-case pivot of the unpivoted elimination
    # over uniform/random/biased stencils (min pivot 0.035 with
    # normalized widths vs 0.013 for the natural ordering)
    A = [[a_col[j], be[j], d_col[j], c_col[j], al[j], b_col[j]]
         for j in range(6)]
    x = _gauss_unrolled(A, rhs)
    return [x[4], x[1], x[0], x[5], x[3], x[2]]


def _wa6_slope_system(h0, h1, h2, h3, kind: str):
    """The 6-equation system for one interface's implicit *edge slope*
    (edge_slopes_implicit_h5, regrid_edge_values.F90:977, W&A Eq.
    52-54); same unknown layout as :func:`_wa6_value_system` but for
    alpha*s_{K-1} + s_K + beta*s_{K+1} = a*u0 + ... with s in units
    of [u]/[h of the (normalized) widths fed in]."""
    one = jnp.ones_like(h0)
    zero = jnp.zeros_like(h0)
    two = 2.0 * one
    h1_2, h1_3, h1_4 = h1 * h1, h1 ** 3, h1 ** 4
    h1_5 = h1 ** 5
    h2_2, h2_3, h2_4 = h2 * h2, h2 ** 3, h2 ** 4
    h2_5 = h2 ** 5
    if kind == "interior":
        al = [zero, two, 6.0 * h1, -12.0 * h1_2, 20.0 * h1_3,
              -30.0 * h1_4]
        be = [zero, two, -6.0 * h2, -12.0 * h2_2, -20.0 * h2_3,
              -30.0 * h2_4]
        rhs = [zero, -two, zero, zero, zero, zero]
    elif kind == "right":
        hb = h0 + h1
        al = [zero, two, 6.0 * hb, -12.0 * hb ** 2, 20.0 * hb ** 3,
              -30.0 * hb ** 4]
        be = [zero, two, zero, zero, zero, zero]
        rhs = [zero, -two, -6.0 * h1, 12.0 * h1_2, -20.0 * h1_3,
               30.0 * h1_4]
    else:                                     # 'left'
        hb = h2 + h3
        al = [zero, two, zero, zero, zero, zero]
        be = [zero, two, -6.0 * hb, -12.0 * hb ** 2, -20.0 * hb ** 3,
              -30.0 * hb ** 4]
        rhs = [zero, -two, 6.0 * h2, 12.0 * h2_2, 20.0 * h2_3,
               30.0 * h2_4]
    a_col = [one, 2.0 * h1 + h0, _q3(h1, h0), -_q4(h1, h0),
             _q5(h1, h0), -_q6(h1, h0)]
    b_col = [one, h1, h1_2, -h1_3, h1_4, -h1_5]
    c_col = [one, -h2, h2_2, h2_3, h2_4, h2_5]
    d_col = [one, -(2.0 * h2 + h3), _q3(h2, h3), _q4(h2, h3),
             _q5(h2, h3), _q6(h2, h3)]
    # unknown ordering (c, a, d, beta, alpha, b): numerically searched
    # to maximize the worst-case pivot of the unpivoted elimination
    # over uniform/random/biased stencils (min pivot 0.40 with
    # normalized widths; the natural ordering hits an exactly zero
    # pivot on uniform grids)
    A = [[c_col[j], a_col[j], d_col[j], be[j], al[j], b_col[j]]
         for j in range(6)]
    x = _gauss_unrolled(A, rhs)
    return [x[4], x[3], x[1], x[5], x[0], x[2]]


def _wa6_tridiag(h, u, slopes: bool):
    """Assemble and solve the White & Adcroft interface tridiagonal
    for implicit h6 edge values or h5 edge slopes.  Stencil widths are
    normalized by their 4-cell mean before the 6x6 solves (the moment
    systems are invariant under that rescale for values; for slopes
    the rhs is un-normalized afterwards), keeping the unpivoted
    elimination well conditioned in fp32."""
    nk = h.shape[0]
    hmin_frac = 1e-4 if slopes else 1e-5
    system = _wa6_slope_system if slopes else _wa6_value_system

    def stencil(hs, kind):
        h0r, h1r, h2r, h3r = hs
        tot = (h0r + h1r) + (h2r + h3r)
        hmin = jnp.maximum(_H_NEGLECT, hmin_frac * tot)
        s = 0.25 * tot + _H_NEGLECT
        quad = [jnp.maximum(x, hmin) / s for x in (h0r, h1r, h2r, h3r)]
        C = system(*quad, kind)
        return C, s

    # interior rows, vectorized over all interfaces (rows 0, 1, nk-1,
    # nk are overwritten below)
    hs_int = [_iface_cells(h, o) for o in (-2, -1, 0, 1)]
    us_int = [_iface_cells(u, o) for o in (-2, -1, 0, 1)]
    C, s_int = stencil(hs_int, "interior")
    lo, up = C[0], C[1]
    rhs = C[2] * us_int[0] + C[3] * us_int[1] + C[4] * us_int[2] \
        + C[5] * us_int[3]
    if slopes:
        rhs = rhs / s_int

    def biased(cells, kind):
        hc = [h[c] for c in cells]
        uc = [u[c] for c in cells]
        Cb, s = stencil(hc, kind)
        r = Cb[2] * uc[0] + Cb[3] * uc[1] + Cb[4] * uc[2] \
            + Cb[5] * uc[3]
        if slopes:
            r = r / s
        return Cb[0], Cb[1], r

    lo_r, up_r, rhs_r = biased([0, 1, 2, 3], "right")
    lo_l, up_l, rhs_l = biased([nk - 4, nk - 3, nk - 2, nk - 1],
                               "left")
    lo = lo.at[1].set(lo_r).at[nk - 1].set(lo_l)
    up = up.at[1].set(up_r).at[nk - 1].set(up_l)
    rhs = rhs.at[1].set(rhs_r).at[nk - 1].set(rhs_l)

    # Dirichlet boundary rows from 6-cell quintic integral fits
    Ct, tot_t = _boundary_fit(h, u, 6, bottom=False)
    Cb, tot_b = _boundary_fit(h, u, 6, bottom=True)
    if slopes:
        top_val = Ct[1] / tot_t
        bot_val = -Cb[1] / tot_b
    else:
        top_val = Ct[0]
        bot_val = Cb[0]
    K = jnp.arange(nk + 1).reshape((-1,) + (1,) * (h.ndim - 1))
    edge_row = (K == 0) | (K == nk)
    lo = jnp.where(edge_row, 0.0, lo)
    up = jnp.where(edge_row, 0.0, up)
    dg = jnp.ones_like(lo)
    rhs = jnp.where(K == 0, top_val[None], rhs)
    rhs = jnp.where(K == nk, bot_val[None], rhs)
    return _thomas_interfaces(lo, dg, up, rhs)


def edge_values_ih6(h, u):
    """Implicit 6th-order edge values (edge_values_implicit_h6,
    regrid_edge_values.F90:1252): per-interface 6x6 White & Adcroft
    moment systems (closed-form unrolled elimination) feeding a
    tridiagonal along the column, with quintic boundary closures.
    Falls back to ih4 for columns shorter than 6 cells."""
    if h.shape[0] < 6:
        return edge_values_ih4(h, u)
    return _wa6_tridiag(jnp.maximum(h, _H_NEGLECT), u, slopes=False)


def edge_slopes_ih5(h, u):
    """Implicit 5th-order edge slopes (edge_slopes_implicit_h5,
    regrid_edge_values.F90:977).  Returns physical du/dh at the nk+1
    interfaces; falls back to ih3 for columns shorter than 6 cells."""
    if h.shape[0] < 6:
        return edge_slopes_ih3(h, u)
    return _wa6_tridiag(jnp.maximum(h, _H_NEGLECT), u, slopes=True)


def _hybgen_plm_slope(h, u, thin=1e-10):
    """PLM slope*h with hybgen thickness weighting
    (MOM_hybgen_remap.F90 hybgen_plm_coefs)."""
    dp = jnp.maximum(h, thin)
    u_up = _shift_k(u, -1)
    u_dn = _shift_k(u, 1)
    qcen = dp / (dp + 0.5 * (_shift_k(dp, -1) + _shift_k(dp, 1)))
    ztop = 2.0 * (u - u_up)
    zbot = 2.0 * (u_dn - u)
    zcen = qcen * (u_dn - u_up)
    mono = ztop * zbot > 0.0
    slope = jnp.sign(zbot) * jnp.minimum(
        jnp.abs(zcen), jnp.minimum(jnp.abs(zbot), jnp.abs(ztop)))
    slope = jnp.where(mono, slope, 0.0)
    nk = h.shape[0]
    K = jnp.arange(nk).reshape((-1,) + (1,) * (h.ndim - 1))
    slope = jnp.where((K == 0) | (K == nk - 1), 0.0, slope)
    return jnp.where(h <= thin, 0.0, slope)


def _hybgen_weno_edges(h, u, thin=1e-10):
    """WENO-reconciled parabola edge values
    (MOM_hybgen_remap.F90 hybgen_weno_coefs).  Returns (eL, eR)."""
    nk = h.shape[0]
    dp = jnp.maximum(h, thin)
    pcm = h <= thin
    dpm1 = _shift_k(dp, -1)
    dpp1 = _shift_k(dp, 1)
    qdpkm = 1.0 / (dpm1 + dp)                 # at interface above cell
    qdpkmkp = 1.0 / (dpm1 + dp + dpp1)
    dpkm2kp = dpm1 + 2.0 * dp + dpp1
    u_up = _shift_k(u, -1)
    # slope at interface above cell k (K): (u_k - u_{k-1})/(h_{k-1}+h_k)
    sl_above = qdpkm * (u - u_up)             # per cell: slope_edge(K)
    sl_below = _shift_k(sl_above, 1)          # slope_edge(K+1)
    K = jnp.arange(nk).reshape((-1,) + (1,) * (h.ndim - 1))
    sl_below = jnp.where(K == nk - 1, sl_above, sl_below)
    use_pcm = (sl_above * sl_below < 0.0) | pcm \
        | (K == 0) | (K == nk - 1)
    seh1 = dp * sl_below
    seh2 = dp * sl_above
    q01 = dpkm2kp * sl_below
    q02 = dpkm2kp * sl_above
    seh1 = jnp.where(jnp.abs(seh1) > jnp.abs(q02), q02, seh1)
    seh2 = jnp.where(jnp.abs(seh2) > jnp.abs(q01), q01, seh2)
    curv = (seh1 - seh2) * qdpkmkp
    q001 = seh1 - curv * dpp1
    q002 = seh2 + curv * dpm1
    eR0 = jnp.where(use_pcm, u, u + q001)      # lower edge estimate
    eL0 = jnp.where(use_pcm, u, u - q002)      # upper edge estimate
    zw1 = jnp.where(use_pcm, 0.0, (2.0 * q001 - q002) ** 2)
    zw2 = jnp.where(use_pcm, 0.0, (2.0 * q002 - q001) ** 2)
    # reconcile shared interface values by smoothness weights
    min_ratio = 1e-8
    zw1_k = zw1                                 # cell k, upper edge wt
    zw2_km = _shift_k(zw2, -1)                  # cell k-1, lower edge
    tot = zw1_k + zw2_km
    wt1 = jnp.where(tot <= 0.0, 0.5,
                    jnp.clip(zw1_k / jnp.maximum(tot, 1e-300),
                             min_ratio, 1.0 - min_ratio))
    eR_km = _shift_k(eR0, -1)                   # cell k-1 lower edge
    val_edge = wt1 * eR_km + (1.0 - wt1) * eL0  # at interface above k
    val_below = _shift_k(val_edge, 1)
    val_below = jnp.where(K == nk - 1, 2.0 * u - val_edge, val_below)
    # final monotonic adjustment within each cell: the reference's
    # exclusive if/elif chain, branchless
    q01 = val_below - u
    q02 = u - val_edge
    bad = q01 * q02 < 0.0
    q01z = jnp.where(bad, 0.0, q01)
    q02z = jnp.where(bad, 0.0, q02)
    c1 = (~bad) & (jnp.abs(q01z) > jnp.abs(2.0 * q02z))
    c2 = (~bad) & (~c1) & (jnp.abs(q02z) > jnp.abs(2.0 * q01z))
    q01f = jnp.where(c1, 2.0 * q02z, q01z)
    q02f = jnp.where(c2, 2.0 * q01z, q02z)
    eL = jnp.where(use_pcm, u, u - q02f)
    eR = jnp.where(use_pcm, u, u + q01f)
    return eL, eR


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


def _pqm_limit_full(h, u, eL, eR, dL, dR):
    """The full PQM limiter (PQM_limiter, PQM_functions.F90:75),
    vectorized: limited van-Leer slope consistency, extremum
    flattening, inflexion-point analysis of the quartic's second
    derivative, and the collapse of inflexion points onto the edge on
    the smoother side with the reference's fallback slope/edge
    adjustments.  Slopes dL/dR are in per-unit-ξ units (physical
    slope x h), which absorbs every h_c factor of the reference's
    formulas.  Boundary cells reduce to PCM."""
    nk = u.shape[0]
    u_l = _shift_k(u, -1)
    u_r = _shift_k(u, 1)
    h_l = _shift_k(h, -1)
    h_r = _shift_k(h, 1)
    eps = _H_NEGLECT
    # limited PLM slope, converted to ξ units (x h_c)
    sig_l = 2.0 * (u - u_l) * h / (h + eps)          # = 2Δ left
    sig_c = 2.0 * (u_r - u_l) * h / (h_l + 2.0 * h + h_r + eps)
    sig_r = 2.0 * (u_r - u) * h / (h + eps)
    slope = jnp.where(sig_l * sig_r > 0.0,
                      jnp.sign(sig_c) * jnp.minimum(
                          jnp.abs(sig_l), jnp.minimum(jnp.abs(sig_c),
                                                      jnp.abs(sig_r))),
                      0.0)
    # inconsistent edge slopes revert to the PLM slope
    dL = jnp.where(dL * slope <= 0.0, slope, dL)
    dR = jnp.where(dR * slope <= 0.0, slope, dR)
    # local extremum → flatten to PCM
    extremum = (eR - u) * (u - eL) <= 0.0

    def coefs(eL, eR, dL, dR):
        b = dL
        c = 30.0 * u - 12.0 * eR - 18.0 * eL + 1.5 * (dR - 3.0 * dL)
        d = -60.0 * u + (6.0 * dL - 4.0 * dR) + 28.0 * eR + 32.0 * eL
        e = 30.0 * u + 2.5 * (dR - dL) - 15.0 * (eL + eR)
        return b, c, d, e

    b, c, d, e = coefs(eL, eR, dL, dR)
    # inflexion points: roots of u'' = 6e ξ² + 3d ξ + c
    al1, al2, al3 = 6.0 * e, 3.0 * d, c
    rho = al2 * al2 - 4.0 * al1 * al3
    sq = jnp.sqrt(jnp.maximum(rho, 0.0))
    safe1 = jnp.where(al1 != 0.0, al1, 1.0)
    x1 = 0.5 * (-al2 - sq) / safe1
    x2 = 0.5 * (-al2 + sq) / safe1

    def grad(x):
        return ((4.0 * e * x + 3.0 * d) * x + 2.0 * c) * x + b

    in1 = (x1 >= 0.0) & (x1 <= 1.0)
    in2 = (x2 >= 0.0) & (x2 <= 1.0)
    bad1 = grad(x1) * slope < 0.0
    bad2 = grad(x2) * slope < 0.0
    quad = (al1 != 0.0) & (rho >= 0.0)
    bad_q = quad & ((in1 & in2 & (bad1 | bad2))
                    | (in1 & ~in2 & bad1)
                    | (~in1 & in2 & bad2))
    # degenerate (linear u'') case
    xl = -al3 / jnp.where(al2 != 0.0, al2, 1.0)
    bad_l = (al1 == 0.0) & (al2 != 0.0) & (xl >= 0.0) & (xl <= 1.0) \
        & (grad(xl) * slope < 0.0)
    bad = (bad_q | bad_l) & ~extremum
    to_left = jnp.abs(sig_l) < jnp.abs(sig_r)

    # collapse both inflexion points onto the left edge
    dL_L = (10.0 * u - 2.0 * eR - 8.0 * eL) / 3.0
    dR_L = -10.0 * u + 6.0 * eR + 4.0 * eL
    badL_l = dL_L * slope < 0.0          # left slope inconsistent
    badL_r = dR_L * slope < 0.0
    eR_L = jnp.where(badL_l, 5.0 * u - 4.0 * eL, eR)
    eL_L = jnp.where(~badL_l & badL_r, 0.5 * (5.0 * u - 3.0 * eR), eL)
    dL_L2 = jnp.where(badL_l, 0.0,
                      jnp.where(badL_r, 10.0 * (-u + eR) / 3.0, dL_L))
    dR_L2 = jnp.where(badL_l, 20.0 * (u - eL),
                      jnp.where(badL_r, 0.0, dR_L))

    # collapse both inflexion points onto the right edge
    dR_R = (-10.0 * u + 8.0 * eR + 2.0 * eL) / 3.0
    dL_R = 10.0 * u - 4.0 * eR - 6.0 * eL
    badR_l = dL_R * slope < 0.0
    badR_r = dR_R * slope < 0.0
    eR_R = jnp.where(badR_l, 0.5 * (5.0 * u - 3.0 * eL), eR)
    eL_R = jnp.where(~badR_l & badR_r, 5.0 * u - 4.0 * eR, eL)
    dL_R2 = jnp.where(badR_l, 0.0,
                      jnp.where(badR_r, 20.0 * (-u + eR), dL_R))
    dR_R2 = jnp.where(badR_l, 10.0 * (u - eL) / 3.0,
                      jnp.where(badR_r, 0.0, dR_R))

    pick = lambda lft, rgt, keep: jnp.where(
        bad, jnp.where(to_left, lft, rgt), keep)
    eL2 = pick(eL_L, eL_R, eL)
    eR2 = pick(eR_L, eR_R, eR)
    dL2 = pick(dL_L2, dL_R2, dL)
    dR2 = pick(dR_L2, dR_R2, dR)

    # extremum flattening overrides; boundary cells reduce to PCM
    K = jnp.arange(nk).reshape((-1,) + (1,) * (u.ndim - 1))
    pcm = extremum | (K == 0) | (K == nk - 1)
    z = jnp.zeros_like(u)
    eL2 = jnp.where(pcm, u, eL2)
    eR2 = jnp.where(pcm, u, eR2)
    dL2 = jnp.where(pcm, z, dL2)
    dR2 = jnp.where(pcm, z, dR2)
    return eL2, eR2, dL2, dR2


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
    if scheme == "PLM_HYBGEN":
        slope = _hybgen_plm_slope(h, u)
        return Reconstruction(c0=u - 0.5 * slope, c1=slope,
                              c2=jnp.zeros_like(u))
    if scheme == "WENO_HYBGEN":
        eL, eR = _hybgen_weno_edges(h, u)
        dU = eR - eL
        u6 = 6.0 * u - 3.0 * (eL + eR)
        return Reconstruction(c0=eL, c1=dU + u6, c2=-u6)
    if scheme in ("PQM_IH4IH3", "PQM_IH6IH5"):
        # White & Adcroft (2008) piecewise quartic: cell mean + edge
        # values + edge slopes pin the quartic.  PQM_IH4IH3 pairs the
        # implicit-h4 edge values with implicit-h3 edge slopes;
        # PQM_IH6IH5 the implicit-h6 values with implicit-h5 slopes
        # (regrid_interp.F90 INTERPOLATION_PQM_IH4IH3/IH6IH5).
        if scheme == "PQM_IH6IH5":
            edges = edge_values_ih6(h, u)
            slopes = edge_slopes_ih5(h, u)
        else:
            edges = edge_values_ih4(h, u)
            slopes = edge_slopes_ih3(h, u)
        if cfg.force_monotonic:
            eb_L, eb_R = _limit_edges(u, edges[:-1], edges[1:])
            edges = jnp.concatenate(
                [eb_L[:1], 0.5 * (eb_R[:-1] + eb_L[1:]), eb_R[-1:]],
                axis=0)
        eL, eR = edges[:-1], edges[1:]
        # physical interface slopes -> per-unit-ξ slopes of each cell
        dL = slopes[:-1] * h
        dR = slopes[1:] * h
        if cfg.force_monotonic:
            eL, eR, dL, dR = _pqm_limit_full(h, u, eL, eR, dL, dR)
        # the unique quartic pinned by (mean, edges, edge slopes):
        # PQM_reconstruction's closed-form coefficients
        # (PQM_functions.F90:20, in per-cell ξ with slopes already
        # scaled by h)
        a0 = eL
        a1 = dL
        a2 = 30.0 * u - 12.0 * eR - 18.0 * eL + 1.5 * (dR - 3.0 * dL)
        a3 = -60.0 * u + (6.0 * dL - 4.0 * dR) + 28.0 * eR + 32.0 * eL
        a4 = 30.0 * u + 2.5 * (dR - dL) - 15.0 * (eL + eR)
        return Reconstruction(c0=a0, c1=a1, c2=a2, c3=a3, c4=a4)
    if scheme in ("PPM_H4", "PPM_IH4", "PPM_CW", "PPM_HYBGEN"):
        if scheme == "PPM_CW":
            edges = edge_values_h2(h, u)
        elif scheme == "PPM_IH4":
            edges = edge_values_ih4(h, u)
        elif scheme == "PPM_HYBGEN":
            eLh, eRh = _hybgen_weno_edges(h, u)
            edges = jnp.concatenate(
                [eLh[:1], 0.5 * (eRh[:-1] + eLh[1:]), eRh[-1:]],
                axis=0)
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
    """I(z) = ∫_0^z u dz' for each position in z_eval (m, ...).

    The integral splits into two exactly-disjoint reductions over the
    source cells — completed cells (their lower interface at or above
    z contribute their full integral) plus the single containing cell
    (its partial polynomial integral):

        I(z) = Σ_k cellint_k·[z_{k+1} ≤ z]
             + Σ_k [z_k ≤ z < z_{k+1}]·h_k·F_k(ξ)

    Both are pure elementwise-into-reduce over the (m, nk, ...) pair
    space, which XLA fuses without materializing any (m, nk, ...)
    intermediate — unlike cumulative-scan or gather formulations,
    which dominated the full-step cost at OM4 scale on TPU.  Vanished
    layers (z_k == z_{k+1}) never match the inside test and
    contribute zero width, so shared interfaces are handled without
    tie-breaking."""
    zs = interface_positions(h_src)          # (nk+1, ...)
    hk = h_src + _H_NEGLECT
    cell_int = h_src * rec.cell_mean()
    total_z = zs[-1]
    z = jnp.clip(z_eval, 0.0, total_z[None])

    zb = z[:, None]                          # (m, 1, ...)
    zk = zs[:-1][None]                       # (1, nk, ...)
    zk1 = zs[1:][None]
    done = (zk1 <= zb).astype(z.dtype)
    inside = ((zk <= zb) & (zb < zk1)).astype(z.dtype)
    I_done = jnp.sum(done * cell_int[None], axis=1)
    xi = jnp.clip((zb - zk) / hk[None], 0.0, 1.0)
    partial = hk[None] * rec.integral_to(xi)
    I_part = jnp.sum(inside * partial, axis=1)
    return I_done + I_part


def remap_column_means_banded(h_src, u_src, h_dst, band: int,
                              cfg: RemapCfg = RemapCfg()):
    """Conservative remap assuming near-diagonal grid overlap.

    The full :func:`remap_column_means` evaluates every (dst
    interface, src cell) pair — an (M, nk, ...) op space that
    dominates the per-step ALE cost.  For the in-step Z*/HYCOM remap
    the target interfaces move only a CFL-bounded fraction of a layer
    per step, so dst interface m's containing src cell k satisfies
    |k - m| <= band with small band; evaluating only that diagonal
    band costs (2·band+1, M, ...) instead.

    EXACT by construction: whenever any clipped interface fails to
    find its containing cell within the band (large grid changes, long
    vanished-layer runs), the whole call falls back to the full remap
    through ``lax.cond`` — so callers may use this unconditionally on
    per-step paths; only the rare violating step pays full price.

    MEASURED on TPU v5e at nk=25, 512²: SLOWER than the full pair
    space (37 vs 21 ms for a 3-field batch) — the (2b+1) static
    k-axis gathers each materialize a full (M, ...) copy, outweighing
    the pair-space savings at shallow nk.  Off by default
    (ALE_REMAP_BAND=0); the crossover would come at much deeper
    columns (nk ≳ 75) where the full pair space grows quadratically
    but the banded copies stay linear.
    """
    rec = reconstruct(h_src, u_src, cfg)
    zs = interface_positions(h_src)              # (nk+1, ...)
    hk = h_src + _H_NEGLECT
    cell_int = h_src * rec.cell_mean()
    cumint0 = jnp.concatenate(
        [jnp.zeros_like(cell_int[:1]), jnp.cumsum(cell_int, axis=0)],
        axis=0)                                  # (nk+1, ...)
    total_z = zs[-1]
    z_dst = interface_positions(h_dst)           # (M, ...)
    M = z_dst.shape[0]
    nk = h_src.shape[0]
    z = jnp.clip(z_dst, 0.0, total_z[None])

    coeffs = [c for c in (rec.c0, rec.c1, rec.c2, rec.c3, rec.c4)
              if c is not None]
    import numpy as _np
    I = jnp.zeros_like(z)
    matched = jnp.zeros(z.shape, bool)
    for off in range(-band, band + 1):
        ks = _np.arange(M) + off
        valid = (ks >= 0) & (ks < nk)
        if not valid.any():
            continue
        idx = _np.clip(ks, 0, nk - 1)
        vmask = jnp.asarray(
            valid.reshape((M,) + (1,) * (z.ndim - 1)))
        zk = zs[idx]
        zk1 = zs[idx + 1]
        hkk = hk[idx]
        inside = (zk <= z) & (z < zk1) & vmask
        xi = jnp.clip((z - zk) / hkk, 0.0, 1.0)
        cc = [c[idx] for c in coeffs]
        rloc = Reconstruction(*(cc + [None] * (5 - len(cc))))
        part = hkk * rloc.integral_to(xi)
        I = I + jnp.where(inside, cumint0[idx] + part, 0.0)
        matched = matched | inside
    # interfaces clipped to the column bottom: full-column integral
    at_bottom = z >= total_z[None]
    I = jnp.where(at_bottom, cumint0[-1][None], I)
    matched = matched | at_bottom
    ok = jnp.all(matched)

    def _finish(I):
        du = I[1:] - I[:-1]
        u_dst = du / (h_dst + _H_NEGLECT)
        tiny = h_dst <= 1e-9 * (jnp.sum(h_src, axis=0, keepdims=True)
                                + _H_NEGLECT)
        u_fill = jnp.where(tiny, _shift_k(u_dst, -1), u_dst)
        return jnp.where(tiny, u_fill, u_dst)

    return jax.lax.cond(
        ok,
        lambda: _finish(I),
        lambda: remap_column_means(h_src, u_src, h_dst, cfg))


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
