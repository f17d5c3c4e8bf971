"""Tripolar model path: the dyn cores' vector fills respect the fold
(stagger shifts + sign flips), and a fold-symmetric state stays
fold-symmetric under the full step."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 16
NJGLOBAL = 12
NK = 2
DT = 300.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 500.0
F_0 = 0.0
REENTRANT_X = True
TRIPOLAR_N = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
"""


def test_tripolar_model_builds_and_steps():
    m = build_model(ParamFile(text=BASE))
    assert m.domain.tripolar_n
    # seed a flow and step
    rng = np.random.default_rng(0)
    u0 = m.domain.fill_halos(jnp.asarray(
        0.05 * rng.standard_normal(m.state.u.shape)))
    s = m.state.replace(u=u0 * m.grid.mask2dCu)
    import mom6_tpu.core.dynamics_split_rk2 as dsr
    from mom6_tpu.core.dynamics_split_rk2 import init_split_state
    a = init_split_state(m.domain, m.grid, m.vgrid, s)
    step = m.step_fn()
    tr = m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert np.all(np.isfinite(np.asarray(s.h)))


def _unfold(a_int, kind, nj, ni):
    """Unfold an interior A-domain field (nk, nj, ni) onto the
    2nj-row double cover: the upper half is the fold image."""
    nk = a_int.shape[0]
    out = np.zeros((nk, 2 * nj, ni), a_int.dtype)
    out[:, :nj] = a_int
    for j in range(nj, 2 * nj):
        for i in range(ni):
            if kind == "T":
                out[:, j, i] = a_int[:, 2 * nj - 1 - j, (ni - 1 - i) % ni]
            elif kind == "U":
                out[:, j, i] = -a_int[:, 2 * nj - 1 - j,
                                      (ni - 2 - i) % ni]
            elif kind == "V":
                js = 2 * nj - 2 - j
                if 0 <= js < nj:
                    out[:, j, i] = -a_int[:, js, (ni - 1 - i) % ni]
    return out


def test_fold_equals_unfolded_double_cover():
    """The defining property of the tripolar fold: an nj-row folded
    domain evolves exactly like the lower half of its 2nj-row
    unfolded double cover (walls at both ends, x-reentrant), with the
    upper half the rotated image.  Any stagger/sign error in the fold
    exchange breaks this within a step."""
    mA = build_model(ParamFile(text=BASE))
    mB = build_model(ParamFile(text=BASE.replace(
        "NJGLOBAL = 12", "NJGLOBAL = 24").replace(
        "LENLAT = 120.0", "LENLAT = 240.0").replace(
        "TRIPOLAR_N = True", "TRIPOLAR_N = False")))
    dA, dB = mA.domain, mB.domain
    H, nj, ni = dA.halo, dA.njl, dA.nil
    rng = np.random.default_rng(3)
    u_i = (0.05 * rng.standard_normal((2, nj, ni))).astype(np.float64)
    # A initial state
    uA = jnp.zeros_like(mA.state.u).at[:, H:H + nj, H:H + ni].set(
        jnp.asarray(u_i))
    uA = dA.fill_halos(uA, stagger="U", sign=-1.0) * mA.grid.mask2dCu
    sA = mA.state.replace(u=uA)
    # B initial state: the unfolded image
    uB_i = _unfold(u_i, "U", nj, ni)
    uB = jnp.zeros_like(mB.state.u).at[:, H:H + 2 * nj, H:H + ni].set(
        jnp.asarray(uB_i))
    uB = dB.fill_halos(uB) * mB.grid.mask2dCu
    sB = mB.state.replace(u=uB)

    from mom6_tpu.core.dynamics_split_rk2 import init_split_state
    aA = init_split_state(dA, mA.grid, mA.vgrid, sA)
    aB = init_split_state(dB, mB.grid, mB.vgrid, sB)
    stepA, stepB = mA.step_fn(), mB.step_fn()
    trA, trB = mA.tracers, mB.tracers
    for k in range(3):
        sA, aA, trA = stepA(sA, aA, trA, n=k)
        sB, aB, trB = stepB(sB, aB, trB, n=k)
    for name, kind in (("u", "U"), ("v", "V"), ("h", "T")):
        fa = np.asarray(dA.interior(getattr(sA, name)))
        fb = np.asarray(dB.interior(getattr(sB, name)))[:, :nj]
        if kind == "V":
            fa = fa[:, :-1]     # the fold face row is shared with B's
            fb = fb[:, :-1]     # interior; compare the unambiguous rows
        scale = np.abs(fb).max() + 1e-30
        assert np.abs(fa - fb).max() < 1e-10 * scale, name
