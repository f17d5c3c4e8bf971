"""Fused Pallas continuity == jnp continuity_ppm (interpret mode).

The kernel mirrors continuity_ppm formula-for-formula; this asserts
the drop-in equivalence on the compute domain (halos excluded: both
paths leave them stale) for both sweep orders, with transport
matching active.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.continuity_ppm import ContinuityCfg, continuity_ppm
from mom6_tpu.core.continuity_pallas import (continuity_ppm_pallas,
                                             pallas_continuity_supported)


def _setup(ni=32, nj=24, nk=3, seed=0):
    dn = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
                reentrant_y=True)
    g = cartesian_grid(dn, lenlon_km=320.0, lenlat_km=240.0, f0=1e-4,
                       depth_fn=lambda x, y: jnp.full(x.shape, 1000.0),
                       max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    rng = np.random.default_rng(seed)
    h = jnp.asarray(300.0 + 30.0 * rng.standard_normal(
        (nk, dn.njh, dn.nih)), jnp.float64)
    u = jnp.asarray(0.3 * rng.standard_normal((nk, dn.njh, dn.nih)),
                    jnp.float64)
    v = jnp.asarray(0.3 * rng.standard_normal((nk, dn.njh, dn.nih)),
                    jnp.float64)
    vr_u = jnp.asarray(rng.uniform(0.5, 1.0, (nk, dn.njh, dn.nih)),
                       jnp.float64)
    vr_v = jnp.asarray(rng.uniform(0.5, 1.0, (nk, dn.njh, dn.nih)),
                       jnp.float64)
    h = dn.fill_halos(h)
    u = dn.fill_halos(u)
    v = dn.fill_halos(v)
    vr_u = dn.fill_halos(vr_u)
    vr_v = dn.fill_halos(vr_v)
    uhbt = jnp.asarray(
        50.0 * rng.standard_normal((dn.njh, dn.nih)), jnp.float64)
    vhbt = jnp.asarray(
        50.0 * rng.standard_normal((dn.njh, dn.nih)), jnp.float64)
    uhbt = dn.fill_halos(uhbt)
    vhbt = dn.fill_halos(vhbt)
    return dn, g, vg, u, v, h, vr_u, vr_v, uhbt, vhbt


@pytest.mark.parametrize("x_first", [True, False])
def test_pallas_matches_jnp(x_first):
    dn, g, vg, u, v, h, vr_u, vr_v, uhbt, vhbt = _setup()
    cfg = ContinuityCfg()
    assert pallas_continuity_supported(cfg, h.shape)
    dt = 600.0
    ref = continuity_ppm(g, vg, u, v, h, dt, cfg, uhbt=uhbt,
                         vhbt=vhbt, visc_rem_u=vr_u, visc_rem_v=vr_v,
                         x_first=x_first)
    out = continuity_ppm_pallas(g, vg, u, v, h, dt, cfg, uhbt, vhbt,
                                vr_u, vr_v, x_first=x_first,
                                interpret=True)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    for name in ("h", "uh", "vh", "u_cor", "v_cor"):
        a = np.asarray(getattr(ref, name), np.float64)[sl]
        b = np.asarray(getattr(out, name), np.float64)[sl]
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-6,
                                   err_msg=name)


def test_supported_gate():
    cfg = ContinuityCfg()
    assert not pallas_continuity_supported(
        ContinuityCfg(upwind_1st=True), (3, 24, 40))
    assert not pallas_continuity_supported(cfg, (3, 22, 40))
    assert not pallas_continuity_supported(cfg, (3, 24, 40),
                                           obc=object())
    assert pallas_continuity_supported(cfg, (3, 24, 40))
    # OM4-class wide rows: covered by the lane-tiled sweep
    assert pallas_continuity_supported(cfg, (25, 1096, 1448))
    # but very deep wide configs exceed even the tiled VMEM budget
    assert not pallas_continuity_supported(cfg, (60, 1096, 1448))


def test_tiled_matches_jnp(monkeypatch):
    """The lane-tiled (wide-row) sweep must agree with the jnp path
    exactly like the whole-row kernel.  ni=504 -> nih_pad=512 (4 lane
    tiles: exercises wall clamping at BOTH edges plus the interior
    consecutive-window mapping), nj=376 -> njh_pad=384 (3 tiles: the
    degenerate all-clamped case) on the transposed y-sweep."""
    monkeypatch.setenv("MOM6_PALLAS_FORCE_TILED", "1")
    dn, g, vg, u, v, h, vr_u, vr_v, uhbt, vhbt = _setup(
        ni=504, nj=376, nk=2, seed=5)
    cfg = ContinuityCfg()
    ref = continuity_ppm(g, vg, u, v, h, 600.0, cfg, uhbt=uhbt,
                         vhbt=vhbt, visc_rem_u=vr_u, visc_rem_v=vr_v)
    out = continuity_ppm_pallas(g, vg, u, v, h, 600.0, cfg, uhbt,
                                vhbt, vr_u, vr_v, interpret=True)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    for name in ("h", "uh", "vh", "u_cor", "v_cor"):
        a = np.asarray(getattr(ref, name), np.float64)[sl]
        b = np.asarray(getattr(out, name), np.float64)[sl]
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-12,
                                   err_msg=name)


@pytest.mark.parametrize("tiled", [False, True])
def test_bt_cont_pallas_matches_jnp(monkeypatch, tiled):
    """Fused set_up_BT_cont == jnp set_up_bt_cont (f64 interpret,
    bitwise-tight) in both the whole-row and lane-tiled kernels."""
    from mom6_tpu.core.continuity_ppm import set_up_bt_cont
    from mom6_tpu.core.continuity_pallas import set_up_bt_cont_pallas
    if tiled:
        monkeypatch.setenv("MOM6_PALLAS_FORCE_TILED", "1")
        dn, g, vg, u, v, h, vr_u, vr_v, _, _ = _setup(
            ni=504, nj=376, nk=2, seed=7)
    else:
        dn, g, vg, u, v, h, vr_u, vr_v, _, _ = _setup(seed=7)
    cfg = ContinuityCfg()
    ref = set_up_bt_cont(g, vg, u, v, h, 600.0, cfg, vr_u, vr_v)
    out = set_up_bt_cont_pallas(g, vg, u, v, h, 600.0, cfg, vr_u,
                                vr_v, interpret=True)
    H = dn.halo
    sl = (slice(H, -H), slice(H, -H))
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), np.float64)[sl]
        b = np.asarray(getattr(out, name), np.float64)[sl]
        scale = np.abs(a).max() + 1e-6
        # the u_turn fit divides by the cancellation FA_far - FA_0
        # (~1e-8 relative at near-degenerate faces), which amplifies
        # the shape-dependent XLA fusion ulps of the tiled windows
        # (~1e-15 on the FA fields) to ~1e-10; btstep re-anchors the
        # curve through the uhbt0 residual, so that noise is inert
        atol = 3e-9 if name.startswith(("uBT", "vBT")) else 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=atol,
                                   err_msg=name)


def test_pallas_matches_jnp_with_land():
    """Equivalence must hold through the PPM edge mask logic at a
    coastline (mask2dT enters the slope zeroing and wall fallbacks)."""
    dn, g, vg, u, v, h, vr_u, vr_v, uhbt, vhbt = _setup(seed=3)
    # carve a land strip through the domain
    depth = jnp.full((dn.njh, dn.nih), 1000.0)
    depth = depth.at[:, dn.halo + 10:dn.halo + 14].set(0.0)
    import dataclasses as dc
    maskT = (depth > 0).astype(h.dtype)
    from mom6_tpu.parallel.stencil import ip1, jp1
    maskCu = maskT * ip1(maskT)
    maskCv = maskT * jp1(maskT)
    g2 = dc.replace(g, mask2dT=maskT, mask2dCu=maskCu,
                    mask2dCv=maskCv)
    u = u * maskCu
    v = v * maskCv
    cfg = ContinuityCfg()
    ref = continuity_ppm(g2, vg, u, v, h, 600.0, cfg, uhbt=uhbt,
                         vhbt=vhbt, visc_rem_u=vr_u, visc_rem_v=vr_v)
    out = continuity_ppm_pallas(g2, vg, u, v, h, 600.0, cfg, uhbt,
                                vhbt, vr_u, vr_v, interpret=True)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    for name in ("h", "uh", "vh"):
        a = np.asarray(getattr(ref, name), np.float64)[sl]
        b = np.asarray(getattr(out, name), np.float64)[sl]
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-12,
                                   err_msg=name)
