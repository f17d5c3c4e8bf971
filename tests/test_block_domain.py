"""Land-block compute elimination (BlockDomain).

The block-compressed layout must reproduce the dense Domain bitwise
on wet cells: same halo-fill semantics, same split-RK2 dynamics —
only the all-land blocks' work disappears.  Mirrors the masktable
semantics of MOM_domains.F90:488-681 (gen_auto_mask_table)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.parallel.block_domain import (BlockDomain,
                                            choose_wet_blocks,
                                            blockify, blockify_grid,
                                            unblockify)
from mom6_tpu.core.grid import cartesian_grid, Grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.dynamics_split_rk2 import (SplitCfg,
                                              init_split_state,
                                              step_dyn_split_rk2)
from mom6_tpu.core.barotropic import BarotropicCfg
from mom6_tpu.core.vert_friction import VertViscCfg
from mom6_tpu.param.lateral.hor_visc import HorViscCfg


def _island_depth(nj, ni, max_depth=1000.0):
    """Topography with a large land island — ~30% land, big enough
    that interior blocks are land even with the halo-wide buffer."""
    d = np.full((nj, ni), max_depth)
    d[2:2 + 9 * nj // 16, 2:2 + 9 * ni // 16] = 0.0
    return d


def _setup(blocked: bool):
    ni = nj = 64
    nk = 3
    depth = _island_depth(nj, ni)
    dn = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
                reentrant_y=True)
    depth_pad = np.pad(depth, 4, mode="wrap")   # padded coords
    g = cartesian_grid(dn, lenlon_km=640.0, lenlat_km=640.0,
                       f0=1e-4,
                       depth_fn=lambda x, y: jnp.asarray(depth_pad),
                       max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=nk)
    rng = np.random.default_rng(3)
    h0 = np.where(depth[None] > 0,
                  1000.0 / nk + rng.standard_normal((nk, nj, ni)),
                  1e-10)
    u0 = 0.05 * rng.standard_normal((nk, nj, ni)) \
        * np.asarray(dn.interior(g.mask2dCu))
    v0 = 0.05 * rng.standard_normal((nk, nj, ni)) \
        * np.asarray(dn.interior(g.mask2dCv))
    taux0 = 0.1 * np.ones((nj, ni))
    if not blocked:
        d = dn
        h = d.fill_halos(d.pad(jnp.asarray(h0)))
        u = d.fill_halos(d.pad(jnp.asarray(u0)))
        v = d.fill_halos(d.pad(jnp.asarray(v0)))
        taux = d.fill_halos(d.pad(jnp.asarray(taux0))) * g.mask2dCu
    else:
        mask = np.asarray(dn.interior(g.mask2dT))
        blocks = choose_wet_blocks(mask, 8, 8, halo=4,
                                   reentrant_x=True, reentrant_y=True)
        assert len(blocks) < (ni // 8) * (nj // 8)   # blocks dropped
        d = BlockDomain(ni=ni, nj=nj, tj=8, ti=8, blocks=blocks,
                        halo=4, reentrant_x=True, reentrant_y=True)
        g = blockify_grid(d, dn, g)
        h = blockify(d, jnp.asarray(h0))
        u = blockify(d, jnp.asarray(u0))
        v = blockify(d, jnp.asarray(v0))
        taux = blockify(d, jnp.asarray(taux0)) * g.mask2dCu
    st = State(u=u, v=v, h=h)
    cfg = SplitCfg(
        vertvisc=VertViscCfg(kv=1e-4),
        horvisc=HorViscCfg(biharmonic=True, smag_bi_const=0.06,
                           dt=300.0),
        barotropic=BarotropicCfg(nstep=16, use_pallas=False))
    sp = init_split_state(d, g, vg, st)
    return d, g, vg, st, sp, MechForcing(taux=taux), cfg


def test_halo_fill_matches_dense():
    dn = Domain(ni=32, nj=32, halo=4, reentrant_x=True,
                reentrant_y=True)
    rng = np.random.default_rng(0)
    f0 = rng.standard_normal((32, 32))
    dense = np.asarray(dn.fill_halos(dn.pad(jnp.asarray(f0))))
    # all blocks wet: the packed fill must reproduce the dense fill
    bd = BlockDomain(ni=32, nj=32, tj=8, ti=8,
                     blocks=choose_wet_blocks(np.ones((32, 32)), 8, 8,
                                              halo=4),
                     halo=4, reentrant_x=True, reentrant_y=True)
    packed = blockify(bd, jnp.asarray(f0))
    # interiors agree
    np.testing.assert_array_equal(unblockify(bd, packed), f0)
    # per-block halos: check against the dense filled array by
    # reading each block's ring from the dense global (wrap indexing)
    H = 4
    # (tjh, nb, tih) block view — independent of the stacking axis
    pb = np.asarray(bd._as_blocks(jnp.asarray(packed)))
    for k, (jb, ib) in enumerate(bd.blocks):
        js = jb * 8
        is_ = ib * 8
        for dj in range(-H, 8 + H):
            for di in range(-H, 8 + H):
                gj = (js + dj) % 32
                gi = (is_ + di) % 32
                np.testing.assert_allclose(pb[dj + H, k, di + H],
                                           f0[gj, gi], rtol=0)


def test_split_dynamics_matches_dense():
    dd, gd, vg, std, spd, fd, cfg = _setup(False)
    db, gb, _, stb, spb, fb, _ = _setup(True)

    for n in range(3):
        std, spd, _ = step_dyn_split_rk2(dd, gd, vg, std, spd, fd,
                                         300.0, cfg,
                                         x_first=(n % 2 == 0))
        stb, spb, _ = step_dyn_split_rk2(db, gb, vg, stb, spb, fb,
                                         300.0, cfg,
                                         x_first=(n % 2 == 0))
    mask = np.asarray(dd.interior(gd.mask2dT))
    for f in ("h", "u", "v"):
        a = np.asarray(dd.interior(getattr(std, f)))
        b = unblockify(db, getattr(stb, f), fill=0.0)
        sel = np.broadcast_to(mask > 0, a.shape)
        scale = np.abs(a[sel]).max() + 1e-30
        np.testing.assert_allclose(b[sel] / scale, a[sel] / scale,
                                   rtol=0, atol=1e-11,
                                   err_msg=f"field {f}")


def test_compute_saving():
    """At production-like block sizes (block >> halo) dropping land
    blocks beats the per-block halo overhead: 256x256 with a quarter
    land and 64x64 blocks packs ~11% smaller than dense."""
    mask = np.ones((256, 256))
    mask[:192, :192] = 0.0                    # 9/16 land
    blocks = choose_wet_blocks(mask, 64, 64, halo=4,
                               reentrant_x=False, reentrant_y=False)
    bd = BlockDomain(ni=256, nj=256, tj=64, ti=64, blocks=blocks,
                     halo=4)
    dense_cells = (256 + 8) * (256 + 8)
    packed_cells = bd.njh * bd.nih
    # the 4 interior land blocks drop; the rim land blocks survive as
    # the metric-carrying buffer (determine_land_blocks' ibuf/jbuf)
    assert len(blocks) == 12
    assert packed_cells < 0.92 * dense_cells
