import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.param.vertical.energetic_pbl import EPBLCfg, energetic_pbl
from mom6_tpu.param.vertical.tidal_mixing import (TidalMixingCfg,
                                                  tidal_mixing_coeffs,
                                                  internal_tide_input)
from mom6_tpu.core.porous_barriers import porous_widths_layer
from mom6_tpu.framework.random import gridded_normal, gridded_uniform
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.eos import LinearEOS

EOS = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)


def col(a):
    return jnp.asarray(np.asarray(a, dtype=np.float64)).reshape(-1, 1, 1)


def test_epbl_mld_grows_with_wind():
    h = col([10.0] * 20)
    T = col(np.linspace(18, 4, 20))
    S = col([35.0] * 20)
    weak = energetic_pbl(EPBLCfg(), h, T, S, EOS, 1027.0, 9.8, 3600.0,
                         ustar=jnp.full((1, 1), 0.003))
    strong = energetic_pbl(EPBLCfg(), h, T, S, EOS, 1027.0, 9.8, 3600.0,
                           ustar=jnp.full((1, 1), 0.03))
    assert float(strong.mld[0, 0]) > float(weak.mld[0, 0])
    assert float(strong.mld[0, 0]) < 200.0
    kd = np.asarray(strong.kd_int).ravel()
    assert kd[0] == 0.0 and kd.max() > 1e-4


def test_tidal_mixing_bottom_intensified():
    h = col([200.0] * 10)
    n2 = jnp.full((9, 1, 1), 1e-6)
    e_flux = jnp.full((1, 1), 0.02)    # W m-2
    kd = np.asarray(tidal_mixing_coeffs(TidalMixingCfg(), h, n2,
                                        e_flux)).ravel()
    assert kd[-1] > kd[0] * 5.0        # bottom intensified
    assert kd.max() <= 5e-3 + 1e-12
    E = internal_tide_input(jnp.asarray(0.05), jnp.asarray(100.0),
                            jnp.asarray(1e-3))
    assert float(E) > 0.0


def test_porous_fraction():
    """A knife-edge sill (Dmin ≈ Dmax ≈ Davg at -150 m) blocks
    everything below and passes everything above — the step-function
    limit of the Adcroft fit."""
    import dataclasses as dc
    d = Domain(ni=8, nj=8, halo=2)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=80.0)
    e = jnp.broadcast_to(jnp.asarray([0.0, -100.0, -200.0, -300.0]
                                     ).reshape(4, 1, 1), (4, 12, 12))
    gp = dc.replace(
        g,
        porous_DminU=jnp.full((12, 12), -150.0 - 1e-6),
        porous_DmaxU=jnp.full((12, 12), -150.0 + 1e-6),
        porous_DavgU=jnp.full((12, 12), -150.0))
    pu = porous_widths_layer(gp, e, "U")
    pu = np.asarray(pu)[:, 5, 5]
    np.testing.assert_allclose(pu, [1.0, 0.5, 0.0], atol=1e-6)


def test_gridded_random_layout_invariant():
    """The same global cell gets the same value regardless of shard
    origin — the property MOM_random needs for layout invariance."""
    d_full = Domain(ni=16, nj=8, halo=2)
    r_full = np.asarray(gridded_normal(d_full, seed=7, nk=2))
    # a "shard" covering the east half: global origin i0=8
    d_half = Domain(ni=8, nj=8, halo=2)
    r_half = np.asarray(gridded_normal(d_half, seed=7, nk=2, i0=8))
    # interior comparison: full[:, :, H+8:H+16] == half[:, :, H:H+8]
    np.testing.assert_array_equal(r_full[:, 2:10, 10:18],
                                  r_half[:, 2:10, 2:10])
    u = np.asarray(gridded_uniform(d_full, seed=1))
    assert 0.0 <= u.min() and u.max() < 1.0
    # different seeds differ
    u2 = np.asarray(gridded_uniform(d_full, seed=2))
    assert not np.allclose(u, u2)
