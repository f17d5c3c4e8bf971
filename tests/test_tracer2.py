import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.isopycnal_slopes import SlopeCfg, isoneutral_slopes
from mom6_tpu.tracer.neutral_diffusion import (NeutralDiffCfg,
                                               neutral_diffusion)
from mom6_tpu.tracer.offline import OfflineCfg, step_offline
from mom6_tpu.tracer.cfc import (CFCCfg, cfc_solubility, cfc_schmidt,
                                 cfc_surface_flux)
from mom6_tpu.eos import LinearEOS

EOS = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)


def setup(nk=4):
    d = Domain(ni=16, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=80.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    return d, g, vg


def test_isoneutral_slopes_flat_and_tilted():
    d, g, vg = setup()
    h = d.fill_halos(d.pad(jnp.full((4, 8, 16), 100.0)))
    # T varying only in z → flat neutral surfaces → zero slopes
    T = jnp.asarray(np.broadcast_to(
        np.linspace(15, 5, 4)[:, None, None], (4, 16, 24)).copy())
    S = jnp.full_like(T, 35.0)
    sl = isoneutral_slopes(SlopeCfg(), g, vg, h, T, S, EOS)
    assert float(jnp.max(jnp.abs(d.interior(sl.slope_x)))) < 1e-12
    # add lateral T gradient → nonzero slope of the right sign
    x = np.arange(24)
    T2 = T + 0.1 * jnp.asarray(x)[None, None, :]
    T2 = d.fill_halos(T2)
    sl2 = isoneutral_slopes(SlopeCfg(slope_max=1.0), g, vg, h, T2, S,
                            EOS)
    sx = np.asarray(d.interior(sl2.slope_x))
    # away from the reentrant seam (where the linear T wraps
    # discontinuously) the slope matches the analytic z-up value
    # −(∂ρ/∂x)/(∂ρ/∂z_up) = −(−2e-6)/(−6.67e-3) ≈ −3.0e-4: warmer
    # (lighter) water toward +x over stable stratification means the
    # neutral surfaces deepen toward +x
    interior = sx[:, :, 3:12]
    np.testing.assert_allclose(interior, -3.0e-4, rtol=0.01)


def test_neutral_diffusion_conserves():
    d, g, vg = setup()
    rng = np.random.default_rng(0)
    h = d.fill_halos(d.pad(jnp.full((4, 8, 16), 100.0)))
    T = d.fill_halos(d.pad(jnp.asarray(
        10.0 + rng.standard_normal((4, 8, 16)))))
    S = jnp.full_like(T, 35.0)
    dye = d.fill_halos(d.pad(jnp.asarray(
        rng.uniform(0, 1, (4, 8, 16)))))
    cfg = NeutralDiffCfg(khtr=500.0)
    out = neutral_diffusion(d, g, vg, {"dye": dye}, h, T, S, EOS,
                            dt=3600.0, cfg=cfg)
    a = d.interior(g.areaT)
    tot0 = float(jnp.sum(d.interior(dye * h) * a))
    tot1 = float(jnp.sum(d.interior(out["dye"] * h) * a))
    assert abs(tot1 - tot0) / abs(tot0) < 1e-12
    assert float(jnp.var(d.interior(out["dye"]))) \
        < float(jnp.var(d.interior(dye)))


def test_offline_transport():
    d, g, vg = setup(nk=2)
    h = d.fill_halos(d.pad(jnp.full((2, 8, 16), 100.0)))
    area = float(g.areaT[5, 5])
    # eastward transport of 1 cell per offline step
    uhtr = d.fill_halos(d.pad(jnp.full((2, 8, 16), 100.0 * area)))
    vhtr = jnp.zeros_like(uhtr)
    x = np.arange(24)
    blob = np.exp(-(((x - 8 + 12) % 16 - 12) ** 2) / 4.0)
    c = d.fill_halos(jnp.asarray(np.broadcast_to(blob, (2, 16, 24))
                                 * np.ones((2, 16, 24))))
    tr, h_end = step_offline(d, g, {"c": c}, h, uhtr, vhtr, None,
                             OfflineCfg())
    got = np.asarray(d.interior(tr["c"]))[0, 4]
    # center of mass moved ~1 cell east
    x16 = np.arange(16)
    com0 = (np.asarray(d.interior(c))[0, 4] * x16).sum() / \
        np.asarray(d.interior(c))[0, 4].sum()
    com1 = (got * x16).sum() / got.sum()
    assert 0.5 < (com1 - com0) < 1.5
    np.testing.assert_allclose(np.asarray(d.interior(h_end)), 100.0,
                               rtol=1e-12)


def test_cfc_properties():
    T = jnp.asarray(10.0)
    S = jnp.asarray(35.0)
    # solubility: higher in cold water
    sol_cold = float(cfc_solubility("CFC11", jnp.asarray(2.0), S))
    sol_warm = float(cfc_solubility("CFC11", jnp.asarray(25.0), S))
    assert sol_cold > sol_warm > 0.0
    # plausible magnitude (mol/l/atm ~ 0.01-0.03 for CFC-11 at 10C)
    sol10 = float(cfc_solubility("CFC11", T, S))
    assert 0.005 < sol10 < 0.05
    # Schmidt number ~ 1000-2000 at 10C, decreasing with T
    assert cfc_schmidt("CFC12", 10.0) > cfc_schmidt("CFC12", 25.0)
    # undersaturated surface water takes up CFC
    flux = float(cfc_surface_flux(CFCCfg(), jnp.asarray(0.0), T, S,
                                  jnp.asarray(8.0),
                                  jnp.asarray(250e-12)))
    assert flux > 0.0


def test_hor_bnd_diffusion_confined_to_bld():
    from mom6_tpu.tracer.hor_bnd_diffusion import (HorBndDiffCfg,
                                                   hor_bnd_diffusion)
    d, g, vg = setup(nk=4)
    h = d.fill_halos(d.pad(jnp.full((4, 8, 16), 50.0)))
    rng = np.random.default_rng(0)
    t = d.fill_halos(d.pad(jnp.asarray(
        10.0 + rng.standard_normal((4, 8, 16)))))
    bld = jnp.full_like(g.bathyT, 75.0)   # covers layer 0 + half of 1
    out = hor_bnd_diffusion(d, g, {"c": t}, h, bld, dt=3600.0,
                            cfg=HorBndDiffCfg(khtr_bnd=2000.0))
    a = d.interior(g.areaT)
    tot0 = float(jnp.sum(d.interior(t * h) * a))
    tot1 = float(jnp.sum(d.interior(out["c"] * h) * a))
    assert abs(tot1 - tot0) / abs(tot0) < 1e-12
    v0 = np.asarray(d.interior(t))
    v1 = np.asarray(d.interior(out["c"]))
    # surface layer smoothed, deep layers untouched
    assert v1[0].var() < v0[0].var()
    np.testing.assert_array_equal(v1[2:], v0[2:])
