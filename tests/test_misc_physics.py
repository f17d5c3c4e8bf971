import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.tracer.hor_diff import TracerHorDiffCfg, tracer_hordiff
from mom6_tpu.param.vertical.sponge import SpongeCfg, apply_sponge
from mom6_tpu.param.vertical.geothermal import (GeothermalCfg,
                                                geothermal_heating)
from mom6_tpu.framework.time_manager import Time, Calendar
from mom6_tpu.drivers.surface_forcing import (SurfaceForcingCfg,
                                              build_wind,
                                              buoyancy_restoring)


def setup():
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0)
    return d, g


def test_hordiff_conserves_and_smooths():
    d, g = setup()
    rng = np.random.default_rng(0)
    h = d.fill_halos(d.pad(jnp.full((3, 16, 16), 100.0)))
    T = d.fill_halos(d.pad(jnp.asarray(
        10.0 + rng.standard_normal((3, 16, 16)))))
    cfg = TracerHorDiffCfg(khtr=1000.0)
    out = tracer_hordiff(d, g, {"T": T}, h, dt=3600.0, cfg=cfg)
    a = d.interior(g.areaT)
    tot0 = float(jnp.sum(d.interior(T * h) * a))
    tot1 = float(jnp.sum(d.interior(out["T"] * h) * a))
    assert abs(tot1 - tot0) / abs(tot0) < 1e-12
    assert float(jnp.var(d.interior(out["T"]))) \
        < float(jnp.var(d.interior(T)))


def test_sponge_restores():
    h = jnp.full((3, 4, 4), 100.0)
    T = jnp.full((3, 4, 4), 10.0)
    ref = jnp.full((3, 4, 4), 20.0)
    irt = jnp.full((4, 4), 1.0 / 3600.0)
    out = apply_sponge({"T": T}, h, irt, dt=3600.0, ref_fields={"T": ref})
    # implicit: T' = (T + dt*g*Tref)/(1+dt*g) = (10+20)/2 = 15
    np.testing.assert_allclose(np.asarray(out["T"]), 15.0, rtol=1e-12)
    # zero damping leaves untouched
    out2 = apply_sponge({"T": T}, h, 0.0 * irt, 3600.0, {"T": ref})
    np.testing.assert_allclose(np.asarray(out2["T"]), 10.0)


def test_sponge_with_remap():
    from mom6_tpu.ale.remapping import RemapCfg
    h = jnp.full((4, 1, 1), 25.0)
    ref_h = jnp.full((2, 1, 1), 50.0)
    ref_T = jnp.asarray([4.0, 8.0]).reshape(2, 1, 1)
    T = jnp.zeros((4, 1, 1))
    irt = jnp.full((1, 1), 1e9)    # instant restoring
    out = apply_sponge({"T": T}, h, irt, 1.0, {"T": ref_T}, ref_h=ref_h)
    np.testing.assert_allclose(np.asarray(out["T"]).ravel(),
                               [4.0, 4.0, 8.0, 8.0], atol=1e-6)


def test_geothermal_heats_bottom_wet_layer():
    T = jnp.full((3, 2, 2), 4.0)
    h = jnp.asarray(np.array([[ [100.,100.],[100.,100.]],
                              [[100.,100.],[100.,100.]],
                              [[1e-6,100.],[100.,1e-6]]]))
    cfg = GeothermalCfg(geothermal_flux=0.5)
    out = np.asarray(geothermal_heating(cfg, T, h, dt=86400.0))
    # bottom WET layer warms: at (0,0) that's k=1; at (0,1) k=2
    assert out[1, 0, 0] > 4.0 and out[2, 0, 0] == 4.0
    assert out[2, 0, 1] > 4.0 and out[1, 0, 1] == 4.0
    # upper layers untouched
    assert out[0].max() == 4.0


def test_time_manager_calendars():
    cal = Calendar("NOLEAP")
    t = Time.from_date(cal, 2000, 3, 1)
    assert t.to_date(cal)[:3] == (2000, 3, 1)
    t2 = t + 86400 * 31
    assert t2.to_date(cal)[:3] == (2000, 4, 1)
    greg = Calendar("GREGORIAN")
    feb29 = Time.from_date(greg, 2000, 2, 29)
    assert feb29.to_date(greg)[:3] == (2000, 2, 29)
    # 1900 is not a Gregorian leap year
    assert greg.days_in_month(1900, 2) == 28
    assert greg.days_in_month(2000, 2) == 29
    d360 = Calendar("360_DAY")
    assert d360.days_in_year(1999) == 360
    # arithmetic exactness
    a = Time(5, 86399) + 1
    assert (a.days, a.seconds) == (6, 0)


def test_wind_and_restoring_configs():
    d, g = setup()
    cfg = SurfaceForcingCfg(wind_config="gyres", taux_magnitude=0.1)
    mf = build_wind(cfg, g, south=0.0, lenlat=160.0)
    tx = np.asarray(d.interior(mf.taux))
    assert tx.min() < -0.05 and tx.max() > 0.05
    # restoring: cold SST under warm target → positive heat flux
    cfg2 = SurfaceForcingCfg(restore_sst=True, fluxconst=1.0,
                             sst_south=25.0, sst_north=5.0)
    sst = jnp.full_like(g.bathyT, 2.0)
    fl = buoyancy_restoring(cfg2, g, sst, south=0.0, lenlat=160.0)
    assert float(jnp.min(d.interior(fl.sensible))) > 0.0


def test_file_driven_sponge_wiring():
    """SPONGE=True loads Idamp + reference T/S from NetCDF and the
    model step restores toward them (tc4 configuration)."""
    import os
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    if not os.path.isdir("cases/tc4"):
        pytest.skip("no tc4")
    pf = ParamFile(text=open("cases/tc4/MOM_input").read()
                   + '\n#override INPUTDIR = "cases/tc4"\n')
    m = build_model(pf)
    sd = m.ocean_cfg.sponge_data
    assert sd is not None
    nkjh = m.state.T.shape
    assert sd["T"].shape == nkjh and sd["S"].shape == nkjh
    assert sd["idamp"].shape == nkjh[1:]
    assert float(jnp.max(sd["idamp"])) > 0.0
    # perturb T and take one step with and without the sponge (all
    # other physics identical): the sponge run must sit closer to the
    # reference profile in the damped column, and be identical in the
    # undamped interior
    pf2 = ParamFile(text=open("cases/tc4/MOM_input").read()
                    + '\n#override INPUTDIR = "cases/tc4"\n'
                    '#override SPONGE = False\n')
    m2 = build_model(pf2)
    H, ni = m.domain.halo, m.domain.ni
    st = m.state.replace(T=m.domain.fill_halos(m.state.T + 2.0))
    s_on, _, _ = m.step_fn()(st, m.split_state, m.tracers, 0)
    s_off, _, _ = m2.step_fn()(st, m2.split_state, m2.tracers, 0)
    dev_on = np.abs(np.asarray(s_on.T - sd["T"]))
    dev_off = np.abs(np.asarray(s_off.T - sd["T"]))
    je = slice(H, H + m.domain.nj)
    assert dev_on[:, je, H + ni - 1].max() \
        < dev_off[:, je, H + ni - 1].max() - 1e-4
    np.testing.assert_allclose(dev_on[:, je, H + 2],
                               dev_off[:, je, H + 2], atol=1e-9)
