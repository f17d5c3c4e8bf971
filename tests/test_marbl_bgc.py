"""MARBL-shaped BGC coupling tests.

Covers the coupling channels of the NCAR fork's headline subsystem
(/root/reference/src/tracer/MARBL_tracers.F90 +
MARBL_forcing_mod.F90): per-tracer gas exchange, river fluxes from a
time-varying file, dust→Fe deposition, iron sediment bottom flux,
restoring toward a z-grid climatology, interior tendencies, and the
registry-driven interface shared by NPZD and the CFCs — driven both
from the solo step and from the coupled cap.
"""

import os

import numpy as np
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.framework.io import write_fields
from mom6_tpu.model import build_model

NI, NJ, NK = 12, 10, 4

BASE = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 4
DT = 1800.0
DT_FORCING = 1800.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 400.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 4.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
"""


def _run(extra, n=4, **kw):
    m = build_model(ParamFile(text=BASE + extra))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(n):
        s, a, tr = step(s, a, tr, n=k)
    return m, s, tr


def test_marbl_base_bio_runs_and_stays_positive():
    m, s, tr = _run("USE_MARBL_TRACERS = True\n", n=4)
    assert m.ocean_cfg.bgc is not None
    for name in ("no3", "po4", "sio3", "fe", "dic", "alk", "o2",
                 "doc", "poc"):
        assert name in tr, name
        arr = np.asarray(tr[name])
        assert np.all(np.isfinite(arr)), name
        assert np.all(arr >= 0.0), name


def test_o2_gas_exchange_restores_saturation():
    """Surface O2 far below saturation is pushed up by the air-sea
    flux; deep O2 (no gas exchange) moves only via interior terms."""
    m, s, tr = _run("USE_MARBL_TRACERS = True\n", n=0)
    cp = m.ocean_cfg.bgc
    t0 = dict(tr)
    t0["o2"] = jnp.zeros_like(t0["o2"]) + 1.0      # strongly undersat.
    out = cp.column_physics(t0, s.h, s.T, s.S, dt=86400.0, t=0.0)
    d = m.domain
    surf_gain = np.asarray(d.interior(out["o2"][0] - t0["o2"][0]))
    assert np.all(surf_gain > 0.0)
    # Garcia–Gordon saturation at the local T/S bounds the push
    from mom6_tpu.tracer.marbl_driver import _o2_solubility
    csat = np.asarray(_o2_solubility(s.T[0], s.S[0])) * 0.20946 * 1e3
    o2s = np.asarray(d.interior(out["o2"][0]))
    assert np.all(o2s <= np.asarray(d.interior(jnp.asarray(csat)))
                  + 1e-6)


def test_river_flux_file_feeds_surface_no3(tmp_path):
    """READ_RIV_FLUXES: a time-varying river flux file adds nitrate to
    the surface layer (MARBL_tracers.F90:641-677,275-281)."""
    rp = tmp_path / "riv.nc"
    t = np.array([0.0, 10.0])                       # days
    flux = np.stack([np.full((NJ, NI), 1e-6),
                     np.full((NJ, NI), 3e-6)])      # mmol m-2 s-1
    write_fields(str(rp), {"time": t, "no3_riv_flux": flux},
                 dims={"time": ("time",),
                       "no3_riv_flux": ("time", "yh", "xh")},
                 attrs={"time": {"units": "days since 0001-01-01"}})
    extra = ("USE_MARBL_TRACERS = True\nREAD_RIV_FLUXES = True\n"
             f"RIV_FLUX_FILE = {rp}\n")
    m, s, tr0 = _run(extra, n=0)
    cp = m.ocean_cfg.bgc
    d = m.domain
    # isolate the river contribution against a no-river run (interior
    # tendencies move no3 too)
    out_nr = cp.column_physics(dict(tr0), s.h, s.T, s.S, dt=3600.0,
                               t=0.0)
    base = cp.forcing_sources.sources.pop("riv_no3")
    out_base = cp.column_physics(dict(tr0), s.h, s.T, s.S, dt=3600.0,
                                 t=0.0)
    cp.forcing_sources.sources["riv_no3"] = base
    d_riv = np.asarray(d.interior(out_nr["no3"][0]
                                  - out_base["no3"][0]))
    h0 = float(np.asarray(d.interior(s.h[0])).mean())
    assert np.allclose(d_riv, 3600.0 * 1e-6 / h0, rtol=1e-2)
    # time interpolation: flux at day 5 is 2e-6
    out5 = cp.column_physics(dict(tr0), s.h, s.T, s.S, dt=3600.0,
                             t=5.0 * 86400.0)
    d5 = np.asarray(d.interior(out5["no3"][0] - out_base["no3"][0]))
    assert np.allclose(d5, 3600.0 * 2e-6 / h0, rtol=1e-2)


def test_restoring_pulls_toward_climatology(tmp_path):
    """MARBL_TRACER_RESTORING_SOURCE=file: nitrate relaxes toward the
    z-grid climatology at the file's inverse timescale."""
    rp = tmp_path / "restore.nc"
    nzf = 3
    z_edges = np.array([0.0, 100.0, 250.0, 400.0])
    clim = np.full((nzf, NJ, NI), 30.0)
    itau = np.full((nzf, NJ, NI), 1.0 / 86400.0)
    write_fields(str(rp), {"z_edges": z_edges, "no3": clim,
                           "I_TAU": itau},
                 dims={"z_edges": ("zi",), "no3": ("zl", "yh", "xh"),
                       "I_TAU": ("zl", "yh", "xh")})
    extra = ("USE_MARBL_TRACERS = True\n"
             "MARBL_TRACER_RESTORING_SOURCE = file\n"
             f"MARBL_TRACER_RESTORING_FILE = {rp}\n")
    m, s, tr0 = _run(extra, n=0)
    cp = m.ocean_cfg.bgc
    assert cp.restoring is not None and "no3" in cp.restoring.clim
    t0 = dict(tr0)
    t0["no3"] = jnp.zeros_like(t0["no3"]) + 10.0
    out = cp.column_physics(t0, s.h, s.T, s.S, dt=43200.0, t=0.0)
    d = m.domain
    # relaxation toward 30 from 10: positive gain, bounded by the
    # half-day/1-day timescale fraction of the gap plus interior terms
    gain = np.asarray(d.interior(out["no3"] - t0["no3"]))
    assert np.all(gain > 0.0)
    assert np.all(gain < 20.0)


def test_fesedflux_bottom_source(tmp_path):
    """Iron sediment flux enters the bottom layer (bot_flux_to_tend,
    MARBL_tracers.F90:301-328)."""
    fp = tmp_path / "fesed.nc"
    write_fields(str(fp), {"FESEDFLUX": np.full((NJ, NI), 1e-8)},
                 dims={"FESEDFLUX": ("yh", "xh")})
    extra = ("USE_MARBL_TRACERS = True\n"
             f"MARBL_FESEDFLUX_FILE = {fp}\n"
             "BOT_FLUX_MIX_THICKNESS = 50.0\n")
    m, s, tr0 = _run(extra, n=0)
    cp = m.ocean_cfg.bgc
    src = dict(cp.forcing_sources.sources)
    out = cp.column_physics(dict(tr0), s.h, s.T, s.S, dt=3600.0,
                            t=0.0)
    cp.forcing_sources.sources.pop("fesedflux")
    out0 = cp.column_physics(dict(tr0), s.h, s.T, s.S, dt=3600.0,
                             t=0.0)
    cp.forcing_sources.sources.update(src)
    d = m.domain
    dfe = np.asarray(d.interior(out["fe"] - out0["fe"]))
    # only the bottom layer(s) within 50 m of the bed gain iron
    assert np.all(dfe[-1] > 0.0)
    assert np.allclose(dfe[:-1], 0.0, atol=1e-14)


def test_cfc_coupled_path_matches_standalone():
    """With USE_MARBL_TRACERS the CFCs ride the coupler's gas-exchange
    machinery; the flux formula must match the standalone OCMIP2
    column function."""
    m, s, tr = _run("USE_MARBL_TRACERS = True\nUSE_OCMIP2_CFC = True\n",
                    n=0)
    assert "cfc11" in tr and "cfc12" in tr
    cp = m.ocean_cfg.bgc
    out = cp.column_physics(dict(tr), s.h, s.T, s.S, dt=3600.0, t=0.0)
    from mom6_tpu.tracer.cfc import CFCCfg, cfc_surface_flux
    F = cfc_surface_flux(CFCCfg(gas="CFC11"), tr["cfc11"][0],
                         s.T[0], s.S[0], 8.0, 270.0e-12)
    expect = tr["cfc11"][0] + 3600.0 * F / jnp.maximum(s.h[0], 1e-20)
    d = m.domain
    assert np.allclose(np.asarray(d.interior(out["cfc11"][0])),
                       np.asarray(d.interior(jnp.maximum(expect, 0.0))),
                       rtol=1e-6)


def test_npzd_through_coupler_and_coupled_cap():
    """NPZD rides the same coupler; the coupled cap (IOB) drives the
    BGC step, with the IOB salt flux reaching the virtual-flux hook."""
    from mom6_tpu.drivers.ocean_model import (IceOceanBoundary,
                                              update_ocean_model)
    m = build_model(ParamFile(text=BASE + "USE_NPZD = True\n"))
    assert m.ocean_cfg.bgc is not None
    shp = m.grid.mask2dT.shape
    iob = IceOceanBoundary(
        u_flux=jnp.full(shp, 0.05) * m.grid.mask2dCu,
        sw_flux=jnp.full(shp, 100.0) * m.grid.mask2dT,
        salt_flux=jnp.zeros(shp))
    s, a, tr, sfc = update_ocean_model(
        m, iob, m.state, m.split_state, m.tracers,
        dt_coupling=2 * m.dt)
    for name in ("no3", "phyto", "zoo", "det"):
        arr = np.asarray(tr[name])
        assert np.all(np.isfinite(arr)) and np.all(arr >= 0.0), name


def test_bgc_tracers_are_advected():
    """Coupler-registered tracers participate in the registry-driven
    advection like any other tracer (register_tracer parity)."""
    m, s, tr = _run("USE_MARBL_TRACERS = True\n"
                    "WIND_CONFIG = gyres\nTAUX_MAGNITUDE = 0.1\n",
                    n=4)
    assert m.tracer_registry is not None
    assert "no3" in m.tracer_registry.names(advected_only=True)
    no3 = np.asarray(m.domain.interior(tr["no3"][0]))
    # the gyre stirs an (initially uniform) field only through the
    # interior source terms; fields must stay finite and non-uniform
    # after biology acts on the light gradient
    assert np.isfinite(no3).all()


def test_coupler_gas_fields_override_registry():
    """Coupled gas-flux ingestion (MOM_couplertype_infra.F90 tables):
    atmospheric partial pressures and winds supplied on the IOB take
    precedence over the BGC package's own constants — a doubled
    coupler pCFC-11 must roughly double the initial uptake, and a
    zero coupler wind must shut the exchange off."""
    from mom6_tpu.drivers.ocean_model import (IceOceanBoundary,
                                              update_ocean_model)

    def uptake(gas_fields):
        m = build_model(ParamFile(
            text=BASE + "USE_MARBL_TRACERS = True\n"
            "USE_OCMIP2_CFC = True\n"))
        shp = m.grid.mask2dT.shape
        iob = IceOceanBoundary(
            u_flux=jnp.zeros(shp),
            gas_fields=gas_fields)
        s, a, tr, _ = update_ocean_model(
            m, iob, m.state, m.split_state, m.tracers,
            dt_coupling=2 * m.dt)
        return float(jnp.sum(m.domain.interior(tr["cfc11"][0]))), m

    base_patm = 1.0e-10                         # ~ modern pCFC-11 atm
    m0 = build_model(ParamFile(
        text=BASE + "USE_MARBL_TRACERS = True\n"
        "USE_OCMIP2_CFC = True\n"))
    shp = m0.grid.mask2dT.shape
    one = jnp.ones(shp)
    u1, _ = uptake({"pcfc11_atm": base_patm * one, "u10": 8.0 * one})
    u2, _ = uptake({"pcfc11_atm": 2 * base_patm * one,
                    "u10": 8.0 * one})
    u0, _ = uptake({"pcfc11_atm": base_patm * one, "u10": 0.0 * one})
    assert u1 > 0.0
    assert abs(u2 / u1 - 2.0) < 0.05       # flux ∝ patm (zero initial)
    assert u0 < 1e-3 * u1                  # no wind → no exchange
