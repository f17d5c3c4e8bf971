"""Full-model tests for the round-2 physics wiring.

Verifies that the column/lateral parameterizations are reachable from
MOM_input flags through step_ocean (the reference's diabatic_ALE /
step_MOM_tracer_dyn call chains) and that the forcing plumbing carries
surface buoyancy fluxes into the ocean:

* BUOY_CONFIG fluxes change the heat content by exactly the applied
  flux (applyBoundaryFluxesInOut analog);
* uniform salinity stays uniform under dynamics + GM + MLE + DT_THERM
  transport accumulation (hprev-consistency of tracer advection);
* USE_MEKE grows eddy energy from the GM release in a front;
* mixed_layer_restrat reduces the surface density gradient without
  changing column mass;
* kappa-shear / tidal contributions assemble into set_diffusivity;
* ePBL runs from ENERGETICS_SFC_PBL = True.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

_CP = 3991.86795711963

BASE = """
NIGLOBAL = 16
NJGLOBAL = 16
NK = 4
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 160.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 8.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
"""


def _model(extra=""):
    return build_model(ParamFile(text=BASE + extra))


def _run(m, n):
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(n):
        s, a, tr = step(s, a, tr, n=k)
    return s, a, tr


def _heat_content(m, s):
    d = m.domain
    a = d.interior(m.grid.areaT)
    rho0 = m.vgrid.Rho0
    return float(jnp.sum(d.interior(s.T * s.h) * a) * rho0 * _CP)


def test_const_heat_flux_warms_by_exact_amount():
    m = _model("BUOY_CONFIG = const_heat\n"
               "SENSIBLE_HEAT_FLUX = 200.0\n")
    assert m.fluxes_fn is not None
    h0 = _heat_content(m, m.state)
    n = 4
    s, _, _ = _run(m, n)
    h1 = _heat_content(m, s)
    area = float(jnp.sum(m.domain.interior(
        m.grid.areaT * m.grid.mask2dT)))
    expected = 200.0 * area * n * m.dt
    assert abs((h1 - h0) - expected) / expected < 1e-9


def test_restoring_pulls_sst_toward_target():
    m = _model("BUOY_CONFIG = linear_restoring\n"
               "RESTOREBUOY = True\n"
               "FLUXCONST = 10.0\n"
               "SST_NORTH = 20.0\nSST_SOUTH = 20.0\n"
               "#override T_RANGE = 0.0\nT_REF = 10.0\n")
    s, _, _ = _run(m, 4)
    d = m.domain
    sst = float(jnp.mean(d.interior(s.T[0])))
    assert sst > 10.0 + 1e-4          # warmed toward the 20 °C target
    assert sst < 20.0


def test_uniform_salinity_survives_gm_mle_dt_therm():
    # fronts drive GM + MLE mass transports while DT_THERM accumulates
    # them over 3 dynamics steps; a uniform tracer must stay uniform
    # through the reconstruction-consistent advection
    m = _model("DT_THERM = 1800.0\n"
               "KHTH = 300.0\n"
               "MIXEDLAYER_RESTRAT = True\n"
               "ADIABATIC = True\n"
               "WIND_CONFIG = gyres\n")
    s, _, _ = _run(m, 6)
    d = m.domain
    S_int = np.asarray(d.interior(s.S))
    np.testing.assert_allclose(S_int, 35.0, rtol=0, atol=1e-11)
    assert np.all(np.isfinite(np.asarray(d.interior(s.h))))


def test_meke_grows_from_gm_release():
    # bowl topography gives sloping interfaces at the rim, so KHTH
    # releases potential energy that must source the MEKE budget
    m = _model("KHTH = 500.0\nUSE_MEKE = True\n"
               "MEKE_GMCOEFF = 1.0\nMEKE_INIT = 1.0e-8\n"
               "ADIABATIC = True\n"
               "#override TOPO_CONFIG = bowl\n"
               "MINIMUM_DEPTH = 100.0\n")
    assert m.state.meke is not None
    s, _, _ = _run(m, 5)
    e = float(jnp.max(m.domain.interior(s.meke)))
    assert np.isfinite(e)
    assert e > 1.0e-8                 # grew above its seed


def test_mle_restrat_module_conserves_and_restratifies():
    from mom6_tpu.param.lateral.mixed_layer_restrat import (
        MLRestratCfg, mixed_layer_restrat)
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.eos import make_eos
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4)
    vg = VerticalGrid.uniform(nk=4)
    eos = make_eos("LINEAR")
    h = d.fill_halos(d.pad(jnp.full((4, 16, 16), 50.0)))
    # meridional surface temperature front within the "mixed layer"
    y = jnp.linspace(0.0, 1.0, 16).reshape(-1, 1)
    T = d.fill_halos(d.pad(jnp.broadcast_to(
        10.0 + 4.0 * y, (4, 16, 16))))
    S = jnp.full_like(T, 35.0)
    cfg = MLRestratCfg(fox_kemper_ml_restrat_coef=50.0)
    res = mixed_layer_restrat(cfg, g, vg, h, 600.0, T=T, S=S, eos=eos,
                              hml=jnp.full_like(h[0], 100.0))
    col0 = np.asarray(d.interior(jnp.sum(h, axis=0)))
    col1 = np.asarray(d.interior(jnp.sum(res.h, axis=0)))
    np.testing.assert_allclose(col1, col0, rtol=1e-12)
    # streamfunction form: per-column transport sums vanish
    np.testing.assert_allclose(
        np.asarray(jnp.sum(res.uhml, axis=0)), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(res.vhml, axis=0)), 0.0, atol=1e-6)
    assert float(jnp.max(jnp.abs(res.vhml))) > 0.0


def test_kappa_shear_and_tidal_assemble():
    from mom6_tpu.param.vertical.set_diffusivity import (
        DiffusivityCfg, set_diffusivity)
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.eos import make_eos
    vg = VerticalGrid.uniform(nk=8)
    eos = make_eos("LINEAR")
    h = jnp.full((8, 4, 4), 200.0)
    z = (jnp.cumsum(h, axis=0) - 0.5 * h)
    # nearly unstratified (Ri < RINO_CRIT) with strong shear so the
    # JHL kappa-shear balance is supercritical
    T = 15.0 - 0.01 * z / 1600.0
    S = jnp.full_like(T, 35.0)
    u = 2.0 * (1.0 - z / 1600.0) * jnp.ones_like(h)
    v = jnp.zeros_like(h)
    base = dict(kd=1e-6)
    r0 = set_diffusivity(h, DiffusivityCfg(**base), vgrid=vg,
                         u=u, v=v, T=T, S=S, eos=eos)
    r1 = set_diffusivity(h, DiffusivityCfg(use_kappa_shear=True,
                                           **base), vgrid=vg,
                         u=u, v=v, T=T, S=S, eos=eos)
    r2 = set_diffusivity(h, DiffusivityCfg(use_tidal=True,
                                           tidal_energy_flux=0.01,
                                           **base), vgrid=vg,
                         u=u, v=v, T=T, S=S, eos=eos)
    assert float(jnp.max(r1.kd_int - r0.kd_int)) > 0.0
    dk = np.asarray((r2.kd_int - r0.kd_int)[1:-1, 2, 2])
    assert dk.max() > 0.0
    # bottom-intensified: deepest interior interface gets the most
    assert dk[-1] == pytest.approx(dk.max())
    assert np.all(np.asarray(r1.kd_int) >= 0.0)


def test_epbl_runs_from_flag():
    m = _model("ENERGETICS_SFC_PBL = True\n"
               "WIND_CONFIG = gyres\nKD = 1e-5\n"
               "BUOY_CONFIG = const_heat\n"
               "SENSIBLE_HEAT_FLUX = -200.0\n")
    assert m.ocean_cfg.diabatic.use_epbl
    s, _, _ = _run(m, 3)
    assert np.all(np.isfinite(np.asarray(m.domain.interior(s.T))))


def test_geothermal_heats_bottom_layer_in_model():
    m = _model("GEOTHERMAL_FLUX = 0.5\n#override T_RANGE = 0.0\n")
    h0 = _heat_content(m, m.state)
    n = 3
    s, _, _ = _run(m, n)
    h1 = _heat_content(m, s)
    area = float(jnp.sum(m.domain.interior(
        m.grid.areaT * m.grid.mask2dT)))
    expected = 0.5 * area * n * m.dt
    # heat-content totals are ~1e21 J; differencing leaves ~1e7 J of
    # float64 cancellation noise against the ~1e13 J expected signal
    assert abs((h1 - h0) - expected) / expected < 1e-5
    # heating enters at depth, not the surface
    dT = np.asarray(m.domain.interior(s.T - m.state.T))
    assert dT[-1].mean() > 10.0 * abs(dT[0].mean())


def test_khtr_hordiff_wired_and_conservative():
    m = _model("KHTR = 800.0\nADIABATIC = True\n"
               "USE_REGIONAL_DYES = True\n")
    d = m.domain
    # sharp blob so lateral diffusion has a gradient to act on
    blob = np.zeros((m.vgrid.nk, d.njh, d.nih))
    H = d.halo
    blob[:, H + 6:H + 10, H + 6:H + 10] = 1.0
    tr_in = {"dye1": d.fill_halos(jnp.asarray(blob))}
    a = d.interior(m.grid.areaT)
    tot0 = float(jnp.sum(d.interior(tr_in["dye1"] * m.state.h) * a))
    var0 = float(jnp.var(d.interior(tr_in["dye1"])))
    step = m.step_fn()
    s, aa, tr = m.state, m.split_state, tr_in
    for k in range(4):
        s, aa, tr = step(s, aa, tr, n=k)
    tot1 = float(jnp.sum(d.interior(tr["dye1"] * s.h) * a))
    assert abs(tot1 - tot0) / max(abs(tot0), 1e-30) < 1e-9
    assert float(jnp.var(d.interior(tr["dye1"]))) < var0


def test_opacity_profile_sums_to_surface_flux():
    from mom6_tpu.param.vertical.opacity import (OpacityCfg,
                                                 sw_absorption_profile)
    h = jnp.full((6, 3, 3), 20.0)
    sw = jnp.full((3, 3), 300.0)
    heat, bottom = sw_absorption_profile(OpacityCfg(water_type="IB"),
                                         h, sw)
    total = np.asarray(jnp.sum(heat, axis=0) + bottom)
    np.testing.assert_allclose(total, 300.0, rtol=1e-10)
    hn = np.asarray(heat[:, 1, 1])
    assert np.all(hn[:-1] >= hn[1:] - 1e-12)   # monotone decay


def test_apply_boundary_fluxes_mass_and_salt():
    from mom6_tpu.param.vertical.diabatic_aux import \
        apply_boundary_fluxes
    from mom6_tpu.core.forcing import Fluxes
    h = jnp.full((3, 2, 2), 10.0)
    T = jnp.full((3, 2, 2), 10.0)
    S = jnp.full((3, 2, 2), 35.0)
    rho0 = 1035.0
    # evaporation removes freshwater: h shrinks, salt content constant
    fl = Fluxes(evap=jnp.full((2, 2), 1.0e-3))
    bf = apply_boundary_fluxes(h, T, S, fl, dt=3600.0, rho0=rho0)
    dh = 1.0e-3 * 3600.0 / rho0
    np.testing.assert_allclose(np.asarray(bf.h[0]), 10.0 - dh,
                               rtol=1e-12)
    salt0 = 35.0 * 10.0
    salt1 = float(bf.S[0, 0, 0]) * float(bf.h[0, 0, 0])
    np.testing.assert_allclose(salt1, salt0, rtol=1e-12)
    # heating warms only the top layer by Q dt/(rho cp h)
    fl2 = Fluxes(sensible=jnp.full((2, 2), 100.0))
    bf2 = apply_boundary_fluxes(h, T, S, fl2, dt=3600.0, rho0=rho0)
    np.testing.assert_allclose(
        np.asarray(bf2.T[0]),
        10.0 + 100.0 * 3600.0 / (rho0 * _CP * 10.0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bf2.T[1:]), 10.0)


def test_diabatic_first_ordering():
    """DIABATIC_FIRST (MOM.F90:1042) runs the column physics + ALE on
    the pre-dynamics state: the run stays conservative and finite but
    the phase ordering genuinely changes the trajectory."""
    extra = ("BUOY_CONFIG = const_heat\n"
             "SENSIBLE_HEAT_FLUX = 2000.0\n"
             "WIND_CONFIG = gyres\n"
             "USE_REGRIDDING = True\n"
             "REGRIDDING_COORDINATE_MODE = Z*\n"
             "KD = 1.0e-5\n")
    m1 = _model(extra)
    m2 = _model(extra + "DIABATIC_FIRST = True\n")
    assert m2.ocean_cfg.diabatic_first
    n = 4
    s1, _, _ = _run(m1, n)
    s2, _, _ = _run(m2, n)
    d = m1.domain
    area = d.interior(m1.grid.areaT)
    for m, s in ((m1, s1), (m2, s2)):
        mass = float(jnp.sum(d.interior(s.h).sum(0) * area))
        mass0 = float(jnp.sum(d.interior(m.state.h).sum(0) * area))
        assert abs(mass - mass0) / mass0 < 1e-12
        assert np.all(np.isfinite(np.asarray(d.interior(s.T))))
    # the heat input is identical either way (same fluxes, same count)
    h1 = _heat_content(m1, s1)
    h2 = _heat_content(m2, s2)
    np.testing.assert_allclose(h1, h2, rtol=1e-9)
    # but the ordering changes the trajectory (the pre-dynamics PGF
    # sees the heated state under DIABATIC_FIRST); the coupling is
    # weak over 4 steps, so assert bitwise divergence
    assert not np.array_equal(np.asarray(d.interior(s1.T)),
                              np.asarray(d.interior(s2.T)))
    assert not np.array_equal(np.asarray(d.interior(s1.u)),
                              np.asarray(d.interior(s2.u)))


def test_horizontal_boundary_diffusion():
    """USE_HORIZONTAL_BOUNDARY_DIFFUSION diffuses tracers laterally
    only within the KPP boundary layer (MOM_hor_bnd_diffusion.F90):
    a surface dye gradient smooths while the deep layers are
    untouched by the HBD pass."""
    extra = ("USE_KPP = True\nKD = 1.0e-5\n"
             "BUOY_CONFIG = const_heat\nSENSIBLE_HEAT_FLUX = -200.0\n"
             "USE_REGIONAL_DYES = True\n"
             "DYE_SOURCE_MAXLON = 80.0\n"
             "USE_HORIZONTAL_BOUNDARY_DIFFUSION = True\n"
             "HBD_KHTR = 2000.0\n")
    m = _model(extra)
    assert m.ocean_cfg.use_hbd and m.ocean_cfg.hbd.khtr_bnd == 2000.0
    m0 = _model(extra.replace(
        "USE_HORIZONTAL_BOUNDARY_DIFFUSION = True",
        "USE_HORIZONTAL_BOUNDARY_DIFFUSION = False"))
    n = 6
    s1, _, tr1 = _run(m, n)
    s0, _, tr0 = _run(m0, n)
    d = m.domain
    # conservation of the dye through the HBD pass
    a = d.interior(m.grid.areaT)
    inv1 = float(jnp.sum(d.interior(tr1["dye1"] * s1.h).sum(0) * a))
    inv0 = float(jnp.sum(d.interior(tr0["dye1"] * s0.h).sum(0) * a))
    np.testing.assert_allclose(inv1, inv0, rtol=1e-10)
    # the surface dye front is smoother with HBD on: smaller max
    # lateral gradient along the front
    g1 = np.abs(np.diff(np.asarray(d.interior(tr1["dye1"][0])),
                        axis=-1)).max()
    g0 = np.abs(np.diff(np.asarray(d.interior(tr0["dye1"][0])),
                        axis=-1)).max()
    assert g1 < g0


def test_meke_geometric_and_visbeck_from_config():
    """MEKE_GEOMETRIC + KHTH_SLOPE_CFF wire from MOM_input through
    the step_ocean coefficient chain."""
    m = _model("KHTH = 100.0\nUSE_MEKE = True\n"
               "MEKE_GEOMETRIC = True\nMEKE_GEOMETRIC_ALPHA = 0.07\n"
               "MEKE_KHTH_FAC = 1.0\nMEKE_GMCOEFF = 1.0\n"
               "MEKE_ALPHA_EADY = 1.0\nMEKE_ALPHA_GRID = 1.0\n"
               "MEKE_ADVECTION_FACTOR = 1.0\n"
               "USE_VARIABLE_MIXING = True\nKHTH_SLOPE_CFF = 0.05\n"
               "MEKE_INIT = 1.0e-6\nADIABATIC = True\n"
               "#override TOPO_CONFIG = bowl\n"
               "MINIMUM_DEPTH = 100.0\n")
    assert m.ocean_cfg.meke.geometric
    assert m.ocean_cfg.varmix.khth_slope_cff == 0.05
    s, a, tr = _run(m, 4)
    d = m.domain
    e = np.asarray(d.interior(s.meke))
    assert np.all(np.isfinite(e)) and np.all(e >= 0.0)
    assert np.all(np.isfinite(np.asarray(d.interior(s.h))))


def test_meke_bgsrc_grows_energy():
    """MEKE_BGSRC: the constant background source grows E with no
    other forcing (MOM_MEKE.F90:1225)."""
    base = "USE_MEKE = True\nMEKE_INIT = 1.0e-8\nADIABATIC = True\n"
    m1 = _model(base + "MEKE_BGSRC = 1.0e-9\n")
    s1, _, _ = _run(m1, 4)
    m0 = _model(base)
    s0, _, _ = _run(m0, 4)
    e1 = float(jnp.mean(m1.domain.interior(s1.meke)))
    e0 = float(jnp.mean(m0.domain.interior(s0.meke)))
    assert e1 > e0
    # ~ bgsrc·t gain (drag is negligible at these tiny E)
    assert e1 - e0 > 0.5 * 1.0e-9 * 4 * 600.0


def test_meke_viscosity_ku_damps_flow():
    """MEKE_VISCOSITY_COEFF_KU: the MEKE-derived Laplacian viscosity
    (Ku = c·sqrt(2E)·Lmix added to Kh, MOM_hor_visc.F90:1145) damps
    kinetic energy relative to an identical run without it."""
    base = ("USE_MEKE = True\nMEKE_INIT = 0.05\nADIABATIC = True\n"
            "LAPLACIAN = True\nKH = 0.0\n"
            "WIND_CONFIG = gyres\nTAUX_MAGNITUDE = 0.1\n")
    mk = _model(base + "MEKE_VISCOSITY_COEFF_KU = 1.0\n")
    sk, _, _ = _run(mk, 6)
    m0 = _model(base)
    s0, _, _ = _run(m0, 6)

    def ke(m, s):
        d = m.domain
        return float(jnp.sum(d.interior(s.h * (s.u ** 2 + s.v ** 2))))

    assert ke(mk, sk) < ke(m0, s0)
    # FATAL without LAPLACIAN, like MOM_MEKE.F90:1375
    from mom6_tpu.framework.error_handler import FatalError
    with pytest.raises(FatalError):
        _model("USE_MEKE = True\nMEKE_VISCOSITY_COEFF_KU = 1.0\n")


def test_meke_khtr_fac_spreads_tracers():
    """MEKE_KHTR_FAC: KhTr gains a fraction of the MEKE diffusivity
    (MOM_tracer_hor_diff.F90:241) — T variance decays faster."""
    # horizontal T structure (the BASE linear profile varies only
    # with depth, so lateral diffusion would be a no-op)
    base = ("USE_MEKE = True\nMEKE_INIT = 0.05\n"
            "#override TS_CONFIG = baroclinic_zone\n"
            "BCZIC%DELTA_T = 2.0\nKHTR = 0.0\n")
    mf = _model(base + "MEKE_KHTR_FAC = 1.0\n")
    sf, _, _ = _run(mf, 4)
    m0 = _model(base)
    s0, _, _ = _run(m0, 4)

    def t_var(m, s):
        d = m.domain
        t = d.interior(s.T)
        return float(jnp.var(t))

    assert t_var(mf, sf) < t_var(m0, s0)


def test_meke_khmeke_fac_diffuses_energy():
    """MEKE_KHMEKE_FAC: lateral diffusion of E itself spreads a
    localized eddy-energy blob (MOM_MEKE.F90 KhMEKE_Fac)."""
    import numpy as np
    from mom6_tpu.param.lateral.meke import MEKECfg, step_meke
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True,
               reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       max_depth=1000.0)
    e0 = np.zeros((16, 16))
    e0[8, 8] = 1.0
    e = d.fill_halos(d.pad(jnp.asarray(e0)))
    cfg_on = MEKECfg(khmeke_fac=1.0, cdrag=0.0, l_fixed=3.0e4)
    cfg_off = MEKECfg(khmeke_fac=0.0, cdrag=0.0, l_fixed=3.0e4)
    e_on = e_off = e
    for _ in range(3):
        e_on = d.fill_halos(step_meke(cfg_on, g, e_on, dt=3600.0))
        e_off = d.fill_halos(step_meke(cfg_off, g, e_off, dt=3600.0))
    peak_on = float(jnp.max(d.interior(e_on)))
    peak_off = float(jnp.max(d.interior(e_off)))
    assert peak_on < peak_off
