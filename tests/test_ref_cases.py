"""Verbatim-reference-config regression harness.

``cases/ref_tc0–ref_tc3`` are byte-for-byte copies of the reference's
`.testing/tc0–tc3` MOM_input/MOM_override configuration files
(/root/reference/.testing).  Every parameter they set is either
implemented or explicitly registered as inert (model._PARITY_INERT);
the build must not raise, the runs must be stable, and the ocean.stats
quantities (energy / mass / salt / heat / CFL) are pinned as goldens
in ``goldens_ref_cases.json``.

The goldens are this model's own outputs (re-baselined when physics
legitimately changes), standing in for the reference's
ocean.stats since bitwise Fortran parity is out of scope — the delta
vs the reference formulas is documented in docs/STATUS.md.  tc4's
input files (supergrid/topog/z-space T-S/sponge) are generated on
demand by ``cases/ref_tc4/gen_data.py`` with the reference
generators' formulas.
"""

import json
import os
import runpy

import numpy as np
import pytest
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model
from mom6_tpu.diagnostics.sum_output import stat_sums, collect_stats

CASES = os.path.join(os.path.dirname(__file__), "..", "cases")
GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "goldens_ref_cases.json")))


def _ensure_tc4_data():
    case = os.path.join(CASES, "ref_tc4")
    if not os.path.exists(os.path.join(case, "ocean_hgrid.nc")):
        mod = runpy.run_path(os.path.join(case, "gen_data.py"))
        mod["gen"](case)
    return case


def _run(case, nsteps):
    cwd = os.getcwd()
    if case == "ref_tc4":
        # tc4 reads its input files from INPUTDIR="." (the reference
        # runs in-place in the case directory)
        os.chdir(_ensure_tc4_data())
    try:
        pf = ParamFile(os.path.join(CASES, case, "MOM_input"),
                       os.path.join(CASES, case, "MOM_override"))
        m = build_model(pf)
    finally:
        os.chdir(cwd)
    # every parameter in the verbatim file must be known (implemented
    # or registered inert) — a typo'd/unknown param is a fatal audit,
    # matching MOM_file_parser.F90:260.  Driver-owned parameters
    # (ENERGYSAVEDAYS, MAXCPU, U_TRUNC_FILE, ...) are marked used by
    # performing the solo driver's own reads, so this audit can never
    # drift from the driver again.  INPUTDIR is consumed by the case
    # bootstrap (MOM_get_input.F90 analog) before build_model.
    from mom6_tpu.drivers.solo import read_driver_params
    read_driver_params(pf, m)
    unused = set(pf.close(fatal_unused=False))
    assert unused <= {"INPUTDIR"}, unused
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(nsteps):
        s, a, tr = step(s, a, tr, n=k)
    st = collect_stats(stat_sums(m.domain, m.grid, m.vgrid, s, m.dt),
                       m.vgrid, nsteps, 0.0)
    return m, s, st


@pytest.mark.parametrize("case", ["ref_tc0", "ref_tc1", "ref_tc2",
                                  "ref_tc3", "ref_tc4"])
def test_ref_case_matches_goldens(case):
    g = GOLDENS[case]
    m, s, st = _run(case, g["nsteps"])
    assert np.all(np.isfinite(np.asarray(m.domain.interior(s.h))))
    np.testing.assert_allclose(st.energy_per_mass,
                               g["energy_per_mass"], rtol=1e-9)
    np.testing.assert_allclose(st.total_mass, g["mass"], rtol=1e-11)
    np.testing.assert_allclose(st.mean_salin, g["salt"], atol=1e-9)
    np.testing.assert_allclose(st.mean_temp, g["temp"], rtol=1e-9)
    np.testing.assert_allclose(st.max_cfl, g["max_cfl"],
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(st.mean_sea_level, g["sea_level"],
                               rtol=1e-6, atol=1e-12)


def test_ref_tc1_features_active():
    """tc1 must actually exercise the layered benchmark machinery:
    mercator grid, ts_range coordinate, benchmark topography/TS,
    bulk mixed layer, frazil, gyres wind and restoring buoyancy."""
    pf = ParamFile(os.path.join(CASES, "ref_tc1", "MOM_input"),
                   os.path.join(CASES, "ref_tc1", "MOM_override"))
    m = build_model(pf)
    rlay = np.asarray(m.vgrid.Rlay)
    assert np.all(np.diff(rlay[2:]) > 0)          # stratified targets
    assert m.ocean_cfg.diabatic.use_bml           # BML default on
    assert m.ocean_cfg.diabatic.do_frazil
    assert m.ocean_cfg.use_mle
    assert m.fluxes_fn is not None                # linear restoring
    assert m.forces.taux is not None
    assert float(jnp.max(jnp.abs(m.forces.taux))) > 0.01
    # isotropic mercator grid: dy ∝ cos(lat), largest at the equator
    # (the domain's northern edge; mid-domain sits near 20°S)
    dy = np.asarray(m.domain.interior(m.grid.dyT))
    assert dy[-1, 0] > 1.03 * dy[dy.shape[0] // 2, 0]


def test_ref_tc2_features_active():
    pf = ParamFile(os.path.join(CASES, "ref_tc2", "MOM_input"),
                   os.path.join(CASES, "ref_tc2", "MOM_override"))
    m = build_model(pf)
    assert m.ocean_cfg.ale is not None            # Z* regridding
    assert m.ocean_cfg.diabatic.use_epbl
    assert m.ocean_cfg.diabatic.use_geothermal
    assert m.ocean_cfg.use_meke
    assert m.ocean_cfg.meke_khth_fac == 0.5
    assert m.ocean_cfg.use_neutral
    assert m.ocean_cfg.diabatic.diffusivity.use_kappa_shear
    assert m.split_cfg.vertvisc.channel_drag
    assert m.split_cfg.horvisc.smag_lap_const == 0.06


def test_ref_tc4_features_active():
    """tc4 must exercise the mosaic supergrid reader, Z-space init
    with ALE remapping, and the z-grid (ALE) sponge."""
    case = _ensure_tc4_data()
    cwd = os.getcwd()
    os.chdir(case)
    try:
        pf = ParamFile("MOM_input", "MOM_override")
        m = build_model(pf)
    finally:
        os.chdir(cwd)
    # supergrid metrics: model cells span two 0.01° supergrid
    # segments, dxT ≈ R·Δλ·cos(φ) with Δλ=0.02°
    dxT = float(m.domain.interior(m.grid.dxT)[0, 0])
    expect = 6.378e6 * np.deg2rad(0.02) * np.cos(np.deg2rad(0.01))
    np.testing.assert_allclose(dxT, expect, rtol=1e-5)
    # Z-file init through ALE remapping: the 3-level [1, .5, 0]·cone
    # profile remapped onto 2×50 m layers gives a stratified column
    T = np.asarray(m.domain.interior(m.state.T))
    h = np.asarray(m.domain.interior(m.state.h))
    np.testing.assert_allclose(h, 50.0, atol=1e-9)
    assert T[0].max() > 0.6 and abs(T[1].max()) < 1e-9
    assert np.allclose(np.asarray(m.domain.interior(m.state.S)), 35.0)
    # the sponge keeps its targets on the file z-grid for remapping
    sd = m.ocean_cfg.sponge_data
    assert sd is not None and sd.get("ref_h") is not None
    assert sd["T"].shape[0] == 3 and m.vgrid.nk == 2
    assert m.split_cfg.vertvisc.linear_drag


def test_ref_tc3_features_active():
    pf = ParamFile(os.path.join(CASES, "ref_tc3", "MOM_input"),
                   os.path.join(CASES, "ref_tc3", "MOM_override"))
    m = build_model(pf)
    assert m.obc is not None
    assert m.tracers is not None and "dome_dye1" in m.tracers
    # circle_obcs bump: interior interface displaced in the center
    h = np.asarray(m.domain.interior(m.state.h))
    assert h[0].max() > h[0].min() + 1.0
