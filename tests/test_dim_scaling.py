"""Dimensional-consistency testing by power-of-2 rescaling.

The analog of the reference's unit_scale_type machinery and test.dim.*
(.testing/Makefile:144, src/framework/MOM_unit_scaling.F90): because
multiplication by powers of two is exact in floating point, running
the model with every input rescaled by 2^n in one dimension must give
results that unscale BITWISE to the original run — any hidden
dimensional constant or inconsistent term breaks the equality.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.dynamics_split_rk2 import (
    SplitCfg, init_split_state, step_dyn_split_rk2)
from mom6_tpu.core.barotropic import BarotropicCfg
from mom6_tpu.core.vert_friction import VertViscCfg
from mom6_tpu.param.lateral.hor_visc import HorViscCfg


def run_core(s_t: float, nsteps=4):
    """Layered adiabatic split core with time rescaled by s_t.

    Scalings for [T] → s_t·[T]: dt·s, f/s, g/s², u/s, Kv/s, Kh/s,
    taux/s² (ρ in kg m-3 unscaled)."""
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0,
                       f0=1e-4 / s_t, max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=2, g_Earth=9.8 / s_t ** 2,
                              gint=0.01 / s_t ** 2)
    cfg = SplitCfg(
        vertvisc=VertViscCfg(kv=1e-4 / s_t, cdrag=0.0,
                             bottomdraglaw=False,
                             maxvel=6.0 / s_t),
        horvisc=HorViscCfg(laplacian=True, kh=1000.0 / s_t,
                           dt=600.0 * s_t),
        barotropic=BarotropicCfg(nstep=16))
    rng = np.random.default_rng(0)
    h0 = 500.0 + jnp.asarray(rng.standard_normal((2, 16, 16)))
    u0 = (0.05 / s_t) * jnp.asarray(rng.standard_normal((2, 16, 16)))
    v0 = (0.05 / s_t) * jnp.asarray(rng.standard_normal((2, 16, 16)))
    st = State(u=d.fill_halos(d.pad(u0)), v=d.fill_halos(d.pad(v0)),
               h=d.fill_halos(d.pad(h0)))
    sp = init_split_state(d, g, vg, st)
    taux = (0.1 / s_t ** 2) * g.mask2dCu
    forces = MechForcing(taux=taux)
    for n in range(nsteps):
        st, sp, _ = step_dyn_split_rk2(d, g, vg, st, sp, forces,
                                       600.0 * s_t, cfg,
                                       x_first=(n % 2 == 0))
    return d, st


@pytest.mark.parametrize("s_t", [4.0, 0.25])
def test_time_rescaling_bitwise(s_t):
    d, ref = run_core(1.0)
    d, scaled = run_core(s_t)
    assert np.isfinite(np.asarray(d.interior(ref.u))).all(), \
        "baseline run is not finite -- the invariance check would be vacuous"
    # u scales as 1/s_t; h is unscaled
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.h)), np.asarray(d.interior(ref.h)),
        err_msg="h not invariant under time rescaling")
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.u)) * s_t,
        np.asarray(d.interior(ref.u)),
        err_msg="u does not unscale bitwise under time rescaling")


def run_core_L(s_l: float, nsteps=4):
    """Layered adiabatic split core with horizontal length rescaled by
    s_l ([L] -> s_l [L], [Z]/[H]/[T] fixed — the reference's
    test.dim.l).  Scalings: dx,dy (lenlon/lenlat)·s, u·s, Kh [L2 T-1]
    ·s², g_Earth [L2 Z-1 T-2]·s², taux [L Z T-2]·s, maxvel·s; f [T-1],
    h [H], Kv [Z2 T-1], dt unchanged."""
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0 * s_l, lenlat_km=160.0 * s_l,
                       f0=1e-4, max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=2, g_Earth=9.8 * s_l ** 2,
                              gint=0.01 * s_l ** 2)
    cfg = SplitCfg(
        vertvisc=VertViscCfg(kv=1e-4, cdrag=0.0,
                             bottomdraglaw=False,
                             maxvel=6.0 * s_l),
        horvisc=HorViscCfg(laplacian=True, kh=1000.0 * s_l ** 2,
                           dt=600.0),
        barotropic=BarotropicCfg(nstep=16))
    rng = np.random.default_rng(0)
    h0 = 500.0 + jnp.asarray(rng.standard_normal((2, 16, 16)))
    u0 = (0.05 * s_l) * jnp.asarray(rng.standard_normal((2, 16, 16)))
    v0 = (0.05 * s_l) * jnp.asarray(rng.standard_normal((2, 16, 16)))
    st = State(u=d.fill_halos(d.pad(u0)), v=d.fill_halos(d.pad(v0)),
               h=d.fill_halos(d.pad(h0)))
    sp = init_split_state(d, g, vg, st)
    taux = (0.1 * s_l) * g.mask2dCu
    forces = MechForcing(taux=taux)
    for n in range(nsteps):
        st, sp, _ = step_dyn_split_rk2(d, g, vg, st, sp, forces,
                                       600.0, cfg,
                                       x_first=(n % 2 == 0))
    return d, st


@pytest.mark.parametrize("s_l", [4.0, 0.25])
def test_length_rescaling_bitwise(s_l):
    """Horizontal-length invariance: catches missing dx/dy/area
    metric factors in stencil code (the class of bug the reference's
    test.dim.l exists for, MOM_unit_scaling.F90:23-67)."""
    d, ref = run_core_L(1.0)
    d, scaled = run_core_L(s_l)
    assert np.isfinite(np.asarray(d.interior(ref.u))).all(), \
        "baseline run is not finite -- the invariance check would be vacuous"
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.h)), np.asarray(d.interior(ref.h)),
        err_msg="h not invariant under length rescaling")
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.u)) / s_l,
        np.asarray(d.interior(ref.u)),
        err_msg="u does not unscale bitwise under length rescaling")


def run_core_H(s_h: float, nsteps=4, ale=False):
    """Split core with the vertical (thickness+height, jointly: this
    build keeps h and z in the same meters) rescaled by s_h — the
    reference's test.dim.h/z pair.  Scalings: h·s, depth·s,
    g [L2 Z-1 T-2]/s, Kv [Z2 T-1]·s², taux [L Z T-2]·s; u, f, Kh, dt
    unchanged.  Thickness-dimensioned parameters rescale too
    (ANGSTROM, HBBL, BBL_THICK_MIN, KV_BBL_MIN), exactly as the
    reference's unit_scale applies scale= to every get_param
    (MOM_unit_scaling.F90) — the hunt is for UNPARAMETERIZED hidden
    constants."""
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0,
                       f0=1e-4, max_depth=1000.0 * s_h)
    vg = VerticalGrid.uniform(nk=2, g_Earth=9.8 / s_h,
                              gint=0.01 / s_h,
                              angstrom=1e-10 * s_h)
    cfg = SplitCfg(
        vertvisc=VertViscCfg(kv=1e-4 * s_h ** 2, cdrag=0.0,
                             bottomdraglaw=False,
                             maxvel=6.0, hbbl=10.0 * s_h,
                             bbl_thick_min=0.1 * s_h,
                             kv_bbl_min=1e-4 * s_h ** 2),
        horvisc=HorViscCfg(laplacian=True, kh=1000.0, dt=600.0),
        barotropic=BarotropicCfg(nstep=16))
    rng = np.random.default_rng(0)
    h0 = s_h * (500.0 + jnp.asarray(rng.standard_normal((2, 16, 16))))
    u0 = 0.05 * jnp.asarray(rng.standard_normal((2, 16, 16)))
    v0 = 0.05 * jnp.asarray(rng.standard_normal((2, 16, 16)))
    st = State(u=d.fill_halos(d.pad(u0)), v=d.fill_halos(d.pad(v0)),
               h=d.fill_halos(d.pad(h0)))
    sp = init_split_state(d, g, vg, st)
    taux = (0.1 * s_h) * g.mask2dCu
    forces = MechForcing(taux=taux)
    ale_cfg = None
    if ale:
        from mom6_tpu.ale.ale_main import ALECfg, ale_regrid_remap
        from mom6_tpu.ale.regridding import RegridCfg
        from mom6_tpu.ale.remapping import RemapCfg
        ale_cfg = ALECfg(regrid=RegridCfg(mode="Z*"),
                         remap=RemapCfg(scheme="PPM_H4"),
                         vel_remap=RemapCfg(scheme="PPM_H4"))
    for n in range(nsteps):
        st, sp, _ = step_dyn_split_rk2(d, g, vg, st, sp, forces,
                                       600.0, cfg,
                                       x_first=(n % 2 == 0))
        if ale_cfg is not None:
            st = st.replace(h=d.fill_halos(st.h),
                            u=d.fill_halos(st.u),
                            v=d.fill_halos(st.v))
            st, _tr, _hn, _au, _av = ale_regrid_remap(
                g, vg, st, ale_cfg)
    return d, st


@pytest.mark.parametrize("s_h", [4.0, 0.25])
@pytest.mark.parametrize("ale", [False, True])
def test_thickness_rescaling_bitwise(s_h, ale):
    """Vertical-scale invariance incl. the Z* ALE regrid/remap chain:
    catches hidden dimensional thickness constants (h_neglect-class
    epsilons) that the reference's test.dim.h guards against."""
    d, ref = run_core_H(1.0, ale=ale)
    d, scaled = run_core_H(s_h, ale=ale)
    assert np.isfinite(np.asarray(d.interior(ref.u))).all(), \
        "baseline run is not finite -- the invariance check would be vacuous"
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.h)) / s_h,
        np.asarray(d.interior(ref.h)),
        err_msg="h does not unscale bitwise under vertical rescaling")
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.u)),
        np.asarray(d.interior(ref.u)),
        err_msg="u not invariant under vertical rescaling")


def run_core_R(s_r: float, nsteps=4):
    """Split core with density rescaled by s_r (the reference's
    test.dim.r, MOM_unit_scaling.F90 R scale).  Scalings: Rho0·s and
    surface stress taux [R L Z T-2]·s; density-dimensioned parameters
    rescale too (RHO_PGF_REF — unit_scale applies the R scale to every
    [R] get_param); reduced gravities [L2 Z-1 T-2] are density-ratio
    quantities and stay fixed, as do u, h, f, Kv, Kh, dt."""
    from mom6_tpu.core.pressure_force import PressureForceCfg
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0,
                       f0=1e-4, max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=2, g_Earth=9.8, gint=0.01,
                              Rho0=1035.0 * s_r)
    cfg = SplitCfg(
        vertvisc=VertViscCfg(kv=1e-4, cdrag=0.0,
                             bottomdraglaw=False, maxvel=6.0),
        horvisc=HorViscCfg(laplacian=True, kh=1000.0, dt=600.0),
        pressure=PressureForceCfg(rho_ref=1035.0 * s_r),
        barotropic=BarotropicCfg(nstep=16))
    rng = np.random.default_rng(0)
    h0 = 500.0 + jnp.asarray(rng.standard_normal((2, 16, 16)))
    u0 = 0.05 * jnp.asarray(rng.standard_normal((2, 16, 16)))
    v0 = 0.05 * jnp.asarray(rng.standard_normal((2, 16, 16)))
    st = State(u=d.fill_halos(d.pad(u0)), v=d.fill_halos(d.pad(v0)),
               h=d.fill_halos(d.pad(h0)))
    sp = init_split_state(d, g, vg, st)
    taux = (0.1 * s_r) * g.mask2dCu
    forces = MechForcing(taux=taux)
    for n in range(nsteps):
        st, sp, _ = step_dyn_split_rk2(d, g, vg, st, sp, forces,
                                       600.0, cfg,
                                       x_first=(n % 2 == 0))
    return d, st


@pytest.mark.parametrize("s_r", [4.0, 0.25])
def test_density_rescaling_bitwise(s_r):
    """Density invariance: every ρ must enter through Rho0 (or a
    density ratio) — a hidden 1035-class constant breaks this."""
    d, ref = run_core_R(1.0)
    d, scaled = run_core_R(s_r)
    assert np.isfinite(np.asarray(d.interior(ref.u))).all(), \
        "baseline run is not finite -- the invariance check would be vacuous"
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.h)), np.asarray(d.interior(ref.h)),
        err_msg="h not invariant under density rescaling")
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.u)),
        np.asarray(d.interior(ref.u)),
        err_msg="u not invariant under density rescaling")
