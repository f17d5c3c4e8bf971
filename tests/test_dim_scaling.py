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
        barotropic=BarotropicCfg(nstep=8))
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
    # u scales as 1/s_t; h is unscaled
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.h)), np.asarray(d.interior(ref.h)),
        err_msg="h not invariant under time rescaling")
    np.testing.assert_array_equal(
        np.asarray(d.interior(scaled.u)) * s_t,
        np.asarray(d.interior(ref.u)),
        err_msg="u does not unscale bitwise under time rescaling")
