"""Porous barriers (MOM_porous_barriers.F90 re-design) wired into the
PPM continuity fluxes."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.porous_barriers import (cumulative_open_area,
                                           porous_widths_from_h)
from mom6_tpu.core.continuity_ppm import (ContinuityCfg,
                                          zonal_mass_flux, ppm_edges_x)


def test_cumulative_open_area_limits():
    Dmin, Dmax, Davg = -500.0, -100.0, -300.0
    A = lambda eta: float(cumulative_open_area(
        jnp.asarray(Dmin), jnp.asarray(Dmax), jnp.asarray(Davg),
        jnp.asarray(eta)))
    assert A(-600.0) == 0.0                       # below deepest point
    np.testing.assert_allclose(A(0.0), 0.0 - Davg)   # fully open
    np.testing.assert_allclose(A(Dmax), Dmax - Davg, rtol=1e-12)
    # continuity at the crest and monotonicity in between
    etas = np.linspace(-499.0, -101.0, 40)
    vals = [A(e) for e in etas]
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= etas[-1] - Dmin for v in vals)


@pytest.mark.parametrize("davg,expect_lo,expect_hi", [
    (-300.0, 0.05, 0.8),        # partly open ridge
])
def test_porous_ridge_blocks_transport(davg, expect_lo, expect_hi):
    d = Domain(ni=12, nj=8, halo=3, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=120.0, lenlat_km=80.0, f0=0.0,
                       beta=0.0, depth_fn=lambda lo, la:
                       np.full_like(la, 1000.0), max_depth=1000.0)
    nk = 4
    shp = (nk, d.njh, d.nih)
    h = d.fill_halos(jnp.full(shp, 250.0))
    u = d.fill_halos(jnp.full(shp, 0.2))
    cfg = ContinuityCfg()
    hW, hE = ppm_edges_x(g, h, cfg, 1e-3)
    uh_open, _, _, _ = zonal_mass_flux(g, u, h, hW, hE, 600.0, cfg)

    # ridge across the face at padded x-index ic: crest at 100 m depth,
    # deepest gap 500 m
    ic = d.halo + 5
    Dmin = np.full((d.njh, d.nih), -1000.0)
    Dmax = np.full((d.njh, d.nih), 0.0)
    Davg = np.full((d.njh, d.nih), -1000.0)
    Dmin[:, ic] = -500.0
    Dmax[:, ic] = -100.0
    Davg[:, ic] = davg
    # away from the ridge: fully open faces (Dmin=-1000=bottom,
    # Davg=-1000 → A(eta)=eta+1000 → fraction 1)
    gp = dataclasses.replace(
        g, porous_DminU=jnp.asarray(Dmin), porous_DmaxU=jnp.asarray(Dmax),
        porous_DavgU=jnp.asarray(Davg))
    porU, porV = porous_widths_from_h(gp, h)
    assert porV is None
    p = np.asarray(porU)[:, d.halo + 2, ic]
    # top layer (0-250 m: mostly above the crest) mostly open;
    # bottom layer (750-1000 m: below the deepest gap) closed
    assert p[0] > expect_hi
    assert p[3] < expect_lo
    uh_por, _, _, _ = zonal_mass_flux(gp, u, h, hW, hE, 600.0, cfg)
    r = np.asarray(jnp.sum(uh_por[:, d.halo + 2, ic])
                   / jnp.sum(uh_open[:, d.halo + 2, ic]))
    assert 0.05 < r < 0.7                      # partially blocked
    # faces away from the ridge are unchanged
    np.testing.assert_allclose(
        np.asarray(uh_por[:, :, ic - 2]),
        np.asarray(uh_open[:, :, ic - 2]), rtol=1e-10)


def test_model_reads_topo_at_vel(tmp_path):
    from mom6_tpu.framework.io import write_fields
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    ni, nj = 10, 8
    z = np.zeros((nj, ni))
    write_fields(str(tmp_path / "topog_edge.nc"),
                 {"depthu_hi": z + 100.0, "depthu_lo": z + 900.0,
                  "depthu_av": z + 500.0, "depthv_hi": z + 100.0,
                  "depthv_lo": z + 900.0, "depthv_av": z + 500.0})
    text = f"""
NIGLOBAL = {ni}
NJGLOBAL = {nj}
NK = 3
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 100.0
LENLAT = 80.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
SUBGRID_TOPO_AT_VEL = True
INPUTDIR = {tmp_path}
"""
    m = build_model(ParamFile(text=text))
    assert m.grid.porous_DavgU is not None
    np.testing.assert_allclose(
        float(m.grid.porous_DmaxU[4, 4]), -100.0)
    # and the model steps with porous faces active
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    s, a, tr = step(s, a, tr, n=0)
    assert np.isfinite(float(jnp.sum(s.h)))
