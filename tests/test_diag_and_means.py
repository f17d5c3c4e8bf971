import os

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.framework.diag import DiagMediator, parse_diag_table
from mom6_tpu.diagnostics.spatial_means import (global_area_mean,
                                                global_volume_mean)
from mom6_tpu.diagnostics.wave_speed import wave_speed_wkb
from mom6_tpu.param.lateral.thickness_diffuse import (
    ThicknessDiffuseCfg, thickness_diffuse)
from mom6_tpu.eos import LinearEOS


def setup():
    d = Domain(ni=16, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=80.0)
    return d, g


def test_diag_table_parse():
    text = '''"tc0 test"
1 1 1 0 0 0
"prog", 1, "days", 1, "days", "time"
"ocean_model", "u", "u", "prog", "all", "none", "none", 2
"ocean_model", "SSH", "ssh", "prog", "all", "mean", "none", 2
'''
    title, files, fields = parse_diag_table(text)
    assert title == "tc0 test"
    assert "prog" in files
    assert ("ocean_model", "u", "u", "prog", "none") in fields
    assert ("ocean_model", "SSH", "ssh", "prog", "mean") in fields


def test_register_post_flush_netcdf(tmp_path):
    d, g = setup()
    dm = DiagMediator(d, directory=str(tmp_path))
    fid = dm.register("ocean_model", "sst", units="degC")
    assert fid > 0
    f = d.pad(jnp.full((8, 16), 12.5))
    dm.post(fid, f)
    path = dm.flush("test.nc")
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        var = nc.variables["ocean_model_sst"]
        np.testing.assert_allclose(var[0], 12.5)


def test_time_mean_accumulation(tmp_path):
    d, g = setup()
    text = '"t"\n1 1 1 0 0 0\n"f", 1, "days", 1, "days", "time"\n' \
        '"m", "x", "x", "f", "all", "mean", "none", 2\n'
    dm = DiagMediator(d, directory=str(tmp_path), diag_table_text=text)
    fid = dm.register("m", "x")
    unreq = dm.register("m", "not_requested")
    assert unreq == -1
    dm.post(fid, d.pad(jnp.full((8, 16), 1.0)))
    dm.post(fid, d.pad(jnp.full((8, 16), 3.0)))
    path = dm.flush("m.nc")
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        np.testing.assert_allclose(nc.variables["m_x"][0], 2.0)


def test_chksum_mode(tmp_path):
    d, g = setup()
    dm = DiagMediator(d, directory=str(tmp_path), as_chksum=True)
    fid = dm.register("m", "h")
    dm.post(fid, d.pad(jnp.arange(128.0).reshape(8, 16)))
    path = dm.flush()
    content = open(path).read()
    assert "m.h:" in content and "bits=" in content


def test_global_means():
    d, g = setup()
    f = d.pad(jnp.full((8, 16), 4.0))
    assert abs(global_area_mean(d, g, f) - 4.0) < 1e-12
    h = d.pad(jnp.full((2, 8, 16), 50.0))
    f3 = d.pad(jnp.asarray(np.broadcast_to(
        np.array([1.0, 3.0])[:, None, None], (2, 8, 16)).copy()))
    assert abs(global_volume_mean(d, g, f3, h) - 2.0) < 1e-12


def test_wave_speed_two_layer():
    """c1 for a 2-layer fluid ≈ sqrt(g' H1 H2/(H1+H2)); the WKB
    estimate is within a factor ~(2/pi) of it — check the scale."""
    vg = VerticalGrid.uniform(nk=2, gint=0.02)
    h = jnp.asarray([500.0, 1500.0]).reshape(2, 1, 1)
    c = float(wave_speed_wkb(vg, h)[0, 0])
    c_exact = np.sqrt(0.02 * 500 * 1500 / 2000)
    assert 0.3 * c_exact < c < 3.0 * c_exact


def test_thickness_diffuse_flattens_and_conserves():
    d, g = setup()
    vg = VerticalGrid.uniform(nk=2, gint=0.02)
    rng = np.random.default_rng(0)
    h_int = 500.0 + 50.0 * rng.standard_normal((2, 8, 16))
    h = d.fill_halos(d.pad(jnp.asarray(h_int)))
    cfg = ThicknessDiffuseCfg(khth=1000.0)
    res = thickness_diffuse(g, vg, h, dt=3600.0, cfg=cfg)
    a = d.interior(g.areaT)
    m0 = float(jnp.sum(d.interior(h) * a))
    m1 = float(jnp.sum(d.interior(res.h) * a))
    assert abs(m1 - m0) / m0 < 1e-12
    # per-column totals also conserved (streamfunction form)
    col0 = np.asarray(d.interior(jnp.sum(h, 0)))
    col1 = np.asarray(d.interior(jnp.sum(res.h, 0)))
    np.testing.assert_allclose(col1, col0, rtol=1e-12)
    # the diffused quantity is the INTERIOR INTERFACE height: its
    # variance must decrease (the surface/bottom stay fixed per column)
    from mom6_tpu.core.pressure_force import interface_heights
    e0 = np.asarray(d.interior(interface_heights(vg, h, g.bathyT)[1]))
    e1 = np.asarray(d.interior(interface_heights(vg, res.h,
                                                 g.bathyT)[1]))
    assert e1.var() < e0.var()
