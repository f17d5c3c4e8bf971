"""File-driven OBC segment data: ``U=file:name.nc(var)`` profiles
(MOM_open_boundary.F90 segment field machinery, static first record)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.framework.io import write_fields
from mom6_tpu.parallel.domain import Domain
from mom6_tpu.obc.open_boundary import (parse_segments,
                                        build_open_boundaries)


def test_file_profile_segment_data(tmp_path):
    nj = 10
    prof = 0.01 * np.arange(nj, dtype=np.float64)
    write_fields(str(tmp_path / "obc_u.nc"),
                 dict(u_seg=prof[None, None],     # (time=1, nz=1, nj)
                      ssh_seg=0.25 * np.ones((1, nj))),
                 dims=dict(u_seg=("Time", "nz", "ny"),
                           ssh_seg=("Time", "ny")))
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=N,J=0:N,FLATHER"
OBC_SEGMENT_001_DATA = "U=file:obc_u.nc(u_seg),SSH=file:obc_u.nc(ssh_seg)"
''')
    segs = parse_segments(pf, indir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(segs[0].u_ext), prof)
    np.testing.assert_allclose(np.asarray(segs[0].ssh_ext),
                               0.25 * np.ones(nj))

    d = Domain(ni=8, nj=nj, halo=4)
    obc = build_open_boundaries(pf, d, indir=str(tmp_path))
    # profile painted into a 2D field: rows H..H+nj carry the profile,
    # halo rows replicate the ends, uniform across columns
    H = 4
    ue = np.asarray(obc.u_e)
    assert ue.shape == (nj + 2 * H, 8 + 2 * H)
    np.testing.assert_allclose(ue[H:H + nj, 0], prof)
    np.testing.assert_allclose(ue[:H, 3], prof[0])
    np.testing.assert_allclose(ue[H + nj:, 3], prof[-1])
    assert np.all(ue[:, 5] == ue[:, 11])
    se = np.asarray(obc.ssh_e)
    np.testing.assert_allclose(se[H + 2, H + 1], 0.25)


def test_scalar_single_segment_stays_scalar():
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "J=N,I=0:N,FLATHER"
OBC_SEGMENT_001_DATA = "V=value:0.1,SSH=value:0.5"
''')
    d = Domain(ni=8, nj=8, halo=4)
    obc = build_open_boundaries(pf, d)
    assert isinstance(obc.v_n, float) and obc.v_n == 0.1
    assert isinstance(obc.ssh_n, float) and obc.ssh_n == 0.5


def test_two_segments_same_edge_paint_separately():
    """Two partial E segments with different SSH paint their own
    rows — previously the last segment's scalar won for the edge."""
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 2
OBC_SEGMENT_001 = "I=N,J=0:4,FLATHER"
OBC_SEGMENT_002 = "I=N,J=4:8,FLATHER"
OBC_SEGMENT_001_DATA = "SSH=value:0.1"
OBC_SEGMENT_002_DATA = "SSH=value:0.7"
''')
    d = Domain(ni=8, nj=8, halo=4)
    obc = build_open_boundaries(pf, d)
    H = 4
    se = np.asarray(obc.ssh_e)
    np.testing.assert_allclose(se[H + 1, 0], 0.1)
    np.testing.assert_allclose(se[H + 6, 0], 0.7)


def test_time_varying_segment_data(tmp_path):
    """Multi-record file data: u_ext interpolates between records
    inside the update fn (update_OBC_segment_data time_interp)."""
    from mom6_tpu.obc.open_boundary import build_obc_data_interp
    nj, nt = 8, 3
    # u ramps 0.1 → 0.3 over 2 days; time in days
    series = np.stack([np.full(nj, 0.1), np.full(nj, 0.2),
                       np.full(nj, 0.3)])
    write_fields(str(tmp_path / "obc_tv.nc"),
                 dict(Time=np.asarray([0.0, 1.0, 2.0]),
                      u_seg=series[:, None, :]),
                 dims=dict(Time=("Time",),
                           u_seg=("Time", "nz", "ny")),
                 attrs=dict(Time=dict(units="days since 0001-01-01")))
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=0,J=0:N,FLATHER"
OBC_SEGMENT_001_DATA = "U=file:obc_tv.nc(u_seg)"
''')
    d = Domain(ni=8, nj=nj, halo=4)
    obc = build_open_boundaries(pf, d, indir=str(tmp_path))
    # static build takes the first record
    uw0 = np.asarray(obc.u_w)
    np.testing.assert_allclose(uw0[6, 0], 0.1)
    fn = build_obc_data_interp(pf, d, obc, indir=str(tmp_path))
    assert fn is not None
    ob_half = fn(obc, None, None, jnp.asarray(0.5 * 86400.0))
    np.testing.assert_allclose(np.asarray(ob_half.u_w)[6, 2], 0.15,
                               rtol=1e-6)
    ob_end = fn(obc, None, None, jnp.asarray(2.0 * 86400.0))
    np.testing.assert_allclose(np.asarray(ob_end.u_w)[6, 2], 0.3,
                               rtol=1e-6)
    # beyond the last record: clamped
    ob_late = fn(obc, None, None, jnp.asarray(5.0 * 86400.0))
    np.testing.assert_allclose(np.asarray(ob_late.u_w)[6, 2], 0.3,
                               rtol=1e-6)


def test_time_varying_segment_in_model(tmp_path):
    """A model whose western inflow accelerates over time."""
    from mom6_tpu.model import build_model
    nj = 8
    series = np.stack([np.full(nj, 0.0), np.full(nj, 0.5)])
    write_fields(str(tmp_path / "obc_tv.nc"),
                 dict(Time=np.asarray([0.0, 0.25]),
                      u_seg=series[:, None, :]),
                 dims=dict(Time=("Time",),
                           u_seg=("Time", "nz", "ny")),
                 attrs=dict(Time=dict(units="days since 0001-01-01")))
    m = build_model(ParamFile(text=f'''
NIGLOBAL = 8
NJGLOBAL = 8
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 80.0
LENLAT = 80.0
MAXIMUM_DEPTH = 100.0
TOPO_CONFIG = flat
THICKNESS_CONFIG = uniform
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
INPUTDIR = {tmp_path}
OBC_NUMBER_OF_SEGMENTS = 2
OBC_SEGMENT_001 = "I=0,J=0:N,FLATHER"
OBC_SEGMENT_002 = "I=N,J=0:N,FLATHER"
OBC_SEGMENT_001_DATA = "U=file:obc_tv.nc(u_seg)"
'''))
    assert m.obc_update_fn is not None
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    # the interpolated boundary datum the step actually sees ramps
    ob1 = m.obc_update_fn(m.obc, m.grid, m.state.h,
                          jnp.asarray(0.125 * 86400.0))
    assert float(np.asarray(ob1.u_w)[6, 2]) == pytest.approx(0.25,
                                                             rel=1e-6)
    for k in range(12):
        s, a, tr = step(s, a, tr, n=k)
    u = np.asarray(m.domain.interior(s.u))
    assert np.all(np.isfinite(u))
    assert u.max() > 0.003       # ramped inflow spun up a current
