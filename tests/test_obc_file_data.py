"""File-driven OBC segment data: ``U=file:name.nc(var)`` profiles
(MOM_open_boundary.F90 segment field machinery, static first record)."""

import numpy as np
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
