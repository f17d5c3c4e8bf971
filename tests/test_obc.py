import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.obc.open_boundary import (parse_segments, Segment,
                                        OpenBoundaries,
                                        build_open_boundaries)
from mom6_tpu.parallel.domain import Domain


def test_parse_tc3_style_segments():
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 4
OBC_SEGMENT_001 = "J=N,I=N:0,FLATHER,ORLANSKI"
OBC_SEGMENT_002 = "J=0,I=0:N,FLATHER,ORLANSKI"
OBC_SEGMENT_003 = "I=N,J=0:N,FLATHER,ORLANSKI"
OBC_SEGMENT_004 = "I=0,J=N:0,FLATHER,ORLANSKI"
OBC_SEGMENT_001_DATA = "U=value:0.0,V=value:0.0,SSH=value:0.5"
''')
    segs = parse_segments(pf)
    assert len(segs) == 4
    dirs = {s.direction for s in segs}
    assert dirs == {"N", "S", "E", "W"}
    north = [s for s in segs if s.direction == "N"][0]
    assert north.flather and north.orlanski
    assert north.ssh_ext == 0.5


def test_reference_tc3_segments_parse():
    import os
    path = "/root/reference/.testing/tc3/MOM_input"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    pf = ParamFile(path)
    segs = parse_segments(pf)
    assert len(segs) == 4
    assert {s.direction for s in segs} == {"N", "S", "E", "W"}


def _run_basin(open_boundaries: bool, nsteps=60):
    """Gravity-wave bump in a small basin; returns eta RMS history."""
    from mom6_tpu.model import build_model
    text = f'''
SPLIT = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
DT = 200.0
NIGLOBAL = 20
NJGLOBAL = 20
NK = 1
GRID_CONFIG = "cartesian"
AXIS_UNITS = "k"
LENLAT = 200.0
LENLON = 200.0
TOPO_CONFIG = "flat"
MAXIMUM_DEPTH = 100.0
KV = 1.0E-04
THICKNESS_CONFIG = "uniform"
WIND_CONFIG = "zero"
'''
    if open_boundaries:
        text += '''
OBC_NUMBER_OF_SEGMENTS = 4
OBC_SEGMENT_001 = "J=N,I=N:0,FLATHER"
OBC_SEGMENT_002 = "J=0,I=0:N,FLATHER"
OBC_SEGMENT_003 = "I=N,J=0:N,FLATHER"
OBC_SEGMENT_004 = "I=0,J=N:0,FLATHER"
'''
    pf = ParamFile(text=text)
    m = build_model(pf)
    pf.close(fatal_unused=False)
    d = m.domain
    # add an eta bump via h
    x = np.arange(28) - 14.0
    r2 = x[None, :] ** 2 + x[:, None] ** 2
    bump = 0.5 * np.exp(-r2 / 8.0)
    h = np.asarray(m.state.h)
    h = h + bump[None]
    st = m.state.replace(h=d.fill_halos(jnp.asarray(h)))
    if m.obc is not None:
        st = st.replace(h=m.obc.extend(st.h))
    sp = m.split_state
    import mom6_tpu.core.dynamics_split_rk2 as dsr
    from mom6_tpu.core.dynamics_split_rk2 import init_split_state
    sp = init_split_state(d, m.grid, m.vgrid, st)
    step = m.step_fn()
    tr = None
    rms = []
    for n in range(nsteps):
        eta = np.asarray(d.interior(sp.eta))
        rms.append(float(np.sqrt((eta ** 2).mean())))
        st, sp, tr = step(st, sp, tr, n)
    return np.asarray(rms)


def test_flather_radiates_bump_out():
    """With Flather OBC on all edges the bump's energy leaves the
    domain; with walls it keeps sloshing.  (c=31 m/s crosses the
    200 km basin in ~6400 s = 32 steps.)"""
    rms_open = _run_basin(True)
    rms_closed = _run_basin(False)
    # closed basin retains most of the signal
    assert rms_closed[-1] > 0.3 * rms_closed[0]
    # open basin radiates the bulk of it away
    assert rms_open[-1] < 0.25 * rms_open[0], (
        f"open-basin eta rms {rms_open[-1]} vs initial {rms_open[0]}")
    assert rms_open[-1] < 0.5 * rms_closed[-1]


def test_tracer_reservoirs_outflow_and_inflow():
    """Outflow drags the E reservoir toward the interior value;
    inflow leaves it unchanged and stamps it into the halo ring."""
    H, ni, nj, nk = 4, 8, 6, 2
    obc = OpenBoundaries(open_w=False, open_e=True, open_s=False,
                         open_n=False, halo=H, nil=ni, njl=nj)
    shape = (nk, nj + 2 * H, ni + 2 * H)
    t = jnp.zeros(shape).at[..., :, H + ni - 1].set(5.0)
    tr = {"dye": t}
    res = obc.init_tracer_reservoirs(tr)
    np.testing.assert_allclose(np.asarray(res["dye"]["E"]), 5.0)

    # reservoir seeded at 0 (external water), interior edge is 5
    res["dye"]["E"] = jnp.zeros_like(res["dye"]["E"])
    u_out = jnp.full(shape, 0.5)       # eastward → outflow at E
    u_in = jnp.full(shape, -0.5)       # westward → inflow at E
    r1 = obc.update_tracer_reservoirs(res, tr, u_out, u_out, dt=3600.0,
                                      len_out=1.0e4)
    # w = 0.5*3600/1e4 = 0.18 → reservoir moves 18% toward 5
    np.testing.assert_allclose(np.asarray(r1["dye"]["E"]), 0.9,
                               rtol=1e-12)
    r2 = obc.update_tracer_reservoirs(res, tr, u_in, u_in, dt=3600.0)
    np.testing.assert_allclose(np.asarray(r2["dye"]["E"]), 0.0)

    # application overwrites the halo beyond the edge with reservoir
    filled = obc.apply_tracer_reservoirs(tr, r1)
    got = np.asarray(filled["dye"][..., :, H + ni:])
    np.testing.assert_allclose(got, 0.9, rtol=1e-12)
    # interior untouched
    np.testing.assert_allclose(
        np.asarray(filled["dye"][..., :, H + ni - 1]), 5.0)


def test_partial_segment_strip():
    """'I=N,J=2:6' opens only rows 2..5 of the E edge: parsing,
    halo extension, and mask opening are confined to the strip."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.obc.open_boundary import open_grid_masks
    from mom6_tpu.core.grid import cartesian_grid
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=N,J=2:6,FLATHER"
''')
    segs = parse_segments(pf)
    assert segs[0].direction == "E"
    assert (segs[0].lo, segs[0].hi) == (2, 6)

    d = Domain(ni=10, nj=10, halo=4)
    from mom6_tpu.obc.open_boundary import build_open_boundaries
    obc = build_open_boundaries(pf, d)
    assert obc.open_e and not obc.open_w
    # 2D ownership mask: 1 on the E face column + halo band, only in
    # the segment's rows
    st = np.asarray(obc.strip_e)
    H, ni = 4, 10
    assert st.shape == (18, 18)
    assert st.sum() == 4.0 * (1 + H)
    assert np.all(st[H + 2:H + 6, H + ni - 1:] == 1.0)
    assert st[H + 1, H + ni - 1] == 0.0 and st[H + 6, H + ni - 1] == 0.0
    assert np.all(st[:, :H + ni - 1] == 0.0)

    f = jnp.zeros((2, 18, 18)).at[..., :, H + ni - 1].set(7.0)
    ext = np.asarray(obc.extend(f))
    # halo beyond the open strip rows gets the edge value; closed rows
    # stay zero
    assert np.all(ext[:, H + 2:H + 6, H + ni:] == 7.0)
    assert np.all(ext[:, H + 7, H + ni:] == 0.0)
    # whole-edge OBC (no range): the mask owns the full edge rows
    # including the corner halos
    pf2 = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=N,J=0:N,FLATHER"
''')
    obc2 = build_open_boundaries(pf2, d)
    assert np.all(np.asarray(obc2.strip_e)[:, H + ni - 1:] == 1.0)
    ext2 = np.asarray(obc2.extend(f))
    assert np.all(ext2[:, :, H + ni:] == 7.0)
    # grid masks open only across the strip
    g = cartesian_grid(d, lenlon_km=100.0, lenlat_km=100.0)
    g2 = open_grid_masks(g, obc)
    m = np.asarray(g2.mask2dT)
    assert np.all(m[H + 2:H + 6, H + ni:] == 1.0)
    assert np.all(m[H + 8, H + ni:] == 0.0)


def test_segment_data_external_tracer_seeds_reservoir():
    """'dye=value:0.25' in segment DATA seeds that edge's reservoir
    with the external concentration instead of the interior value."""
    pf = ParamFile(text='''
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=N,J=0:N,FLATHER"
OBC_SEGMENT_001_DATA = "U=value:0.1,dye=value:0.25,TEMP=value:12.0"
''')
    segs = parse_segments(pf)
    assert segs[0].u_ext == 0.1
    assert segs[0].tracer_ext == {"dye": 0.25, "T": 12.0}
    d = Domain(ni=8, nj=6, halo=4)
    obc = build_open_boundaries(pf, d)
    t = jnp.full((2, 14, 16), 7.0)
    res = obc.init_tracer_reservoirs({"dye": t, "other": t})
    np.testing.assert_allclose(np.asarray(res["dye"]["E"]), 0.25)
    # tracers without DATA values seed from the interior edge
    np.testing.assert_allclose(np.asarray(res["other"]["E"]), 7.0)


def test_nudged_segment_parsing_and_relaxation():
    """NUDGED segments parse their inflow/outflow timescales (days)
    and the radiated boundary value relaxes toward the segment data
    (the nudged branch of radiation_open_bdry_conds)."""
    pfn = ParamFile(text="""
NIGLOBAL = 16
NJGLOBAL = 16
OBC_NUMBER_OF_SEGMENTS = 1
OBC_SEGMENT_001 = "I=N,J=0:N,ORLANSKI,NUDGED"
OBC_SEGMENT_001_VELOCITY_NUDGING_TIMESCALES = 0.3, 360.0
OBC_SEGMENT_001_DATA = "U=value:0.25"
""")
    segs = parse_segments(pfn)
    assert segs[0].nudged
    np.testing.assert_allclose(segs[0].tau_in, 0.3 * 86400.0)
    np.testing.assert_allclose(segs[0].tau_out, 360.0 * 86400.0)
    d = Domain(ni=16, nj=16, halo=4)
    obc = build_open_boundaries(pfn, d)
    assert obc.tau_in_e > 0.0
    nk = 2
    dt = 3600.0
    iE = d.halo + 16 - 1
    jmid = d.halo + 8
    # stationary solution (u_new == u_old): rx = 0 -> treated as
    # inflow, relaxed toward +0.25 with the short tau_in
    u_old = jnp.full((nk, d.njh, d.nih), -0.1)
    out = obc.radiate_u(u_old, u_old, dt=dt)
    r = dt / (0.3 * 86400.0)
    expect = -0.1 + r / (1 + r) * (0.25 - (-0.1))
    np.testing.assert_allclose(float(out[0, jmid, iE]), expect,
                               rtol=1e-12)
    # outward-radiating case (rx > 0): the long tau_out applies
    u_old2 = jnp.full((nk, d.njh, d.nih), 0.1)
    u_old2 = u_old2.at[:, :, iE].set(0.3)
    u_old2 = u_old2.at[:, :, iE - 1].set(0.2)
    u_new2 = u_old2.at[:, :, iE - 1].set(0.15)   # num=0.05, den=0.1
    out2 = obc.radiate_u(u_new2, u_old2, dt=dt)
    rx = 0.5
    val_rad = (0.3 + rx * 0.15) / (1 + rx)
    r2 = dt / (360.0 * 86400.0)
    expect2 = val_rad + r2 / (1 + r2) * (0.25 - val_rad)
    np.testing.assert_allclose(float(out2[0, jmid, iE]), expect2,
                               rtol=1e-10)
    # dt=0 leaves the radiated value untouched
    out3 = obc.radiate_u(u_new2, u_old2, dt=0.0)
    np.testing.assert_allclose(float(out3[0, jmid, iE]), val_rad,
                               rtol=1e-12)
