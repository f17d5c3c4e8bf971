"""Second batch of user configurations (src/user library breadth):
DOME, ISOMIP, dense_water, neverworld topographies; adjustment,
Rossby front, lock exchange, external gwave, dense water state ICs."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.model import build_model

BASE = """
NIGLOBAL = 16
NJGLOBAL = 14
NK = 4
DT = 300.0
DAYMAX = 0.005
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 140.0
MAXIMUM_DEPTH = 1000.0
MINIMUM_DEPTH = 1.0
F_0 = 1.0e-4
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
"""


def _run(extra, nsteps=2):
    m = build_model(ParamFile(text=BASE + extra))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(nsteps):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(s.h)))
    return m, s


@pytest.mark.parametrize("topo,check", [
    ("dome", "shelf"), ("isomip", "slope"),
    ("dense_water", "shelf"), ("neverworld", "ridge")])
def test_topographies_build_and_step(topo, check):
    m, s = _run(f"TOPO_CONFIG = {topo}\n"
                "TS_CONFIG = uniform\nTHICKNESS_CONFIG = uniform\n")
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    assert d.max() <= 1000.0 + 1e-9
    if check == "shelf":
        assert d.min() < 0.7 * d.max()        # a real shelf exists
    if check == "slope":
        assert d[:, -1].mean() > d[:, 0].mean()   # deepens eastward
    if check == "ridge":
        mid = d[:, d.shape[1] // 2].mean()
        assert mid < 0.9 * d.max()            # mid-basin ridge


def test_adjustment_front():
    m, s = _run("TOPO_CONFIG = flat\nTHICKNESS_CONFIG = adjustment\n"
                "TS_CONFIG = adjustment\nDELTA_T = 3.0\n"
                "REENTRANT_X = True\n")
    T = np.asarray(m.domain.interior(m.state.T[0]))
    assert T[-1].mean() - T[0].mean() > 2.0       # front across y


def test_rossby_front_jet_balance():
    m, s = _run("TOPO_CONFIG = flat\nTHICKNESS_CONFIG = rossby_front\n"
                "TS_CONFIG = rossby_front\nREENTRANT_X = True\n",
                nsteps=4)
    u0 = np.asarray(m.domain.interior(m.state.u[0]))
    assert np.abs(u0).max() > 1e-3                # surface jet present
    # near-balance: the jet survives a few steps without blowing up
    u4 = np.asarray(m.domain.interior(s.u[0]))
    assert np.abs(u4).max() < 10 * np.abs(u0).max()


def test_lock_exchange_overturns():
    m, s = _run("TOPO_CONFIG = flat\nTHICKNESS_CONFIG = lock_exchange\n"
                "TS_CONFIG = lock_exchange\nDELTA_T = 4.0\n"
                "USE_REGRIDDING = True\n"
                "REGRIDDING_COORDINATE_MODE = Z*\n", nsteps=4)
    # cold (dense) west water slumps under the warm east: eastward
    # flow develops at depth boundary
    assert float(jnp.max(jnp.abs(s.u))) > 1e-4


def test_external_gwave_oscillates():
    m, s = _run("TOPO_CONFIG = flat\nTHICKNESS_CONFIG = external_gwave\n"
                "ENABLE_THERMODYNAMICS = False\nADIABATIC = True\n"
                "SSH_ANOMALY_HEIGHT = 0.5\nREENTRANT_X = True\n",
                nsteps=3)
    eta0 = np.asarray(m.domain.interior(
        jnp.sum(m.state.h, axis=0))) - 1000.0
    assert abs(eta0[:, 0].mean() - 0.5) < 0.05    # cosine bump IC
    assert float(jnp.max(jnp.abs(s.u))) > 1e-5    # wave radiates


def test_dome_layers_thin_off_slope():
    m, s = _run("TOPO_CONFIG = dome\nTHICKNESS_CONFIG = dome\n"
                "TS_CONFIG = uniform\nSHELF_DEPTH = 400.0\n")
    h = np.asarray(m.domain.interior(m.state.h))
    d = np.asarray(m.domain.interior(m.grid.bathyT))
    shelf = d < 500.0
    assert shelf.sum() > 0
    # the dense bottom class is much thinner on the shelf than in the
    # basin (exponential interfaces clipped by the topography)
    assert h[-1][shelf].mean() < 0.5 * h[-1][~shelf].mean()


def test_dense_water_salinity_anomaly():
    m, s = _run("TOPO_CONFIG = dense_water\n"
                "THICKNESS_CONFIG = dense_water\n"
                "TS_CONFIG = dense_water\nDELTA_S = 2.0\n")
    S = np.asarray(m.domain.interior(m.state.S[0]))
    assert S[0].mean() - S[-1].mean() > 1.0       # salty southern shelf


def test_velocity_config_options():
    """VELOCITY_CONFIG (MOM_state_initialization.F90:492): uniform,
    circular and file initial velocities."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    base = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 500.0
F_0 = 1.0e-4
REENTRANT_X = True
ADIABATIC = True
"""
    m = build_model(ParamFile(text=base + (
        "VELOCITY_CONFIG = uniform\nINITIAL_U_CONST = 0.3\n"
        "INITIAL_V_CONST = -0.1\n")))
    d = m.domain
    u = np.asarray(d.interior(m.state.u))
    np.testing.assert_allclose(u, 0.3)
    np.testing.assert_allclose(np.asarray(d.interior(m.state.v)),
                               -0.1)
    # circular: nonzero azimuthal flow, zero at the center and edges
    m2 = build_model(ParamFile(text=base + (
        "VELOCITY_CONFIG = circular\nCIRCULAR_MAX_U = 0.5\n")))
    u2 = np.asarray(m2.domain.interior(m2.state.u))
    assert np.abs(u2).max() > 0.05
    # a rotating flow: u antisymmetric about the mid-latitude row
    assert u2[0, 2, 6] * u2[0, 9, 6] < 0.0
    # file: round-trip
    import tempfile, os
    from mom6_tpu.framework.io import write_fields
    with tempfile.TemporaryDirectory() as td:
        rng = np.random.default_rng(2)
        uic = rng.standard_normal((2, 12, 12)) * 0.1
        vic = rng.standard_normal((2, 12, 12)) * 0.1
        write_fields(os.path.join(td, "velocity.nc"),
                     {"u": uic, "v": vic},
                     dims={"u": ("nk", "nj", "ni"),
                           "v": ("nk", "nj", "ni")})
        m3 = build_model(ParamFile(text=base + (
            f"INPUTDIR = {td}\nVELOCITY_CONFIG = file\n")))
        got = np.asarray(m3.domain.interior(m3.state.u))
        np.testing.assert_allclose(got, uic, rtol=1e-12)


def test_soliton_config():
    """Equatorial Rossby soliton (soliton_initialization.F90): the
    Boyd analytic IC propagates westward without falling apart on an
    equatorial beta plane."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    text = """
NIGLOBAL = 48
NJGLOBAL = 16
NK = 1
DT = 600.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 4800.0
LENLAT = 1600.0
SOUTHLAT = -800.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1.0
F_0 = 0.0
BETA = 2.0e-11
REENTRANT_X = True
ADIABATIC = True
THICKNESS_CONFIG = soliton
SPLIT = False
"""
    m = build_model(ParamFile(text=text))
    d = m.domain
    eta0 = np.asarray(d.interior(m.state.h).sum(0)) - 1.0
    assert eta0.max() > 0.01                     # the soliton bump
    i_peak0 = np.unravel_index(np.argmax(eta0), eta0.shape)[1]
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(6):
        s, a, tr = step(s, a, tr, n=k)
    eta1 = np.asarray(d.interior(s.h).sum(0)) - 1.0
    assert np.all(np.isfinite(eta1))
    # amplitude is preserved to leading order (solitary wave)
    assert eta1.max() > 0.5 * eta0.max()
    # mass conserved
    np.testing.assert_allclose(eta1.sum(), eta0.sum(), atol=1e-8)
