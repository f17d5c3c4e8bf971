"""Layered-mode interface (eta) sponge (MOM_sponge.F90 restoring)."""

import numpy as np
import jax.numpy as jnp

from mom6_tpu.param.vertical.sponge import apply_eta_sponge
from mom6_tpu.framework.config import ParamFile
from mom6_tpu.framework.io import write_fields
from mom6_tpu.model import build_model


def test_eta_sponge_restores_and_conserves():
    nk, nj, ni = 4, 6, 6
    h = jnp.full((nk, nj, ni), 250.0)
    # target: thick top layer (interface depths 0,400,600,800,1000)
    d_ref = jnp.broadcast_to(
        jnp.array([0.0, 400.0, 600.0, 800.0, 1000.0]).reshape(-1, 1, 1),
        (nk + 1, nj, ni))
    idamp = jnp.full((nj, ni), 1.0 / 3600.0)
    h2 = apply_eta_sponge(h, idamp, 1800.0, d_ref)
    np.testing.assert_allclose(np.asarray(h2.sum(0)), 1000.0,
                               rtol=1e-12)
    hv = np.asarray(h2[:, 3, 3])
    assert hv[0] > 250.0                     # pulled toward 400
    assert hv[0] < 400.0                     # partial (implicit) step
    # repeated application converges to the target
    for _ in range(200):
        h2 = apply_eta_sponge(h2, idamp, 1800.0, d_ref)
    np.testing.assert_allclose(np.asarray(h2[:, 3, 3]),
                               [400.0, 200.0, 200.0, 200.0], rtol=1e-6)
    # zero damping is an exact no-op
    h3 = apply_eta_sponge(h, jnp.zeros((nj, ni)), 1800.0, d_ref)
    np.testing.assert_allclose(np.asarray(h3), np.asarray(h),
                               atol=2e-10)


def test_eta_sponge_from_file(tmp_path):
    nk, nj, ni = 4, 8, 8
    idamp = np.zeros((nj, ni))
    idamp[:, :2] = 1.0 / 7200.0              # western sponge strip
    eta = np.broadcast_to(
        np.array([0.0, -500.0, -700.0, -850.0, -1000.0]
                 ).reshape(-1, 1, 1), (nk + 1, nj, ni)).copy()
    T = np.full((nk, nj, ni), 10.0)
    S = np.full((nk, nj, ni), 35.0)
    write_fields(str(tmp_path / "sponge.nc"),
                 {"Idamp": idamp, "PTEMP": T, "SALT": S, "ETA": eta},
                 dims={"Idamp": ("nj", "ni"),
                       "PTEMP": ("nk", "nj", "ni"),
                       "SALT": ("nk", "nj", "ni"),
                       "ETA": ("nkp1", "nj", "ni")})
    text = f"""
NIGLOBAL = 8
NJGLOBAL = 8
NK = 4
DT = 1200.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 80.0
LENLAT = 80.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1000.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_REF = 10.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
SPONGE = True
INPUTDIR = {tmp_path}
SPONGE_DAMPING_FILE = sponge.nc
"""
    m = build_model(ParamFile(text=text))
    assert m.ocean_cfg.sponge_data.get("eta") is not None
    d = m.domain
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    h0 = np.asarray(d.interior(m.state.h))
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    h1 = np.asarray(d.interior(s.h))
    # inside the sponge the top layer moved toward its 500 m target
    assert h1[0, 4, 0] > h0[0, 4, 0]
    # total mass conserved
    np.testing.assert_allclose(h1.sum(0), h0.sum(0), rtol=1e-11)
