import numpy as np
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.pressure_force import (
    pressure_force, interface_heights, PressureForceCfg)
from mom6_tpu.eos import LinearEOS


def setup(nk=3):
    d = Domain(ni=16, nj=12, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=1600.0, lenlat_km=1200.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.01)
    return d, g, vg


def test_interface_heights():
    d, g, vg = setup()
    h = d.pad(jnp.full((3, 12, 16), 100.0))
    e = interface_heights(vg, h, g.bathyT)
    assert e.shape[0] == 4
    inner = d.interior(e[0])
    np.testing.assert_allclose(np.asarray(inner), -4000.0 + 300.0)
    np.testing.assert_allclose(np.asarray(d.interior(e[-1])), -4000.0)


def test_flat_state_zero_force_layered():
    d, g, vg = setup()
    h = d.pad(jnp.full((3, 12, 16), 1000.0))
    h = d.fill_halos(h)
    res = pressure_force(g, vg, h)
    np.testing.assert_allclose(np.asarray(d.interior(res.PFu)), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.interior(res.PFv)), 0.0,
                               atol=1e-12)


def test_flat_state_zero_force_eos():
    d, g, vg = setup()
    h = d.fill_halos(d.pad(jnp.full((3, 12, 16), 1000.0)))
    T = d.fill_halos(d.pad(jnp.full((3, 12, 16), 10.0)))
    S = d.fill_halos(d.pad(jnp.full((3, 12, 16), 35.0)))
    eos = LinearEOS()
    res = pressure_force(g, vg, h, T, S, eos)
    np.testing.assert_allclose(np.asarray(d.interior(res.PFu)), 0.0,
                               atol=1e-10)


def test_surface_tilt_acceleration():
    """A free-surface tilt gives PFu = -g deta/dx in a 1-layer fluid."""
    d, g, vg = setup(nk=1)
    dx = float(g.dxT[6, 6])
    # eta slope: 1 m over the full domain width
    ni = 16
    slope = 1.0 / (ni * dx)
    x = (np.arange(24) - 4 + 0.5) * dx
    eta = slope * x
    h_int = 4000.0 + np.broadcast_to(eta, (1, 20, 24))
    h = jnp.asarray(h_int)
    T = jnp.full((1, 20, 24), 5.0)
    S = jnp.full((1, 20, 24), 35.0)
    eos = LinearEOS(rho_t0_s0=1035.0, drho_dt=0.0, drho_ds=0.0)
    res = pressure_force(g, vg, h, T, S, eos)
    # rho == Rho0 exactly → PFu = -g*slope everywhere in the interior
    got = np.asarray(res.PFu)[0, 8:12, 8:12]
    np.testing.assert_allclose(got, -9.8 * slope, rtol=1e-10)


def test_pbce_layered():
    d, g, vg = setup()
    h = d.fill_halos(d.pad(jnp.full((3, 12, 16), 1000.0)))
    res = pressure_force(g, vg, h)
    pbce = np.asarray(d.interior(res.pbce))
    # pbce[0] = g (free surface); deeper layers pick up g' contributions
    np.testing.assert_allclose(pbce[0], 9.8, rtol=1e-12)
    assert np.all(pbce[1] > pbce[0] - 1e-9)


def test_quadrature_layer_density_exact_for_linear_compressibility():
    """For an EOS linear in pressure the 5-point Boole layer mean
    equals the midpoint value; for the Wright EOS (nonlinear in p)
    the quadrature differs and converges to the true integral."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.core.pressure_force import _layer_densities
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.eos import make_eos
    vg = VerticalGrid.uniform(nk=2)
    h = jnp.full((2, 3, 3), 2000.0)
    e = jnp.asarray([0.0, -2000.0, -4000.0]).reshape(3, 1, 1) \
        * jnp.ones((3, 3, 3))
    T = jnp.full((2, 3, 3), 5.0)
    S = jnp.full((2, 3, 3), 35.0)
    lin = make_eos("LINEAR")
    r1 = _layer_densities(vg, h, e, T, S, lin, 1035.0, 9.8, 1)
    r5 = _layer_densities(vg, h, e, T, S, lin, 1035.0, 9.8, 5)
    np.testing.assert_allclose(np.asarray(r5), np.asarray(r1),
                               rtol=1e-14)
    wr = make_eos("WRIGHT")
    w1 = _layer_densities(vg, h, e, T, S, wr, 1035.0, 9.8, 1)
    w5 = _layer_densities(vg, h, e, T, S, wr, 1035.0, 9.8, 5)
    d15 = float(jnp.max(jnp.abs(w5 - w1)))
    assert d15 > 0.0                        # curvature resolved
    # brute-force reference: 401-point trapezoid over the layer
    z = jnp.linspace(0.0, -2000.0, 401).reshape(-1, 1, 1, 1)
    rho_z = wr.density(T[None, :1], S[None, :1],
                       -1035.0 * 9.8 * z)
    w_tz = (jnp.sum(rho_z, axis=0) - 0.5 * (rho_z[0] + rho_z[-1])) \
        / 400.0
    np.testing.assert_allclose(float(w5[0, 0, 0]),
                               float(w_tz[0, 0, 0]), rtol=1e-9)


def test_reconstruct_for_pressure():
    """RECONSTRUCT_FOR_PRESSURE (MOM_PressureForce_FV.F90:980): PLM
    in-layer T/S profiles in the Boole density integral.  With a
    LINEAR EOS the layer-mean density is unchanged (the PLM is
    mean-preserving under the Boole weights); with the nonlinear
    WRIGHT EOS the reconstruction changes the pressure force."""
    import dataclasses
    from mom6_tpu.eos import make_eos
    dn, g, vg = _setup() if '_setup' in globals() else (None,) * 3
    if dn is None:
        from mom6_tpu.parallel.domain import Domain
        from mom6_tpu.core.grid import cartesian_grid
        from mom6_tpu.core.vertical_grid import VerticalGrid
        dn = Domain(ni=12, nj=12, halo=4, reentrant_x=True,
                    reentrant_y=True)
        g = cartesian_grid(dn, lenlon_km=120.0, lenlat_km=120.0,
                           f0=1e-4, max_depth=2000.0)
        vg = VerticalGrid.uniform(nk=6)
    import numpy as np
    import jax.numpy as jnp
    nk = 6
    rng = np.random.default_rng(1)
    h = dn.fill_halos(jnp.asarray(
        300.0 + 10.0 * rng.standard_normal((nk, dn.njh, dn.nih))))
    T = dn.fill_halos(jnp.asarray(
        18.0 - 2.0 * np.arange(nk).reshape(-1, 1, 1)
        + 0.3 * rng.standard_normal((nk, dn.njh, dn.nih))))
    S = dn.fill_halos(jnp.full((nk, dn.njh, dn.nih), 35.0))
    base = PressureForceCfg(quad_points=5)
    rec = dataclasses.replace(base, reconstruct=True)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    for eos_name, expect_same in (("LINEAR", True), ("WRIGHT", False)):
        eos = make_eos(eos_name)
        r0 = pressure_force(g, vg, h, T, S, eos, cfg=base)
        r1 = pressure_force(g, vg, h, T, S, eos, cfg=rec)
        a = np.asarray(r0.PFu)[sl]
        b = np.asarray(r1.PFu)[sl]
        if expect_same:
            np.testing.assert_allclose(b, a, atol=1e-10)
        else:
            assert not np.allclose(b, a), \
                "reconstruction inert with a nonlinear EOS"


def test_reconstruct_wired_into_model():
    """RECONSTRUCT_FOR_PRESSURE defaults on with USE_REGRIDDING and
    changes the simulated state with a nonlinear EOS; turning it off
    recovers the constant-by-layer PGF."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    import numpy as np
    CFG = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 6
DT = 600.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
REENTRANT_X = True
TOPO_CONFIG = spoon
MINIMUM_DEPTH = 300.0
MAXIMUM_DEPTH = 1200.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 8.0
EQN_OF_STATE = WRIGHT
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
BUOY_CONFIG = zero
"""

    def run(extra):
        m = build_model(ParamFile(text=CFG + extra))
        step = m.step_fn()
        s, a, tr = m.state, m.split_state, m.tracers
        for k in range(3):
            s, a, tr = step(s, a, tr, n=k)
        return np.asarray(m.domain.interior(s.u))

    u_on = run("")                                   # default: on
    u_off = run("RECONSTRUCT_FOR_PRESSURE = False\n")
    assert np.isfinite(u_on).all() and np.isfinite(u_off).all()
    assert not np.allclose(u_on, u_off), \
        "PGF reconstruction is inert in the model"
