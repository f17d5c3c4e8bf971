import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.param.vertical.shear_mixing import (ShearMixingCfg,
                                                  shear_mixing_coeffs,
                                                  richardson_number)
from mom6_tpu.param.vertical.conv_ddiff import (ConvectionCfg,
                                                convection_coeffs,
                                                DoubleDiffusionCfg,
                                                ddiff_coeffs)
from mom6_tpu.param.vertical.bkgnd_mixing import (BkgndMixingCfg,
                                                  bkgnd_mixing_coeffs)
from mom6_tpu.param.vertical.kpp import KPPCfg, kpp_coefficients
from mom6_tpu.param.vertical.set_diffusivity import (DiffusivityCfg,
                                                     set_diffusivity)
from mom6_tpu.diagnostics.wave_speed import brunt_vaisala2
from mom6_tpu.eos import LinearEOS


def col(a, shape3=True):
    a = np.asarray(a, dtype=np.float64)
    return jnp.asarray(a).reshape(-1, 1, 1)


EOS = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)
VG = VerticalGrid.uniform(nk=6, gint=0.01)


def test_shear_mixing_activates_at_low_ri():
    h = col([20.0] * 6)
    # strong shear, weak stratification → low Ri → strong mixing
    u = col(np.linspace(1.0, -1.0, 6))
    v = jnp.zeros_like(u)
    T = col(np.linspace(10.0, 9.9, 6))
    S = col([35.0] * 6)
    n2 = brunt_vaisala2(VG, h, T, S, EOS)
    cfg = ShearMixingCfg(scheme="LMD94", nu_zero=5e-3)
    kd = shear_mixing_coeffs(cfg, u, v, h, n2)
    assert float(jnp.max(kd)) > 1e-3
    # strong stratification kills it
    T2 = col(np.linspace(20.0, 4.0, 6))
    n2b = brunt_vaisala2(VG, h, T2, S, EOS)
    ri = richardson_number(u, v, h, n2b)
    kd2 = shear_mixing_coeffs(cfg, u, v, h, n2b)
    assert float(jnp.max(kd2)) < float(jnp.max(kd))


def test_convection_on_unstable_column():
    h = col([20.0] * 6)
    T_stable = col(np.linspace(20.0, 4.0, 6))
    T_unstable = col(np.linspace(4.0, 20.0, 6))   # cold over warm
    S = col([35.0] * 6)
    cfg = ConvectionCfg(kd_conv=1.0)
    n2_s = brunt_vaisala2(VG, h, T_stable, S, EOS)
    n2_u = brunt_vaisala2(VG, h, T_unstable, S, EOS)
    # brunt_vaisala2 clips at 0; use raw drho for the unstable case
    assert float(jnp.max(convection_coeffs(cfg, n2_s - 1e-12))) == 0.0
    kc = convection_coeffs(cfg, n2_u - 1e-12)   # n2_u==0 → convecting
    assert float(jnp.min(kc)) == 1.0


def test_ddiff_salt_fingering_regime():
    h = col([20.0] * 6)
    # warm salty over cool fresh: destabilizing S, stabilizing T
    T = col(np.linspace(20.0, 10.0, 6))
    S = col(np.linspace(36.5, 35.0, 6))
    p = jnp.zeros_like(h[1:])
    kd_T, kd_S = ddiff_coeffs(DoubleDiffusionCfg(), T, S, p, EOS)
    assert float(jnp.max(kd_S)) > 0.0
    assert float(jnp.max(kd_S)) >= float(jnp.max(kd_T))


def test_bryan_lewis_profile():
    h = col([500.0] * 8)
    cfg = BkgndMixingCfg(scheme="bryan_lewis", kd=1e-5,
                         bl_kd_deep=1.3e-4, bl_depth=2500.0)
    kd = bkgnd_mixing_coeffs(cfg, h)
    prof = np.asarray(kd).ravel()
    # shallow ≈ kd, deep ≈ kd_deep, monotonic increase
    assert prof[1] < 3e-5
    assert prof[-2] > 1e-4
    assert np.all(np.diff(prof[1:-1]) >= -1e-12)


def test_kpp_bld_detects_mixed_layer():
    """A well-mixed warm layer over a stratified interior: BLD should
    land near the mixed-layer base."""
    h = col([10.0] * 10)
    T = col([15.0, 15.0, 15.0, 15.0, 10.0, 8.0, 7.0, 6.5, 6.2, 6.0])
    S = col([35.0] * 10)
    u = jnp.zeros_like(h)
    v = jnp.zeros_like(h)
    res = kpp_coefficients(KPPCfg(), u, v, h, T, S, EOS, 1027.0, 9.8,
                           ustar=jnp.full_like(h[0], 0.01))
    bld = float(res.bld[0, 0])
    assert 25.0 < bld < 60.0, f"BLD={bld}"
    # diffusivity peaks inside the boundary layer, zero at surface
    kd = np.asarray(res.kd_int).ravel()
    assert kd[0] == 0.0
    assert kd[1:5].max() > 1e-3


def test_set_diffusivity_assembly():
    h = col([20.0] * 6)
    T = col(np.linspace(10.0, 9.9, 6))
    S = col([35.0] * 6)
    u = col(np.linspace(1.0, -1.0, 6))
    v = jnp.zeros_like(u)
    cfg = DiffusivityCfg(kd=1e-5, use_shear=True,
                         shear=ShearMixingCfg(nu_zero=5e-3))
    res = set_diffusivity(h, cfg, vgrid=VG, u=u, v=v, T=T, S=S, eos=EOS)
    kd = np.asarray(res.kd_int).ravel()
    assert kd[0] == 0.0 and kd[-1] == 0.0
    assert kd[1:-1].max() > 1e-3          # shear contribution
    assert kd[1:-1].min() >= 1e-5 - 1e-15  # background floor


def test_lotw_bbl_diffusivity():
    """USE_LOTW_BBL_DIFFUSIVITY (add_LOTW_BBL_diffusivity): bottom
    flow drives near-bottom mixing that decays upward, and the TKE
    spent never exceeds the bottom-drag input."""
    import dataclasses as _dc
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.param.vertical.set_diffusivity import (
        DiffusivityCfg, lotw_bbl_diffusivity)
    nk, nj, ni = 12, 2, 2
    h = jnp.full((nk, nj, ni), 100.0)
    n2 = jnp.full((nk - 1, nj, ni), 1e-6)
    u = jnp.zeros((nk, nj, ni)).at[-1].set(0.3)   # bottom current
    v = jnp.zeros((nk, nj, ni))
    cfg = DiffusivityCfg(use_lotw_bbl=True)
    absf = jnp.full((nj, ni), 1e-4)
    kd = np.asarray(lotw_bbl_diffusivity(cfg, h, n2, u, v, absf))
    assert kd.shape[0] == nk - 1
    # bottom-intensified: the deepest interface mixes hardest
    col = kd[:, 0, 0]
    assert col[-1] > 0.0
    assert col[-1] >= col[0]
    assert np.all(col >= 0.0)
    # energy audit: sum(kd*N2*dz_int) <= BBL_EFFIC*cdrag^{3/2}|u|^3
    dz_int = 100.0
    spent = float((col * 1e-6 * dz_int).sum())
    budget = 0.2 * 0.003 ** 1.5 * 0.3 ** 3
    assert spent <= budget * (1.0 + 1e-9)
    # no bottom flow -> no mixing
    kd0 = np.asarray(lotw_bbl_diffusivity(
        cfg, h, n2, jnp.zeros_like(u), v, absf))
    np.testing.assert_allclose(kd0, 0.0, atol=1e-15)


def test_ml_radiation_diffusivity():
    """ML_RADIATION (add_MLrad_diffusivity): mixed-layer TKE radiates
    below the MLD, decaying with depth; nothing above the base."""
    import jax.numpy as jnp
    import numpy as np
    from mom6_tpu.param.vertical.set_diffusivity import (
        DiffusivityCfg, mlrad_diffusivity)
    nk, nj, ni = 12, 2, 2
    h = jnp.full((nk, nj, ni), 50.0)
    n2 = jnp.full((nk - 1, nj, ni), 1e-5)
    ustar = jnp.full((nj, ni), 0.02)
    mld = jnp.full((nj, ni), 150.0)
    absf = jnp.full((nj, ni), 1e-4)
    cfg = DiffusivityCfg(ml_radiation=True)
    kd = np.asarray(mlrad_diffusivity(cfg, h, n2, ustar, mld, absf))
    col = kd[:, 0, 0]
    # zero at/above the ML base (interfaces at 50, 100, 150 m)
    np.testing.assert_allclose(col[:2], 0.0, atol=1e-15)
    # first below-base interface mixes, decaying downward
    assert col[3] > 0.0
    assert col[3] > col[6] > col[9]
    assert col.max() <= cfg.ml_rad_kd_max + 1e-15
    # stronger winds radiate more energy
    kd2 = np.asarray(mlrad_diffusivity(cfg, h, n2, 2.0 * ustar, mld,
                                       absf))
    assert kd2[4, 0, 0] > col[4]


def test_ml_radiation_in_model():
    """ML_RADIATION wires from MOM_input through diabatic using the
    previous step's KPP MLD and the wind ustar."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    import numpy as np
    import jax.numpy as jnp
    text = """
NIGLOBAL = 12
NJGLOBAL = 12
NK = 6
DT = 900.0
DAYMAX = 0.05
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 120.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 1200.0
F_0 = 1.0e-4
REENTRANT_X = True
TS_CONFIG = linear
T_RANGE = 8.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.2
USE_KPP = True
KD = 1.0e-5
ML_RADIATION = True
"""
    m = build_model(ParamFile(text=text))
    assert m.ocean_cfg.diabatic.diffusivity.ml_radiation
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    assert np.all(np.isfinite(np.asarray(m.domain.interior(s.T))))
