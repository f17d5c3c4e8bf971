"""CORIOLIS_EN_DIS: energy-dissipating biased Sadourny-energy PV flux
(MOM_CoriolisAdv.F90:590-664,764-784,1087).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mom6_tpu.parallel.domain import Domain
from mom6_tpu.core.grid import cartesian_grid
from mom6_tpu.core.coriolis_adv import CoriolisCfg, coriolis_adv


def _setup(seed=0):
    dn = Domain(ni=16, nj=16, halo=4, reentrant_x=True,
                reentrant_y=True)
    g = cartesian_grid(dn, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       depth_fn=lambda x, y: jnp.full(x.shape, 1000.0),
                       max_depth=1000.0)
    rng = np.random.default_rng(seed)
    nk = 2
    shape = (nk, dn.njh, dn.nih)
    u = dn.fill_halos(jnp.asarray(0.2 * rng.standard_normal(shape)))
    v = dn.fill_halos(jnp.asarray(0.2 * rng.standard_normal(shape)))
    h = dn.fill_halos(jnp.asarray(
        500.0 + 20.0 * rng.standard_normal(shape)))
    # transports from a DIFFERENT (e.g. Newton-corrected) velocity so
    # the centered estimate disagrees with them
    uh = dn.fill_halos(g.dyCu * (u + 0.05) * 0.5 * (h + h))
    vh = dn.fill_halos(g.dxCv * (v - 0.03) * 0.5 * (h + h))
    return dn, g, u, v, h, uh, vh


def test_en_dis_changes_flux_and_dissipates():
    dn, g, u, v, h, uh, vh = _setup()
    cfg0 = CoriolisCfg()
    cfg1 = dataclasses.replace(cfg0, coriolis_en_dis=True)
    r0 = coriolis_adv(g, u, v, h, uh, vh, cfg0)
    r1 = coriolis_adv(g, u, v, h, uh, vh, cfg1)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    assert not np.allclose(np.asarray(r0.CAu)[sl],
                           np.asarray(r1.CAu)[sl])
    # the biased scheme must not INJECT energy through the PV term
    # relative to the energy-conserving flux: the KE tendency of the
    # (q*vh, -q*uh) part is computed by removing the shared grad-KE
    # part (identical in both results)
    dKE0 = (np.asarray(u * (r0.CAu - r1.CAu) * h)[sl].sum()
            + np.asarray(v * (r0.CAv - r1.CAv) * h)[sl].sum())
    # r0 - r1 is (conserving flux - dissipative flux); u·(PV0-PV1)·h
    # summed must be >= 0 up to roundoff when the bias dissipates
    assert dKE0 >= -1e-6 * abs(np.asarray(u * r0.CAu * h)[sl]).sum()


def test_en_dis_inactive_when_transports_consistent():
    """When the continuity transports equal the centered estimate,
    min==max and the biased scheme reduces to the conserving one."""
    dn, g, u, v, h, uh, vh = _setup()
    from mom6_tpu.parallel.stencil import ip1, jp1
    uh_c = 0.5 * g.dyCu * u * (h + ip1(h))
    vh_c = 0.5 * g.dxCv * v * (h + jp1(h))
    cfg0 = CoriolisCfg()
    cfg1 = dataclasses.replace(cfg0, coriolis_en_dis=True)
    r0 = coriolis_adv(g, u, v, h, uh_c, vh_c, cfg0)
    r1 = coriolis_adv(g, u, v, h, uh_c, vh_c, cfg1)
    H = dn.halo
    sl = (slice(None), slice(H, -H), slice(H, -H))
    np.testing.assert_allclose(np.asarray(r1.CAu)[sl],
                               np.asarray(r0.CAu)[sl], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.CAv)[sl],
                               np.asarray(r0.CAv)[sl], rtol=1e-12)
