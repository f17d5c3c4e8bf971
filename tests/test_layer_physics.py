import numpy as np
import jax.numpy as jnp

from mom6_tpu.param.vertical.entrain_diffusive import (
    EntrainDiffusiveCfg, entrainment_diffusive)
from mom6_tpu.param.vertical.bulk_mixed_layer import (
    BulkMixedLayerCfg, bulk_mixed_layer)
from mom6_tpu.param.vertical.regularize_layers import (
    RegularizeLayersCfg, regularize_layers)
from mom6_tpu.eos import LinearEOS

EOS = LinearEOS(rho_t0_s0=1027.0, drho_dt=-0.2, drho_ds=0.8)


def col(a):
    return jnp.asarray(np.asarray(a, dtype=np.float64)).reshape(-1, 1, 1)


def test_entrain_diffusive_conserves_and_smooths():
    """Explicit donor-limited scheme: relaxes toward uniform."""
    h = col([10.0, 150.0, 40.0, 200.0])
    dye = col([1.0, 0.0, 0.5, 0.2])
    kd = jnp.full((5, 1, 1), 1e-3)
    cfg = EntrainDiffusiveCfg(implicit=False)
    tot_h0 = float(jnp.sum(h))
    tot_c0 = float(jnp.sum(h * dye))
    tr = {"dye": dye}
    for _ in range(200):
        h, tr, _ = entrainment_diffusive(cfg, h, kd, 1800.0, tr)
    assert abs(float(jnp.sum(h)) - tot_h0) / tot_h0 < 1e-12
    tot_c1 = float(jnp.sum(h * tr["dye"]))
    assert abs(tot_c1 - tot_c0) / tot_c0 < 1e-12
    # thickness profile relaxes toward uniform
    hv = np.asarray(h).ravel()
    assert hv.std() < np.asarray(col([10.0, 150, 40, 200])).std()
    assert np.all(hv > 10.0)          # the thin layer inflated


def test_entrain_diffusive_implicit_solves_flux_relation():
    """Hallberg-2000 implicit scheme (the default): away from the
    minF/maxF caps, the converged flux satisfies
    F_k·h_k^new = dtKd_k with uniform density ratios
    (MOM_entrain_diffusive.F90:554-560), and the update conserves
    mass/tracer exactly while depleting no layer below Angstrom."""
    import jax
    h = col([10.0, 150.0, 40.0, 200.0])
    dye = col([1.0, 0.0, 0.5, 0.2])
    kd = jnp.full((5, 1, 1), 1e-3)
    cfg = EntrainDiffusiveCfg(max_ent_it=8)
    assert cfg.implicit

    # the flux relation itself, via the internal solver
    from mom6_tpu.param.vertical.entrain_diffusive import _implicit_F
    dtkd = 1800.0 * 0.5 * (kd[:-1] + kd[1:])
    ones = jnp.ones_like(h)
    dd = ones.at[-1].set(0.0)
    F = _implicit_F(cfg, h, dtkd, dd, dd)
    Fm = jnp.concatenate([jnp.zeros_like(F[:1]), F[:-1]])
    Fp = jnp.concatenate([F[1:], jnp.zeros_like(F[:1])])
    h_new = h + 2.0 * F - Fm - Fp
    resid = np.asarray(F * h_new - dtkd).ravel()[1:-1]
    np.testing.assert_allclose(resid, 0.0, atol=1e-10)

    # multi-step conservation + Angstrom bound + interior smoothing
    step = jax.jit(lambda h, tr: entrainment_diffusive(
        cfg, h, kd, 1800.0, tr))
    tot_h0 = float(jnp.sum(h))
    tot_c0 = float(jnp.sum(h * dye))
    tr = {"dye": dye}
    for _ in range(50):
        h, tr, _ = step(h, tr)
    assert abs(float(jnp.sum(h)) - tot_h0) / tot_h0 < 1e-11
    tot_c1 = float(jnp.sum(h * tr["dye"]))
    assert abs(tot_c1 - tot_c0) / tot_c0 < 1e-11
    hv = np.asarray(h).ravel()
    assert np.all(hv > 0.9 * cfg.angstrom)
    # the thin interior layer (40 m) inflates from its thick
    # neighbors; the boundary layers thin (no flux through the
    # surface/bottom — the reference's behavior absent a BML)
    assert hv[2] > 40.0


def test_entrain_diffusive_zero_kd_identity():
    h = col([10.0, 150.0, 40.0])
    kd = jnp.zeros((4, 1, 1))
    h1, _, f = entrainment_diffusive(EntrainDiffusiveCfg(), h,
                                     kd, 1800.0)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h))
    assert float(jnp.max(jnp.abs(f))) == 0.0


def test_bulk_mixed_layer_deepens_and_conserves():
    h = col([10.0, 20.0, 30.0, 100.0])
    T = col([18.0, 16.0, 12.0, 6.0])
    S = jnp.full_like(T, 35.0)
    ustar = jnp.full((1, 1), 0.02)
    bflux = jnp.zeros((1, 1))
    cfg = BulkMixedLayerCfg()
    heat0 = float(jnp.sum(h * T))
    h1, T1, S1, _, hml = bulk_mixed_layer(cfg, h, T, S, EOS, ustar,
                                          bflux, dt=86400.0)
    assert float(jnp.sum(h1)) == float(jnp.sum(h))
    assert abs(float(jnp.sum(h1 * T1)) - heat0) / heat0 < 1e-12
    # ML deepened beyond the initial surface layer and cooled
    assert float(hml[0, 0]) > 10.0
    assert float(T1[0, 0, 0]) < 18.0
    # stronger wind mixes deeper
    h2, T2, _, _, hml2 = bulk_mixed_layer(cfg, h, T, S, EOS,
                                          jnp.full((1, 1), 0.05),
                                          bflux, dt=86400.0)
    assert float(hml2[0, 0]) > float(hml[0, 0])


def test_bulk_mixed_layer_no_forcing_identity():
    h = col([10.0, 20.0, 30.0])
    T = col([18.0, 16.0, 12.0])
    S = jnp.full_like(T, 35.0)
    h1, T1, _, _, hml = bulk_mixed_layer(
        BulkMixedLayerCfg(), h, T, S, EOS, jnp.zeros((1, 1)),
        jnp.zeros((1, 1)), dt=3600.0)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h))
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T))
    assert float(hml[0, 0]) == 10.0


def test_regularize_layers_heals_thin_surface():
    h = col([1e-3, 1e-3, 120.0, 200.0])
    dye = col([1.0, 0.8, 0.1, 0.0])
    cfg = RegularizeLayersCfg(h_def=0.5)
    tot0 = float(jnp.sum(h))
    c0 = float(jnp.sum(h * dye))
    h1, tr = regularize_layers(cfg, h, {"dye": dye})
    assert abs(float(jnp.sum(h1)) - tot0) / tot0 < 1e-12
    c1 = float(jnp.sum(h1 * tr["dye"]))
    assert abs(c1 - c0) / max(abs(c0), 1e-30) < 1e-10
    hv = np.asarray(h1).ravel()
    assert hv[0] > 0.1 and hv[1] > 0.1    # healed
    assert hv[2] < 120.0                  # donor shrank
    # a regular profile is untouched
    h2 = col([10.0, 20.0, 30.0])
    h3, _ = regularize_layers(cfg, h2)
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h2))


def test_diapyc_energy_req_signs_and_scaling():
    from mom6_tpu.diagnostics.diapyc_energy_req import diapyc_energy_req
    h = col([20.0] * 6)
    T_stable = col(np.linspace(18.0, 4.0, 6))
    T_uniform = col([10.0] * 6)
    S = jnp.full_like(T_stable, 35.0)
    kd = jnp.full((7, 1, 1), 1e-4)
    e_stable = float(diapyc_energy_req(h, T_stable, S, kd, 3600.0,
                                       EOS)[0, 0])
    e_unif = float(diapyc_energy_req(h, T_uniform, S, kd, 3600.0,
                                     EOS)[0, 0])
    # mixing stable stratification costs energy; a uniform column is
    # free
    assert e_stable > 0.0
    assert abs(e_unif) < 1e-10 * max(e_stable, 1.0)
    # in the weak-mixing limit the cost is linear in Kd
    e_half = float(diapyc_energy_req(h, T_stable, S, 0.5 * kd, 3600.0,
                                     EOS)[0, 0])
    assert abs(e_half / e_stable - 0.5) < 0.05
    # unstable stratification releases energy (negative requirement)
    e_unst = float(diapyc_energy_req(h, T_stable[::-1], S, kd, 3600.0,
                                     EOS)[0, 0])
    assert e_unst < 0.0


def test_make_frazil_and_find_uv_at_h():
    from mom6_tpu.param.vertical.diabatic_aux import (FrazilCfg,
                                                      make_frazil,
                                                      find_uv_at_h,
                                                      t_freeze)
    cfg = FrazilCfg()
    h = col([20.0] * 4)
    S = jnp.full_like(h, 35.0)
    # top layer 0.5 degC below freezing, rest above
    tf_sfc = float(t_freeze(cfg, 35.0, cfg.rho0 * cfg.g * 10.0))
    T = col([tf_sfc - 0.5, 2.0, 3.0, 4.0])
    T2, frazil = make_frazil(cfg, h, T, S)
    # clamped exactly to the local freezing point, warm layers
    # untouched
    assert abs(float(T2[0, 0, 0]) - tf_sfc) < 1e-12
    np.testing.assert_array_equal(np.asarray(T2[1:]), np.asarray(T[1:]))
    # heat deficit: rho0 cp * 0.5degC * 20 m
    expect = cfg.rho0 * cfg.cp * 0.5 * 20.0
    assert abs(float(frazil[0, 0]) - expect) / expect < 1e-12
    # already-warm column: no frazil
    _, fr0 = make_frazil(cfg, h, col([2.0] * 4), S)
    assert float(fr0[0, 0]) == 0.0

    # velocity averaging: uniform u → uniform u_h; thickness weights
    u = jnp.full((2, 6, 8), 0.4)
    v = jnp.full((2, 6, 8), -0.2)
    hh = jnp.full((2, 6, 8), 50.0)
    uh, vh = find_uv_at_h(u, v, hh)
    np.testing.assert_allclose(np.asarray(uh), 0.4, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vh), -0.2, rtol=1e-12)


def test_direct_stress_spreads_momentum_over_hmix():
    """DIRECT_STRESS (MOM_vert_friction.F90:666-683): the wind's
    momentum input is identical, but it lands as a body force over
    the top HMIX_STRESS instead of at the surface — with weak
    viscosity, layer 2 (inside Hmix) accelerates immediately while
    the surface-BC run leaves it still."""
    import numpy as np
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vert_friction import (VertViscCfg,
                                             vertvisc_coef, vertvisc)

    d = Domain(ni=8, nj=8, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=80.0, lenlat_km=80.0,
                       max_depth=1000.0)
    h = jnp.full((5, d.njh, d.nih), 30.0)
    u = jnp.zeros_like(h)
    taux = 0.1 * g.mask2dCu
    out = {}
    for ds in (False, True):
        cfg = VertViscCfg(kv=1e-6, cdrag=0.0, bottomdraglaw=False,
                          direct_stress=ds, hmix_stress=60.0)
        coefs = vertvisc_coef(g, u, u, h, cfg=cfg)
        un, _ = vertvisc(g, u, u, h, coefs, 600.0, taux, None,
                         1035.0, direct_stress=ds, hmix_stress=60.0)
        out[ds] = np.asarray(d.interior(un))
    # same total momentum input (sum h*u equal to ~1%)
    m0 = (out[False] * 30.0).sum(0)
    m1 = (out[True] * 30.0).sum(0)
    np.testing.assert_allclose(m1, m0, rtol=2e-2)
    # distribution differs: direct stress reaches layer 2 (30-60 m)
    assert out[True][1].max() > 10.0 * max(out[False][1].max(), 1e-12)
    # and layers below Hmix stay unforced
    assert out[True][3].max() < 1e-6


def test_frazil_deficit_reclaimed_by_warm_water_above():
    """The reference's make_frazil marches the heat deficit UPWARD:
    sub-freezing deep water's deficit is absorbed by warmer layers
    above (cooled toward their own freezing point) before any
    residual surfaces as frazil (MOM_diabatic_aux.F90:150-210) — an
    independent per-layer clamp would instead report the full
    deficit."""
    from mom6_tpu.param.vertical.diabatic_aux import (FrazilCfg,
                                                      make_frazil,
                                                      t_freeze)
    cfg = FrazilCfg()
    h = col([20.0] * 4)
    S = jnp.full_like(h, 35.0)
    # bottom layer 0.1 degC below its freezing point; plenty of warm
    # water above
    tf_bot = float(t_freeze(cfg, 35.0, cfg.rho0 * cfg.g * 70.0))
    T = col([5.0, 4.0, 3.0, tf_bot - 0.1])
    T2, frazil = make_frazil(cfg, h, T, S)
    # the deficit (rho0 cp 0.1 K 20 m) is tiny vs the warm layers'
    # heat content, so it is fully absorbed: no surface frazil
    assert float(frazil[0, 0]) == 0.0
    # bottom clamped to freezing; the layer above absorbed the heat
    # deficit by cooling
    assert abs(float(T2[3, 0, 0]) - tf_bot) < 1e-12
    deficit = 0.1 * 20.0                       # K m
    np.testing.assert_allclose(float(T2[2, 0, 0]),
                               3.0 - deficit / 20.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(T2[:2]), np.asarray(T[:2]))
    # heat conservation: column heat content unchanged when no frazil
    np.testing.assert_allclose(float(jnp.sum(T2 * h)),
                               float(jnp.sum(T * h)), rtol=1e-12)


def test_bt_strong_drag_damps_faster():
    """BT_STRONG_DRAG's harmonic per-substep remnant n r/(1+(n-1)r)
    damps the barotropic velocity more than the geometric r^(1/n)
    over the subcycle (MOM_barotropic.F90:1513)."""
    n, r = 32.0, 0.5
    geo = (r ** (1.0 / n)) ** n
    strong = ((n * r) / (1.0 + (n - 1.0) * r)) ** n
    assert strong < geo
    np.testing.assert_allclose(geo, r, rtol=1e-12)
