"""Direct per-phase timing: jit each dyn-core phase standalone on
realistic 512x512x25 inputs and time it on the device.

Unlike the toggle-delta probes (which measure a phase's marginal cost
inside the fused step graph), this measures each phase as its own XLA
program — attribution is exact, though cross-phase fusion savings are
not visible.  Use both: toggles for "what would removing this save",
direct for "where is the time".

Usage: python tools/phase_direct.py [dyn|full]
"""

import json
import sys
import time


def t(fn, *args, n=20, **kw):
    import jax
    f = jax.jit(fn)
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import CONFIG
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    m = build_model(ParamFile(text=CONFIG))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(2):
        s, a, tr = step(s, a, tr, n=k)
    jax.block_until_ready(s.h)

    d, g, vg = m.domain, m.grid, m.vgrid
    cfg = m.split_cfg
    eos = m.eos
    res = {}

    fillT = lambda f: d.fill_halos(f)
    u = d.fill_halos(s.u)
    v = d.fill_halos(s.v)
    h = d.fill_halos(s.h)
    T = d.fill_halos(s.T)
    S = d.fill_halos(s.S)
    u_av = d.fill_halos(a.u_av)
    v_av = d.fill_halos(a.v_av)
    h_av = d.fill_halos(a.h_av)
    uh = d.fill_halos(a.uh)
    vh = d.fill_halos(a.vh)

    res["fill_halos_3d"] = t(fillT, s.h)
    res["fill_halos_uv"] = t(lambda uu, vv: d.fill_vector_halos(uu, vv),
                             s.u, s.v)

    from mom6_tpu.core.pressure_force import pressure_force
    res["pressure_force"] = t(
        lambda hh, TT, SS: pressure_force(g, vg, hh, TT, SS, eos,
                                          cfg=cfg.pressure), h, T, S)

    from mom6_tpu.core.coriolis_adv import coriolis_adv
    res["coriolis_adv"] = t(
        lambda: coriolis_adv(g, u_av, v_av, h_av, uh, vh, cfg.coriolis))

    from mom6_tpu.param.lateral.hor_visc import horizontal_viscosity
    res["hor_visc"] = t(
        lambda: horizontal_viscosity(g, u_av, v_av, h_av, cfg.horvisc))

    from mom6_tpu.core.vert_friction import (
        vertvisc, vertvisc_coef, vertvisc_remnant, set_viscous_bbl)
    bbl = set_viscous_bbl(g, u, v, h, cfg.vertvisc, vg)
    res["set_viscous_bbl"] = t(
        lambda: set_viscous_bbl(g, u, v, h, cfg.vertvisc, vg))
    coefs = vertvisc_coef(g, u, v, h, cfg=cfg.vertvisc, bbl=bbl)
    res["vertvisc_coef"] = t(
        lambda: vertvisc_coef(g, u, v, h, cfg=cfg.vertvisc, bbl=bbl))
    res["vertvisc_solve"] = t(
        lambda: vertvisc(g, u, v, h, coefs, m.dt, None, None, vg.Rho0))
    res["vertvisc_remnant"] = t(
        lambda: vertvisc_remnant(g, coefs, m.dt))

    from mom6_tpu.core.continuity_ppm import continuity_ppm, set_up_bt_cont
    res["continuity_free"] = t(
        lambda: continuity_ppm(g, vg, u, v, h, m.dt, cfg.continuity))
    uhbt = jnp.sum(uh, axis=0)
    vhbt = jnp.sum(vh, axis=0)
    res["continuity_matched"] = t(
        lambda: continuity_ppm(g, vg, u, v, h, m.dt, cfg.continuity,
                               uhbt=uhbt, vhbt=vhbt))
    res["set_up_bt_cont"] = t(
        lambda: set_up_bt_cont(g, vg, u, v, h, m.dt, cfg.continuity))

    # full btstep through the public entry
    from mom6_tpu.core.barotropic import btstep
    zero3 = jnp.zeros_like(h)
    pbce = jnp.ones_like(h) * 9.8
    res["btstep_linear"] = t(
        lambda: btstep(d, g, vg, u, v, d.fill_halos(a.eta), h,
                       zero3, zero3, pbce, u_av, v_av, m.dt,
                       cfg.barotropic, jnp.ones_like(u),
                       jnp.ones_like(v), None, None))

    # ALE block
    if m.ocean_cfg.ale is not None:
        from mom6_tpu.ale.ale_main import ale_regrid_remap
        age = {"age": T * 0.0}
        res["ale_full"] = t(
            lambda: ale_regrid_remap(g, vg, s.replace(h=h, T=T, S=S,
                                                      u=u, v=v),
                                     m.ocean_cfg.ale, eos=eos, tracers=age,
                                     aux_u={"u_av": u_av,
                                            "diffu": zero3},
                                     aux_v={"v_av": v_av,
                                            "diffv": zero3},
                                     dt=m.dt))

    from mom6_tpu.tracer.advect import advect_tracers, TracerAdvectCfg
    trd = {"T": T, "S": S, "age": T * 0.0}
    res["tracer_advect_3"] = t(
        lambda: advect_tracers(d, g, trd, h, m.dt * uh, m.dt * vh,
                               TracerAdvectCfg()))

    for k, v_ in res.items():
        print(json.dumps({"phase": k, "ms": round(v_, 3)}), flush=True)


if __name__ == "__main__":
    main()
