"""Perf bisection: walk from the full bench config to the dyn-only
config one toggle at a time, timing each variant on the TPU.

Writes one JSON line per variant to stdout as it goes (so partial
results survive a timeout)."""

import json
import sys
import time


def run(tag, cfg_text, nsteps=8):
    import jax
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    m = build_model(ParamFile(text=cfg_text))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    for k in range(nsteps):
        s, a, tr = step(s, a, tr, n=4 + k)
    jax.block_until_ready(s.h)
    wall = time.perf_counter() - t0
    ni, nj, nk = m.domain.ni, m.domain.nj, m.vgrid.nk
    print(json.dumps({
        "tag": tag, "ms_per_step": round(1e3 * wall / nsteps, 2),
        "pts_per_s": round(ni * nj * nk * nsteps / wall / 1e6, 1),
        "nstep_bt": m.split_cfg.barotropic.nstep,
    }), flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from bench import CONFIG

    steps = [
        ("full", ""),
        ("-buoy", "#override BUOY_CONFIG = zero\n"
                  "#override RESTOREBUOY = False\n"),
        ("-tracer", "#override USE_IDEAL_AGE_TRACER = False\n"),
        ("-khtr", "#override KHTR = 0.0\n"),
        ("-mle", "#override MIXEDLAYER_RESTRAT = False\n"),
        ("-khth", "#override KHTH = 0.0\n"),
        ("-kpp", "#override USE_KPP = False\n"),
        ("+adiabatic", "ADIABATIC = True\n"),
        ("-ale", "#override USE_REGRIDDING = False\n"),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    acc = ""
    for tag, extra in steps:
        acc += extra
        if only and tag not in only:
            continue
        run(tag, CONFIG + acc)


if __name__ == "__main__":
    main()
