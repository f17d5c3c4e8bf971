"""Toggle-delta phase breakdown of the dyn-core bench config on TPU.

The xplane profiler is unreliable through the axon tunnel (device
times exceed un-profiled wall time and op scopes are stripped), so
phase costs are attributed by differencing config toggles: each
variant disables exactly one phase (or changes its intensity) and the
wall-clock delta against the base is that phase's cost.

Writes one JSON line per variant (streamed, so partial results
survive); finish with the derived breakdown table.
"""

import json
import sys
import time


def run(tag, cfg_text, nsteps=10):
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
    ms = 1e3 * wall / nsteps
    print(json.dumps({"tag": tag, "ms_per_step": round(ms, 2),
                      "nstep_bt": m.split_cfg.barotropic.nstep}),
          flush=True)
    return ms


def main():
    sys.path.insert(0, "/root/repo")
    from bench import CONFIG

    DYN = CONFIG + (
        "ADIABATIC = True\n#override USE_REGRIDDING = False\n"
        "#override KHTR = 0.0\n#override KHTH = 0.0\n"
        "#override MIXEDLAYER_RESTRAT = False\n"
        "#override USE_IDEAL_AGE_TRACER = False\n"
        "#override USE_KPP = False\n#override BUOY_CONFIG = zero\n"
        "#override RESTOREBUOY = False\n")

    only = sys.argv[1:] or None
    variants = [
        ("dyn_base", ""),
        ("no_pallas_bt", "BT_USE_PALLAS = False\n"),
        ("no_bt_cont", "#override USE_BT_CONT_TYPE = False\n"),
        ("nstep9", "#override DTBT = 67.0\n"),       # 600/67 -> 9
        ("no_biharm", "#override BIHARMONIC = False\n"
                      "#override SMAGORINSKY_AH = False\n"),
        ("static_bbl", "DYNAMIC_BBL = False\n"),
        ("pgf_midpoint", "PGF_QUAD_POINTS = 1\n"),
        ("dt_therm_12x", "#override DT_THERM = 7200.0\n"),
        ("no_ts_advect", "#override ENABLE_THERMODYNAMICS = False\n"
                         "#override EQN_OF_STATE = LINEAR\n"),
    ]
    out = {}
    for tag, extra in variants:
        if only and tag not in only:
            continue
        try:
            out[tag] = run(tag, DYN + extra)
        except Exception as e:          # noqa: BLE001
            print(json.dumps({"tag": tag,
                              "error": f"{type(e).__name__}: {e}"
                              [:200]}), flush=True)
    if "dyn_base" in out:
        base = out["dyn_base"]
        print("# deltas vs dyn_base (positive = phase cost):",
              flush=True)
        for tag, ms in out.items():
            if tag != "dyn_base":
                print(f"#   {tag:16s} {ms - base:+7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
