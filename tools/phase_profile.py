"""Per-phase TPU device-time breakdown of the bench config.

Captures a jax.profiler trace of a few steps, parses the xplane.pb
device plane, and attributes every XLA-op event to a model phase via
the jax.named_scope prefixes in its op_name metadata.

Usage: python tools/phase_profile.py [dyn|full] [nsteps]
"""

import collections
import glob
import json
import os
import sys
import tempfile
import time


PHASES = ("btstep", "set_up_bt_cont", "continuity", "pressure_force",
          "hor_visc", "coriolis_adv", "set_viscous_bbl",
          "vertvisc_coef", "vertvisc_remnant", "vertvisc_limit_vel",
          "vertvisc", "diabatic", "tracer_advect", "tracer_hordiff",
          "thickness_diffuse", "mle_restrat", "ale")


def group_by_phase(totals):
    g = collections.Counter()
    for name, ps in totals.items():
        hit = None
        for ph in PHASES:
            if f"/{ph}/" in name or name.endswith(f"/{ph}") \
                    or f"/{ph}." in name:
                hit = ph
                break
        g[hit or "other"] += ps
    return g


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import CONFIG
    cfg = CONFIG
    if which == "dyn":
        cfg = CONFIG + (
            "ADIABATIC = True\n#override USE_REGRIDDING = False\n"
            "#override KHTR = 0.0\n#override KHTH = 0.0\n"
            "#override MIXEDLAYER_RESTRAT = False\n"
            "#override USE_IDEAL_AGE_TRACER = False\n"
            "#override USE_KPP = False\n#override BUOY_CONFIG = zero\n")

    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    m = build_model(ParamFile(text=cfg))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(4):
        s, a, tr = step(s, a, tr, n=k)
    jax.block_until_ready(s.h)

    trace_dir = tempfile.mkdtemp(prefix="mom6_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for k in range(nsteps):
            s, a, tr = step(s, a, tr, n=4 + k)
        jax.block_until_ready(s.h)
    wall = time.perf_counter() - t0

    totals = collections.Counter()
    device_total = 0
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                if "XLA Op" not in line.name:
                    continue
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    opname = md.display_name or md.name if md else "?"
                    for st in ev.stats:
                        sm = stat_meta.get(st.metadata_id)
                        nm = sm.name if sm else ""
                        if nm in ("tf_op", "long_name"):
                            v = st.str_value or (
                                stat_meta[st.ref_value].name
                                if st.ref_value else "")
                            if v:
                                opname = v
                    totals[opname] += ev.duration_ps
                    device_total += ev.duration_ps

    g = group_by_phase(totals)
    ms = 1e-9 / nsteps
    rows = sorted(g.items(), key=lambda kv: -kv[1])
    print(f"# {which}: {nsteps} steps, wall {1e3*wall/nsteps:.1f} "
          f"ms/step, device {device_total*ms:.1f} ms/step")
    for ph, ps in rows:
        print(f"{ph:20s} {ps*ms:8.2f} ms/step  "
              f"{100.0*ps/max(device_total,1):5.1f}%")
    # top uncategorized ops
    print("# top 'other' ops:")
    others = sorted(((v, k) for k, v in totals.items()
                     if group_by_phase({k: v}).get("other")),
                    reverse=True)[:12]
    for v, k in others:
        print(f"  {v*ms:8.3f} ms/step  {k[:140]}")
    print(json.dumps({ph: round(ps * ms, 3) for ph, ps in rows}))


if __name__ == "__main__":
    main()
