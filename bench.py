"""Benchmark: flagship FULL ocean step throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric is wet grid-points processed per second per chip
for the full model step — split RK2 dynamics + thermodynamics (KPP +
background mixing + surface restoring) + GM thickness diffusion + MLE
restratification + T/S/age tracer advection + lateral tracer diffusion
+ Z* ALE regrid/remap — i.e. step_ocean, not just the dynamical core.
The dyn-core-only number is reported alongside for continuity with
round 1.  vs_baseline normalizes by the BASELINE.json 50M points/s
placeholder (the reference publishes no absolute numbers).
"""

from __future__ import annotations

import json
import time


CONFIG = """
NIGLOBAL = 512
NJGLOBAL = 512
NK = 25
DT = 600.0
DT_THERM = 1200.0
DAYMAX = 1.0
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 5120.0
LENLAT = 5120.0
REENTRANT_X = True
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 4000.0
F_0 = 1.0e-4
BETA = 2.0e-11
TS_CONFIG = linear
T_RANGE = 12.0
EQN_OF_STATE = WRIGHT
BULKMIXEDLAYER = False
USE_REGRIDDING = True
REGRIDDING_COORDINATE_MODE = Z*
KD = 1.0e-5
USE_KPP = True
KHTH = 600.0
KHTR = 600.0
MIXEDLAYER_RESTRAT = True
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
BUOY_CONFIG = linear_restoring
RESTOREBUOY = True
FLUXCONST = 0.5
USE_IDEAL_AGE_TRACER = True
BIHARMONIC = True
SMAGORINSKY_AH = True
SMAG_BI_CONST = 0.06
"""


def _bench(step_fn, state, split, tracers, nsteps, n0=0):
    import jax
    # warmup: compile thermo/non-thermo × parity × (mld None/array)
    # variants before timing
    s, a, tr = state, split, tracers
    for k in range(4):
        s, a, tr = step_fn(s, a, tr, n=k)
    jax.block_until_ready(s.h)
    t0 = time.perf_counter()
    for k in range(nsteps):
        s, a, tr = step_fn(s, a, tr, n=4 + n0 + k)
    jax.block_until_ready(s.h)
    return time.perf_counter() - t0


def main():
    import jax
    # persistent compile cache: the first bench after a source change
    # pays the big-graph compiles once; subsequent runs (including the
    # driver's) replay them from disk
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    m = build_model(ParamFile(text=CONFIG))
    ni, nj, nk = m.domain.ni, m.domain.nj, m.vgrid.nk
    nsteps = 12
    wall_full = _bench(m.step_fn(), m.state, m.split_state, m.tracers,
                       nsteps)
    pts_full = ni * nj * nk * nsteps / wall_full

    # dyn-core-only comparison config (round-1 metric)
    dyn_cfg = CONFIG.replace("ENABLE_THERMODYNAMICS = True", "") \
        + ("ADIABATIC = True\n#override USE_REGRIDDING = False\n"
           "#override KHTR = 0.0\n#override KHTH = 0.0\n"
           "#override MIXEDLAYER_RESTRAT = False\n"
           "#override USE_IDEAL_AGE_TRACER = False\n"
           "#override USE_KPP = False\n#override BUOY_CONFIG = zero\n")
    m2 = build_model(ParamFile(text=dyn_cfg))
    wall_dyn = _bench(m2.step_fn(), m2.state, m2.split_state,
                      m2.tracers, nsteps)
    pts_dyn = ni * nj * nk * nsteps / wall_dyn

    print(json.dumps({
        "metric": "full ocean step grid-points/s/chip "
                  "(512x512x25 fp32: split RK2 + KPP thermo + GM + "
                  "MLE + tracers + Z* ALE)",
        "value": round(pts_full, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_full / 50e6, 3),
        "dyn_core_only_points_per_s": round(pts_dyn, 1),
        "full_step_ms": round(1e3 * wall_full / nsteps, 2),
        "dyn_step_ms": round(1e3 * wall_dyn / nsteps, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:          # noqa: BLE001
        # emit a parseable record even when the TPU tunnel is down so
        # the driver logs the infrastructure failure rather than an
        # empty file
        print(json.dumps({
            "metric": "full ocean step grid-points/s/chip",
            "value": 0.0, "unit": "points/s", "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}"[:300],
        }))
        raise
