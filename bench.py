"""Benchmark: flagship dynamics step throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: wet grid-points processed per second per chip for the full
dynamics step (the reference publishes no absolute numbers — see
BASELINE.md — so vs_baseline is points/s normalized by the BASELINE.json
north-star placeholder of 50M points/s/chip for a full dyn step).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.core.vertical_grid import VerticalGrid
    from mom6_tpu.core.state import State
    from mom6_tpu.core.forcing import MechForcing
    from mom6_tpu.core.dynamics_split_rk2 import (
        SplitCfg, init_split_state, step_dyn_split_rk2)
    from mom6_tpu.core.barotropic import BarotropicCfg
    from mom6_tpu.core.vert_friction import VertViscCfg
    from mom6_tpu.param.lateral.hor_visc import HorViscCfg

    # benchmark-class config: 1/4-degree-like regional tile per chip,
    # production split RK2 path with a 27-substep barotropic subcycle
    ni, nj, nk = 512, 512, 25
    dt = 600.0
    d = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True)
    g = cartesian_grid(d, lenlon_km=ni * 10.0, lenlat_km=nj * 10.0,
                       f0=1e-4, beta=2e-11, max_depth=4000.0)
    vg = VerticalGrid.uniform(nk=nk, gint=0.005)
    cfg = SplitCfg(vertvisc=VertViscCfg(kv=1e-4),
                   horvisc=HorViscCfg(biharmonic=True,
                                      smag_bi_const=0.06, dt=dt),
                   barotropic=BarotropicCfg(nstep=27))
    shape = (nk, nj + 8, ni + 8)
    dtype = jnp.float32
    h = d.fill_halos(jnp.full(shape, 4000.0 / nk, dtype))
    state = State(u=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                  h=h)
    split = init_split_state(d, g, vg, state)
    forces = MechForcing(taux=(0.1 * g.mask2dCu).astype(dtype))

    @jax.jit
    def step(s, a):
        s2, a2, _ = step_dyn_split_rk2(d, g, vg, s, a, forces, dt, cfg)
        return s2, a2

    # warmup/compile
    state, split = step(state, split)
    jax.block_until_ready(state)

    nsteps = 20
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state, split = step(state, split)
    jax.block_until_ready(state)
    dt_wall = time.perf_counter() - t0

    points = ni * nj * nk * nsteps
    pps = points / dt_wall
    print(json.dumps({
        "metric": "split-RK2 step grid-points/s/chip (512x512x25 fp32)",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / 50e6, 3),
    }))


if __name__ == "__main__":
    main()
