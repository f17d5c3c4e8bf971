"""Ice-shelf-only driver.

Re-design of /root/reference/config_src/drivers/ice_solo_driver/
ice_shelf_driver.F90: build the horizontal grid and an ice-shelf
thickness profile from a MOM_input-style config, then loop the SSA
dynamics + advective thickness update without an ocean, writing a
shelf.stats series (total ice volume, max speed) and the final
thickness field.

Usage:  python -m mom6_tpu.drivers.shelf_solo CASE_DIR [--days D]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="mom6_tpu ice-shelf driver")
    ap.add_argument("case_dir")
    ap.add_argument("--days", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp

    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.framework.io import write_fields
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.grid import cartesian_grid
    from mom6_tpu.ice_shelf.shelf_main import (
        ShelfCfg, ShelfState, step_shelf, init_shelf_thickness)
    from mom6_tpu.ice_shelf.dynamics import SSACfg

    pf = ParamFile(os.path.join(args.case_dir, "MOM_input"))
    ni = pf.get("NIGLOBAL", int)
    nj = pf.get("NJGLOBAL", int)
    lenlon = pf.get("LENLON", float, float(ni))
    lenlat = pf.get("LENLAT", float, float(nj))
    west = pf.get("WESTLON", float, 0.0)
    dt = pf.get("DT_ICE_DYNAMICS", float, pf.get("DT", float, 86400.0),
                units="s")
    daymax = args.days if args.days is not None \
        else pf.get("DAYMAX", float, 1.0)
    d = Domain(ni=ni, nj=nj, halo=4)
    grid = cartesian_grid(
        d, lenlon_km=lenlon, lenlat_km=lenlat, f0=0.0, beta=0.0,
        depth_fn=lambda lo, la: np.full_like(la, 1000.0),
        max_depth=1000.0)
    cfg = ShelfCfg(
        ssa=SSACfg(
            glen_a=pf.get("A_GLEN_ISOTHERM", float, 2.4e-24,
                          units="Pa-3 s-1"),
            basal_beta=pf.get("BASAL_FRICTION_COEFF", float, 0.0),
            # grounded-ice friction law (MOM_ice_shelf_dynamics.F90
            # :489-508): Weertman power law, Coulomb-limited option
            c_basal=pf.get("C_BASAL_FRICTION", float, 0.0,
                           units="Pa (m s-1)^-n"),
            n_basal=pf.get("BASAL_FRICTION_EXP", float, 1.0),
            coulomb=pf.get("USE_COULOMB_FRICTION", bool, False),
            cf_min_n=pf.get("CF_MinN", float, 1.0, units="Pa"),
            cf_post_peak=pf.get("CF_PostPeak", float, 1.0),
            cf_max=pf.get("CF_Max", float, 0.5)),
        dynamic=True,
        advance_front=pf.get("SHELF_ADVANCE_FRONT", bool, True))
    h0 = init_shelf_thickness(
        pf.get("ICE_PROFILE_CONFIG", str, "channel"), grid,
        max_thick=pf.get("SHELF_MAX_THICKNESS", float, 500.0,
                         units="m"),
        lon_extent=pf.get("SHELF_LENGTH_LON", float, 0.5 * lenlon),
        west=west, halo=d.halo)
    # bed elevation (depth below sea level) from the ocean bathymetry
    # drives the grounding-line flotation test
    bed = grid.bathyT if pf.get("SHELF_GROUNDING", bool, True) \
        else None
    shelf = ShelfState(
        h_shelf=h0,
        area_frac=(h0 > cfg.min_thickness).astype(h0.dtype),
        bed_elev=bed)
    pf.close(fatal_unused=False)

    nsteps = max(1, int(round(daymax * 86400.0 / dt)))
    area = grid.areaT
    stats_path = os.path.join(args.case_dir, "shelf.stats")
    u = v = None
    with open(stats_path, "w") as f:
        f.write("# step, day, ice volume [m3], max speed [m a-1]\n")
    wall0 = time.perf_counter()
    jstep = jax.jit(lambda s, u0, v0: step_shelf(d, grid, s, cfg, dt,
                                                 u0=u0, v0=v0))
    for n in range(nsteps):
        res = jstep(shelf, u, v)
        shelf, u, v = res.state, res.u, res.v
        if n % max(1, nsteps // 8) == 0 or n == nsteps - 1:
            vol = float(jnp.sum(d.interior(shelf.h_shelf * area)))
            spd = float(jnp.max(jnp.sqrt(u * u + v * v))) * 3.15e7
            line = f"{n + 1}, {(n + 1) * dt / 86400.0:.3f}, " \
                f"{vol:.8e}, {spd:.4f}\n"
            with open(stats_path, "a") as f:
                f.write(line)
            print(line, end="")
    wall = time.perf_counter() - wall0
    print(f"shelf run complete: {nsteps} steps, {wall:.2f}s wall")
    write_fields(os.path.join(args.case_dir, "shelf_final.nc"),
                 {"thick": np.asarray(d.interior(shelf.h_shelf)),
                  "u": np.asarray(d.interior(u)),
                  "v": np.asarray(d.interior(v))})


if __name__ == "__main__":
    main()
