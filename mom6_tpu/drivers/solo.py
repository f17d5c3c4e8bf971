"""Ocean-only driver: the ``program MOM6`` equivalent.

Re-design of /root/reference/config_src/drivers/solo_driver/
MOM_driver.F90: reads a case directory containing ``MOM_input`` (and
optional ``MOM_override``), builds the model, runs the time loop with
the energy/stats cadence, restart saves, and parameter-doc output.

Usage:  python -m mom6_tpu.drivers.solo CASE_DIR [--days D] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="mom6_tpu solo ocean driver")
    ap.add_argument("case_dir")
    ap.add_argument("--days", type=float, default=None,
                    help="override DAYMAX")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--fp32", action="store_true",
                    help="disable float64 (TPU-native precision)")
    ap.add_argument("--restart-from", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.fp32:
        jax.config.update("jax_enable_x64", True)

    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.framework.restart import (save_restart, restore_restart)
    from mom6_tpu.framework.clock import clock
    from mom6_tpu.framework.error_handler import (MOM_error, WARNING,
                                                  NOTE, set_verbosity)
    from mom6_tpu.model import build_model
    from mom6_tpu.diagnostics.sum_output import (
        stat_sums, collect_stats, format_stats_header, format_stats_line)

    sources = [os.path.join(args.case_dir, "MOM_input")]
    override = os.path.join(args.case_dir, "MOM_override")
    if os.path.exists(override):
        sources.append(override)
    pf = ParamFile(*sources)
    set_verbosity(pf.get("VERBOSITY", int, 2,
                         desc="0 errors, 1 +warnings, 2 +notes"))

    with clock("initialization"):
        model = build_model(pf)
    # diag mediator driven by the case's diag_table
    # (MOM_diag_mediator.F90; DIAG_AS_CHKSUM replaces binary output
    # with bitcount checksum lines, the reference's layout-test mode)
    pf.module("MOM_diag_mediator")
    as_chksum = pf.get("DIAG_AS_CHKSUM", bool, False)
    nz_diag = pf.get("NK_ZSPACE", int, model.vgrid.nk,
                     desc="z levels for _z diagnostics")
    diag_path = os.path.join(args.case_dir, "diag_table")
    diag_text = open(diag_path).read() \
        if os.path.exists(diag_path) else None
    diags = None
    if diag_text is not None or as_chksum:
        from mom6_tpu.framework.diag import (DiagMediator,
                                             parse_diag_table)
        from mom6_tpu.diagnostics.prognostic_diags import PrognosticDiags
        if as_chksum and diag_text is not None \
                and not parse_diag_table(diag_text)[2]:
            # chksum mode with a bare diag_table (title + base date
            # only): checksum every registered diagnostic, like the
            # reference test suite's generated full table
            diag_text = None
        med = DiagMediator(model.domain, args.case_dir,
                           diag_table_text=diag_text,
                           as_chksum=as_chksum)
        max_depth = float(jax.numpy.max(model.grid.bathyT))
        diags = PrognosticDiags.create(med, model.grid, model.vgrid,
                                       max_depth, nz_diag)
        if not (diags.any_requested() or as_chksum):
            diags = None
    pf.module("MOM_sum_output")
    # ENERGYSAVEDAYS counts TIMEUNIT seconds like DAYMAX
    timeunit = pf.get("TIMEUNIT", float, 86400.0, units="s")
    energysavedays = pf.get("ENERGYSAVEDAYS", float, 1.0,
                            units="TIMEUNIT") * (timeunit / 86400.0)
    pf.module("MOM_restart")
    restint = pf.get("RESTINT", float, 0.0, units="days")
    unused = pf.close(fatal_unused=False)
    if unused:
        MOM_error(WARNING,
                  f"{len(unused)} unimplemented/unused parameters: "
                  + ", ".join(unused[:12])
                  + (" ..." if len(unused) > 12 else ""))
    pf.write_docs(args.case_dir)

    daymax = args.days if args.days is not None else model.daymax
    state, split_state = model.state, model.split_state
    step0, t_days = 0, 0.0
    if args.restart_from:
        trees, meta = restore_restart(
            args.restart_from, {"state": state, "split": split_state})
        state, split_state = trees["state"], trees["split"]
        step0, t_days = int(meta["step"]), float(meta["time_days"])

    step = model.step_fn()
    tracers = model.tracers
    stats_jit = jax.jit(stat_sums)
    d, g, vg, dt = model.domain, model.grid, model.vgrid, model.dt
    nsteps = int(round((daymax - t_days) * 86400.0 / dt))
    if nsteps <= 0:
        if daymax > t_days:
            MOM_error(NOTE,
                      f"Nothing to do: the {daymax - t_days} days from "
                      f"current time {t_days} to DAYMAX {daymax} round "
                      f"to 0 steps of DT = {dt} s")
        else:
            MOM_error(NOTE,
                      f"Nothing to do: current time {t_days} days "
                      f"already ≥ requested DAYMAX {daymax} days")
        return
    stats_every = max(1, int(round(energysavedays * 86400.0 / dt)))

    stats_path = os.path.join(args.case_dir, "ocean.stats")
    with open(stats_path, "w") as f:
        f.write(format_stats_header())
    mass0 = None
    wall0 = time.perf_counter()
    for n in range(step0, step0 + nsteps + 1):
        if n % stats_every == 0:
            with clock("ocean.stats"):
                s = collect_stats(stats_jit(d, g, vg, state, dt), vg, n,
                                  n * dt / 86400.0,
                                  truncs=step.truncations())
                if mass0 is None:
                    mass0 = s.total_mass
                line = format_stats_line(s, mass0)
                with open(stats_path, "a") as f:
                    f.write(line)
                print(line, end="")
            if diags is not None:
                with clock("diag mediator"):
                    diags.post_state(g, vg, state)
        if n == step0 + nsteps:
            break
        with clock("step_MOM"):
            state, split_state, tracers = step(state, split_state,
                                               tracers, n)
    jax.block_until_ready(state.h)
    if diags is not None:
        with clock("diag mediator"):
            diags.med.flush("diags.nc", time_value=daymax)
    wall = time.perf_counter() - wall0
    pts = model.domain.ni * model.domain.nj * model.vgrid.nk * nsteps
    print(f"run complete: {nsteps} steps, {wall:.2f}s wall, "
          f"{pts / max(wall, 1e-9):.3g} points/s")

    if restint > 0 or True:
        with clock("restart save"):
            save_restart(
                os.path.join(args.case_dir, "RESTART", "MOM.res"),
                {"state": state, "split": split_state},
                meta={"step": step0 + nsteps,
                      "time_days": daymax})

    # MOM_cpu_clock end-of-run summary (mpp_clock report analog)
    report = clock.report()
    print(report, file=sys.stderr)
    with open(os.path.join(args.case_dir, "clocks.txt"), "w") as f:
        f.write(report)


if __name__ == "__main__":
    main()
