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


def read_driver_params(pf, model):
    """Perform every parameter read the solo driver owns (beyond
    build_model's), returning them as a dict.

    This is the single source of truth for driver-owned parameters:
    ``main`` consumes the returned values, and the verbatim-config
    regression harness calls it so its fatal unused-parameter audit
    (MOM_file_parser.F90:260 analog) is generated from the driver's
    actual reads instead of a hand-maintained allowlist."""
    p = {}
    pf.module("MOM_diag_mediator")
    p["as_chksum"] = pf.get("DIAG_AS_CHKSUM", bool, False)
    p["nz_diag"] = pf.get("NK_ZSPACE", int, model.vgrid.nk,
                          desc="z levels for _z diagnostics")
    pf.module("MOM_particles")
    p["use_particles"] = pf.get("USE_PARTICLES", bool, False)
    if p["use_particles"]:
        p["particles_nx"] = pf.get("PARTICLES_NX", int, 8)
        p["particles_ny"] = pf.get("PARTICLES_NY", int, 8)
        p["particles_layer"] = pf.get("PARTICLES_LAYER", int, 0)
    # ---- offline tracer mode (MOM.F90:2267 OFFLINE_TRACER_MODE /
    # MOM_offline_main.F90:1367-1383) ----
    pf.module("MOM")
    p["offline_mode"] = pf.get("OFFLINE_TRACER_MODE", bool, False)
    p["off_cfg"] = None
    if p["offline_mode"]:
        pf.module("MOM_offline")
        p["off_cfg"] = dict(
            dir=pf.get("OFFLINEDIR", str,
                       pf.get("INPUTDIR", str, ".")),
            sum_file=pf.get("OFF_SUM_FILE", str, "off_sum.nc"),
            snap_file=pf.get("OFF_SNAP_FILE", str, "off_snap.nc"),
            numtime=pf.get("NUMTIME", int, 0,
                           desc="time levels before looping back"),
            dt_offline=pf.get("DT_OFFLINE", float, model.dt_therm,
                              units="s"))
    # mom6_tpu extension: an online run records its per-thermo-step
    # transports/thicknesses as the offline forcing files
    p["write_offline"] = pf.get(
        "WRITE_OFFLINE_FIELDS", bool, False,
        desc="write OFF_SUM/OFF_SNAP files from this online run")
    pf.module("MOM_sum_output")
    # ENERGYSAVEDAYS counts TIMEUNIT seconds like DAYMAX
    timeunit = pf.get("TIMEUNIT", float, 86400.0, units="s")
    p["energysavedays"] = pf.get("ENERGYSAVEDAYS", float, 1.0,
                                 units="TIMEUNIT") * (timeunit / 86400.0)
    # APE-vs-depth machinery (MOM_sum_output.F90:74-82 READ_DEPTH_LIST)
    p["do_ape"] = pf.get("CALCULATE_APE", bool, True,
                         desc="available potential energy vs the "
                         "depth-list hypsometry in ocean.stats")
    p["read_depth_list"] = pf.get("READ_DEPTH_LIST", bool, False)
    p["depth_list_file"] = pf.get("DEPTH_LIST_FILE", str,
                                  "Depth_list.nc")
    # DEBUG checksum-flood mode (the reference's DEBUG=True prints
    # hchksum/uvchksum of the prognostic fields through the step; here
    # the driver writes one checksum block per step to chksum_debug)
    pf.module("MOM_debugging")
    p["debug_mode"] = pf.get("DEBUG", bool, False)
    # DEBUG_NANS: trap the first NaN-producing primitive inside jit
    # (jax_debug_nans), the runtime self-check analog of the
    # reference's NaN checksum aborts
    p["debug_nans"] = pf.get("DEBUG_NANS", bool, False)
    # U_TRUNC_FILE-style truncation dumps (MOM_PointAccel.F90)
    p["u_trunc_file"] = pf.get("U_TRUNC_FILE", str, "")
    # DTBT_RESET_PERIOD (MOM_barotropic.F90:2801, MOM.F90:2380-2390):
    # periodically re-estimate the barotropic substep count from the
    # evolving free-surface height.  0 → every dynamics step; <0
    # disables.  The reference defaults the period to DT_THERM when
    # DTBT<=0 and ignores it entirely (do_not_read) when a fixed
    # DTBT>0 was set — an explicit DTBT is never overridden here
    # either.  nstep is a static trip count under XLA, so the driver
    # swaps step closures when the estimate changes; closures are
    # memoized per nstep so each distinct value compiles exactly once.
    pf.module("MOM_barotropic")
    if pf.get("DTBT", float, -0.95, units="s or nondim") > 0.0:
        p["dtbt_reset"] = -1.0     # fixed DTBT: no re-estimation
    else:
        p["dtbt_reset"] = pf.get(
            "DTBT_RESET_PERIOD", float, model.dt_therm, units="s",
            desc="period between dtbt re-estimates; "
            "0 = every dynamics step, <0 disables")
    # CPU-time budgeting (MOM_write_cputime.F90:44-108): record the
    # cumulative CPU time per stats interval to CPU_TIME_FILE and end
    # the run early if the projected next interval would exceed MAXCPU
    pf.module("MOM_write_cputime")
    p["maxcpu"] = pf.get("MAXCPU", float, -1.0,
                         units="wall-clock seconds",
                         desc="stop before exceeding this cpu budget; "
                         "<0 disables")
    p["cpu_file"] = pf.get("CPU_TIME_FILE", str, "CPU_stats")
    pf.module("MOM_restart")
    p["restint"] = pf.get("RESTINT", float, 0.0, units="days")
    return p


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
    dp = read_driver_params(pf, model)
    # diag mediator driven by the case's diag_table
    # (MOM_diag_mediator.F90; DIAG_AS_CHKSUM replaces binary output
    # with bitcount checksum lines, the reference's layout-test mode)
    as_chksum = dp["as_chksum"]
    nz_diag = dp["nz_diag"]
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
    # ---- Lagrangian particles (MOM.F90:1357 USE_PARTICLES /
    # config_src/external/drifters) ----
    particles = None
    part_traj = []
    if dp["use_particles"]:
        from mom6_tpu.tracer.particles import (init_particles,
                                               advect_particles)
        pnx = dp["particles_nx"]
        pny = dp["particles_ny"]
        pk = dp["particles_layer"]
        import numpy as _np
        xs, ys = _np.meshgrid(
            (_np.arange(pnx) + 0.5) * model.domain.ni / pnx,
            (_np.arange(pny) + 0.5) * model.domain.nj / pny)
        particles = init_particles(xs.ravel(), ys.ravel(),
                                   _np.full(pnx * pny, pk))
        _advect_particles = jax.jit(
            lambda p, u, v: advect_particles(
                model.domain, model.grid, p, u, v, model.dt))

    offline_mode = dp["offline_mode"]
    off_cfg = dp["off_cfg"]
    write_offline = dp["write_offline"]
    energysavedays = dp["energysavedays"]
    debug_mode = dp["debug_mode"]
    if dp["debug_nans"]:
        jax.config.update("jax_debug_nans", True)
    u_trunc_file = dp["u_trunc_file"]
    dtbt_reset = dp["dtbt_reset"]
    maxcpu = dp["maxcpu"]
    cpu_file = dp["cpu_file"]
    restint = dp["restint"]
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
    restored_carry = None
    if args.restart_from:
        import json as _json
        import jax.numpy as _jnp
        with open(args.restart_from + ".json") as _f:
            _saved = set(_json.load(_f)["trees"])
        templates = {"state": state, "split": split_state}
        if model.tracers and "tracers" in _saved:
            # registered tracers restart like the reference's
            # register_restart per-tracer fields
            templates["tracers"] = model.tracers
        # cross-step physics carries the reference registers in its
        # restart files (MLD, visc%Kv_shear, internal-tide En, SPPT
        # pattern, the transport accumulators): single-leaf trees, so
        # any array stands in as the structural template
        _leaf = _jnp.zeros(1)
        _carry_names = ("u", "v", "mld", "kv", "iten", "sppt",
                        "sppt_p", "sppt_k")
        for _n in _carry_names:
            if f"carry_{_n}" in _saved:
                templates[f"carry_{_n}"] = _leaf
        if "carry_res" in _saved and model.obc is not None \
                and model.tracers:
            templates["carry_res"] = \
                model.obc.init_tracer_reservoirs(model.tracers)
        trees, meta = restore_restart(args.restart_from, templates)
        state, split_state = trees["state"], trees["split"]
        if "tracers" in trees:
            model.tracers = trees["tracers"]
        restored_carry = {"u": None, "v": None, "truncs": 0,
                          "res": None, "mld": None, "kv": None,
                          "iten": None, "sppt": None}
        for _n in ("u", "v", "mld", "kv", "iten", "sppt"):
            if f"carry_{_n}" in trees:
                restored_carry[_n] = trees[f"carry_{_n}"]
        if "carry_sppt_p" in trees or "carry_sppt_k" in trees:
            restored_carry["sppt"] = {
                "sppt": trees.get("carry_sppt_p"),
                "skeb": trees.get("carry_sppt_k")}
        if "carry_res" in trees:
            restored_carry["res"] = trees["carry_res"]
        restored_carry["truncs"] = int(meta.get("truncs", 0))
        step0, t_days = int(meta["step"]), float(meta["time_days"])

    if offline_mode:
        _run_offline(args, model, off_cfg, daymax, t_days)
        return

    step = model.step_fn(carry=restored_carry)
    # DTBT reset swaps between these memoized closures; keying by
    # nstep keeps each closure's jax.jit caches warm, so a revisited
    # substep count (e.g. a CFL estimate oscillating 8<->9) never
    # recompiles
    step_cache = {step.nstep_bt: step}
    tracers = model.tracers
    stats_jit = jax.jit(stat_sums)
    d, g, vg, dt = model.domain, model.grid, model.vgrid, model.dt
    # depth-list hypsometry for the APE energy column
    # (MOM_sum_output.F90 CALCULATE_APE / READ_DEPTH_LIST)
    dlist = None
    if dp["do_ape"]:
        from mom6_tpu.diagnostics.depth_list import depth_list_setup
        dlist = depth_list_setup(
            d, g, read_file=dp["read_depth_list"],
            path=os.path.join(args.case_dir, dp["depth_list_file"]))
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
    off_records, off_last = [], None
    wall0 = time.perf_counter()
    cpu_path = os.path.join(args.case_dir, cpu_file)
    with open(cpu_path, "w") as f:
        f.write("# step, day, cpu_total[s], cpu_per_interval[s]\n")
    cpu_prev = 0.0
    stopped_on_cpu = False
    for n in range(step0, step0 + nsteps + 1):
        if n % stats_every == 0 and n > step0:
            # write_cputime: log the interval's cpu cost and project
            # whether another interval fits in the MAXCPU budget
            cpu_now = time.process_time()
            with open(cpu_path, "a") as f:
                f.write(f"{n}, {n * dt / 86400.0:.6f}, {cpu_now:.3f},"
                        f" {cpu_now - cpu_prev:.3f}\n")
            if maxcpu > 0.0 and cpu_now + 1.05 * (cpu_now - cpu_prev) \
                    > maxcpu:
                MOM_error(NOTE,
                          f"MAXCPU: stopping at step {n} — "
                          f"{cpu_now:.1f}s used, next interval "
                          f"(~{cpu_now - cpu_prev:.1f}s) would exceed "
                          f"the {maxcpu:.1f}s budget")
                stopped_on_cpu = True
            cpu_prev = cpu_now
        if n % stats_every == 0:
            with clock("ocean.stats"):
                s = collect_stats(stats_jit(d, g, vg, state, dt,
                                            dlist), vg, n,
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
                    diags.post_state(g, vg, state,
                                     eos=model.eos)
        if n == step0 + nsteps or stopped_on_cpu:
            break
        if dtbt_reset >= 0.0 and model.split and n > step0 \
                and (n - step0) % max(1, int(round(dtbt_reset / dt))) \
                == 0:
            # re-estimate the barotropic substep count from the
            # current free surface.  Asymmetric hysteresis: an
            # increase (dtbt must shrink — stability) applies at once;
            # a decrease only if it saves ≥2 substeps, so a CFL
            # estimate oscillating across a ceil boundary never churns
            new_nstep = model.reset_dtbt(state)
            if new_nstep > step.nstep_bt \
                    or new_nstep <= step.nstep_bt - 2:
                MOM_error(NOTE,
                          f"DTBT_RESET_PERIOD: nstep "
                          f"{step.nstep_bt} -> {new_nstep} at step {n}")
                carry = step.carry()
                if new_nstep in step_cache:
                    step = step_cache[new_nstep]
                    step.set_carry(carry)
                else:
                    step = model.step_fn(nstep_bt=new_nstep,
                                         carry=carry)
                    step_cache[new_nstep] = step
        truncs_before = step.truncations() if u_trunc_file else 0
        with clock("step_MOM"):
            state, split_state, tracers = step(state, split_state,
                                               tracers, n)
        if particles is not None:
            with clock("particles"):
                particles = _advect_particles(particles, state.u,
                                              state.v)
            if n % stats_every == 0:
                import numpy as _np
                part_traj.append((_np.asarray(particles.x),
                                  _np.asarray(particles.y)))
        if debug_mode:
            # checksum flood: one block of prognostic checksums per
            # step (hchksum/uvchksum analog of DEBUG=True)
            from mom6_tpu.framework.checksums import hchksum_str
            with open(os.path.join(args.case_dir, "chksum_debug"),
                      "a") as f:
                f.write(f"= step {n + 1}\n")
                for nm, fld in (("u", state.u), ("v", state.v),
                                ("h", state.h), ("T", state.T),
                                ("S", state.S)):
                    if fld is not None:
                        f.write(hchksum_str(d, fld, nm) + "\n")
        if u_trunc_file and step.truncations() > truncs_before:
            # PointAccel-style dump of the worst column when the
            # velocity limiter fired this step
            from mom6_tpu.diagnostics.point_accel import \
                dump_worst_column
            dump_worst_column(
                os.path.join(args.case_dir, u_trunc_file), d,
                model.grid, state, n + 1,
                label=f"({step.truncations() - truncs_before} truncs)")
        if write_offline:
            off = step.offline_fields()
            if off is not None and off is not off_last:
                off_last = off
                import numpy as _np
                off_records.append(tuple(
                    _np.asarray(model.domain.interior(x))
                    for x in off))
    jax.block_until_ready(state.h)
    if write_offline and off_records:
        _write_offline_fields(args.case_dir, model, off_records)
    if particles is not None and part_traj:
        import numpy as _np
        from mom6_tpu.framework.io import write_fields
        write_fields(os.path.join(args.case_dir, "particles.nc"),
                     {"part_x": _np.stack([x for x, _ in part_traj]),
                      "part_y": _np.stack([y for _, y in part_traj])},
                     dims={"part_x": ("rec", "particle"),
                           "part_y": ("rec", "particle")})
    if diags is not None:
        with clock("diag mediator"):
            diags.med.flush("diags.nc", time_value=daymax)
    wall = time.perf_counter() - wall0
    nran = n - step0
    pts = model.domain.ni * model.domain.nj * model.vgrid.nk \
        * max(nran, 1)
    print(f"run complete: {nran} of {nsteps} steps, {wall:.2f}s wall, "
          f"{pts / max(wall, 1e-9):.3g} points/s")

    if restint > 0 or True:
        with clock("restart save"):
            _trees = {"state": state, "split": split_state}
            if tracers:
                _trees["tracers"] = tracers
            _c = step.carry()
            for _n in ("u", "v", "mld", "kv", "iten"):
                if _c.get(_n) is not None:
                    _trees[f"carry_{_n}"] = _c[_n]
            _sp = _c.get("sppt")
            if isinstance(_sp, dict):
                # SPPT+SKEB pattern pair: two single-leaf trees so
                # the restore template stays structure-free
                if _sp.get("sppt") is not None:
                    _trees["carry_sppt_p"] = _sp["sppt"]
                if _sp.get("skeb") is not None:
                    _trees["carry_sppt_k"] = _sp["skeb"]
            elif _sp is not None:
                _trees["carry_sppt"] = _sp
            if _c.get("res") is not None:
                _trees["carry_res"] = _c["res"]
            save_restart(
                os.path.join(args.case_dir, "RESTART", "MOM.res"),
                _trees,
                meta={"step": step0 + nsteps,
                      "time_days": daymax,
                      "truncs": int(_c.get("truncs", 0))})

    # MOM_cpu_clock end-of-run summary (mpp_clock report analog)
    report = clock.report()
    print(report, file=sys.stderr)
    with open(os.path.join(args.case_dir, "clocks.txt"), "w") as f:
        f.write(report)


def _write_offline_fields(case_dir: str, model, records) -> None:
    """Write the OFF_SUM/OFF_SNAP NetCDF pair from an online run's
    per-thermo-interval (uhtr, vhtr, h_end) records."""
    import numpy as np
    from mom6_tpu.framework.io import write_fields
    uh = np.stack([r[0] for r in records])
    vh = np.stack([r[1] for r in records])
    h = np.stack([r[2] for r in records])
    t = np.arange(len(records), dtype=np.float64)
    dims4 = ("time", "zl", "yh", "xh")
    write_fields(os.path.join(case_dir, "off_sum.nc"),
                 {"time": t, "uhtr": uh, "vhtr": vh},
                 dims={"time": ("time",), "uhtr": dims4,
                       "vhtr": dims4},
                 attrs={"uhtr": {"units": "m3"},
                        "vhtr": {"units": "m3"}})
    write_fields(os.path.join(case_dir, "off_snap.nc"),
                 {"time": t, "h_end": h},
                 dims={"time": ("time",), "h_end": dims4},
                 attrs={"h_end": {"units": "m"}})
    print(f"offline fields written: {len(records)} intervals")


def _run_offline(args, model, off, daymax: float, t_days: float):
    """Offline tracer loop (MOM.F90:1797 step_offline /
    MOM_offline_main.F90): re-advect the registered tracers from
    stored transports, looping over NUMTIME file levels."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mom6_tpu.framework.io import read_field
    from mom6_tpu.framework.restart import save_restart
    from mom6_tpu.tracer.offline import OfflineCfg, step_offline

    if not model.tracers:
        raise SystemExit("OFFLINE_TRACER_MODE requires registered "
                         "tracers (e.g. USE_IDEAL_AGE_TRACER)")
    d = model.domain
    sum_path = os.path.join(off["dir"], off["sum_file"])
    snap_path = os.path.join(off["dir"], off["snap_file"])
    uh_all = np.asarray(read_field(sum_path, "uhtr"), np.float64)
    vh_all = np.asarray(read_field(sum_path, "vhtr"), np.float64)
    h_all = np.asarray(read_field(snap_path, "h_end"), np.float64)
    numtime = off["numtime"] or uh_all.shape[0]
    dt_off = off["dt_offline"]
    nsteps = int(round((daymax - t_days) * 86400.0 / dt_off))
    cfg = OfflineCfg(dt_offline=dt_off)

    @partial(jax.jit, static_argnames=("x_first",))
    def jstep(tracers, h_end, uhtr, vhtr, x_first=True):
        return step_offline(d, model.grid, tracers, h_end, uhtr, vhtr,
                            None, cfg, registry=model.tracer_registry,
                            x_first=x_first)

    tracers = model.tracers
    stats_path = os.path.join(args.case_dir, "ocean.stats")
    area = model.grid.areaT
    with open(stats_path, "w") as f:
        f.write("# offline tracer mode: step, day, "
                + ", ".join(f"total[{k}]" for k in sorted(tracers))
                + "\n")
    wall0 = time.perf_counter()
    for n in range(nsteps):
        lvl = n % numtime
        h_end = d.pad(jnp.asarray(h_all[lvl]))
        uhtr = d.pad(jnp.asarray(uh_all[lvl]))
        vhtr = d.pad(jnp.asarray(vh_all[lvl]))
        tracers, h = jstep(tracers, h_end, uhtr, vhtr,
                           x_first=(n % 2 == 0))
        if n % max(1, numtime) == numtime - 1 or n == nsteps - 1:
            tots = {k: float(jnp.sum(d.interior(v * h) * d.interior(
                area))) for k, v in sorted(tracers.items())}
            line = (f"{n + 1}, {(n + 1) * dt_off / 86400.0:.4f}, "
                    + ", ".join(f"{v:.10e}" for v in tots.values())
                    + "\n")
            with open(stats_path, "a") as f:
                f.write(line)
            print(line, end="")
    wall = time.perf_counter() - wall0
    print(f"offline run complete: {nsteps} steps, {wall:.2f}s wall")
    save_restart(os.path.join(args.case_dir, "RESTART", "MOM.res"),
                 {"tracers": tracers},
                 meta={"step": nsteps, "time_days": daymax})


if __name__ == "__main__":
    main()
