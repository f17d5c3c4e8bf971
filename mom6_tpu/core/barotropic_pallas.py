"""Pallas TPU kernel for the barotropic subcycle.

The barotropic substep (MOM_barotropic.F90:1860 btstep inner loop) is
~15 small 2D stencil ops; under plain XLA each substep costs ~0.13 ms
at 512² — 3× the HBM-traffic bound — because the op chain round-trips
HBM between fusions.  This kernel fuses CHUNK (=4) substeps into one
``pallas_call``:

* the padded (njh, nih) fields are row-blocked; each block stages its
  rows plus a 2·CHUNK+2-row overlap into VMEM scratch via async DMA,
  runs the CHUNK substeps entirely in VMEM (validity shrinks ≤2 rows
  per substep from the block edges — the same communication-avoiding
  recompute-overlap trick the wide-halo multi-chip march uses between
  chips), and writes back only its own rows;
* per-substep x-halo wraps (reentrant) and y-wall zeroing reproduce
  ``Domain.fill_halos`` width-3 semantics in-register;
* the ramped filter-weight accumulations (wt_vel/wt_eta/wt_trans/
  wt_accel) ride along in VMEM, weights indexed from SMEM;
* transports follow either the linearized Datu·ubt or the BT_cont
  face-area curves (find_uhbt), chosen statically.

Restrictions (callers fall back to the jnp fori_loop otherwise):
single-device layout (1,1), no OBC segments, no wide-halo period,
non-reentrant y, float32, TPU backend.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.parallel.stencil import ip1, im1, jp1, jm1

__all__ = ["subcycle_pallas", "pallas_supported"]

CHUNK = 4          # max substeps fused per pallas_call (even: parity)
BLOCK = 64         # preferred valid rows per grid block
# VMEM staging budget for the kernel's scratch buffer.  ~13 MiB keeps
# the whole footprint under the compiler's per-core VMEM window with
# margin for Mosaic's own temporaries; at 512-wide grids this admits
# the full (CHUNK=4, BLOCK=64) plan, at OM4 width (nip=1536) the plan
# shrinks itself instead of crashing the TPU compiler.
VMEM_BUDGET = 13 * 2 ** 20


def _overlap(chunk: int) -> int:
    """Recompute margin rows per side: each substep's validity chain
    consumes 3 rows (the jnp path fills a 3-ring halo per substep),
    needing 3*chunk+2, rounded up to a sublane-tile multiple (8) so
    every DMA row slice/offset the kernel issues is 8-aligned, which
    Mosaic requires."""
    return -(-(3 * chunk + 2) // 8) * 8


def _n_const(use_curve: bool) -> int:
    n = len(_CONST_SHARED)
    return n + 2 * _N_CURVE + 2 if use_curve else n + len(_CONST_LINEAR)


def _plan(nip: int, use_curve: bool):
    """Choose (chunk, overlap, block) so the (10+n_const, R, nip) fp32
    staging buffer fits VMEM_BUDGET.  Wide grids get fewer fused
    substeps and/or narrower row blocks; returns None when even
    chunk=2 with an 8-row block cannot fit (callers fall back to the
    jnp fori_loop path)."""
    import os
    budget = int(os.environ.get("MOM6_PALLAS_VMEM", VMEM_BUDGET))
    per_row = (10 + _n_const(use_curve)) * nip * 4
    r_max = (budget // per_row) // 8 * 8
    for chunk in (CHUNK, 2):
        ov = _overlap(chunk)
        b = min(BLOCK, (r_max - 2 * ov) // 8 * 8)
        # insist the valid block at least matches its recompute
        # margin; otherwise a smaller chunk (smaller margin) wins
        if b >= ov or (chunk == 2 and b >= 8):
            return chunk, ov, b
    return None

# stable ordering of the 2D constant fields
_CONST_LINEAR = ("Datu", "Datv")
_CONST_SHARED = ("gtot_E", "gtot_W", "gtot_N", "gtot_S", "q", "Du_q",
                 "Dv_q", "Cor_ref_u", "Cor_ref_v", "bt_rem_u",
                 "bt_rem_v", "BT_force_u", "BT_force_v", "eta_pf",
                 "IdxCu", "IdyCv", "IareaT", "eta_src")
_N_CURVE = 10      # per-direction curve fields


def _interpret() -> bool:
    import os
    return bool(os.environ.get("MOM6_PALLAS_INTERPRET"))


def _plan_march(nip: int, use_curve: bool, chunk: int):
    """Block plan for wide-halo march mode: the chunk is fixed by the
    exchange period, only the row block adapts to VMEM."""
    import os
    budget = int(os.environ.get("MOM6_PALLAS_VMEM", VMEM_BUDGET))
    per_row = (10 + _n_const(use_curve)) * nip * 4
    r_max = (budget // per_row) // 8 * 8
    ov = _overlap(chunk)
    b = min(BLOCK, (r_max - 2 * ov) // 8 * 8)
    return None if b < 8 else (chunk, ov, b)


def pallas_march_supported(dom_run, obc, dtype, use_curve: bool,
                           chunk: int) -> bool:
    """Eligibility of the fused kernel for the wide-halo march: the
    kernel runs ``chunk`` substeps on the widened arrays with NO edge
    fixing (halo state evolves in-kernel exactly like the jnp march),
    and the caller exchanges the wide halos between chunks — so any
    layout works, including inside shard_map, and reentrant y needs
    no special casing."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    ok_backend = backend == "tpu" and dtype == jnp.float32
    if _interpret():
        ok_backend = True
    nip = -(-dom_run.nih // 128) * 128
    return (ok_backend and obc is None
            and not dom_run.tripolar_n
            and getattr(dom_run, "blocks", None) is None
            and chunk % 2 == 0
            and _plan_march(nip, use_curve, chunk) is not None)


def pallas_supported(domain, obc, period, dtype,
                     use_curve: bool = True) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    ok_backend = backend == "tpu" and dtype == jnp.float32
    if _interpret():
        ok_backend = True         # CPU interpreter testing path
    nip = -(-domain.nih // 128) * 128
    return (ok_backend and not domain.shmap
            and domain.layout == (1, 1) and obc is None
            and period == 1 and not domain.reentrant_y
            and not domain.tripolar_n
            # the kernel's in-register x-wrap assumes one contiguous
            # tile, not a block-compressed stack
            and getattr(domain, "blocks", None) is None
            and _plan(nip, use_curve) is not None)


def _find_uhbt_k(u, c10):
    """find_uhbt on unpacked curve constants (see barotropic.find_uhbt)."""
    (fa_ee, fa_e0, fa_w0, fa_ww, u_ee, u_ww, crv_e, uh_ee, crv_w,
     uh_ww) = c10
    lin_neg = (u - u_ee) * fa_ee + uh_ee
    cub_neg = u * (fa_e0 + crv_e * u * u)
    cub_pos = u * (fa_w0 + crv_w * u * u)
    lin_pos = (u - u_ww) * fa_ww + uh_ww
    return jnp.where(u < u_ee, lin_neg,
                     jnp.where(u < 0.0, cub_neg,
                               jnp.where(u <= u_ww, cub_pos, lin_pos)))


def _make_kernel(n_in, n_const, use_curve, reentrant_x, H, ni, nj,
                 njp, nip, dtbt, bebt, total, R, B, chunk, ov,
                 march=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(n0_ref, *refs):
        # refs layout: ins (10 state/sums + n_const consts + wt),
        # outs (10), scratch (buf, sem)
        in_state = refs[:10]
        in_consts = refs[10:10 + n_const]
        wt_ref = refs[10 + n_const]            # SMEM (4, total_pad)
        out_state = refs[11 + n_const:21 + n_const]
        buf = refs[21 + n_const]               # VMEM (10+n_const, R, nip)
        sem = refs[22 + n_const]               # DMA sem array

        i = pl.program_id(0)
        # compute row offsets in 8-row tile units and multiply out, so
        # Mosaic can prove every DMA slice offset is sublane-aligned
        r0_t = jnp.minimum(i * (B // 8), (njp - B) // 8)
        in_t = jnp.clip(r0_t - ov // 8, 0, (njp - R) // 8)
        r0 = r0_t * 8                                # valid-row start
        in_start = in_t * 8
        off = (r0_t - in_t) * 8                      # valid offset

        # stage all fields into VMEM
        copies = []
        for k in range(10):
            copies.append(pltpu.make_async_copy(
                in_state[k].at[pl.ds(in_start, R), :],
                buf.at[k], sem.at[k]))
        for k in range(n_const):
            copies.append(pltpu.make_async_copy(
                in_consts[k].at[pl.ds(in_start, R), :],
                buf.at[10 + k], sem.at[10 + k]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        eta = buf[0]
        ubt = buf[1]
        vbt = buf[2]
        sums = [buf[3 + k] for k in range(7)]
        con = {}
        names = (list(_CONST_SHARED) if use_curve
                 else list(_CONST_LINEAR) + list(_CONST_SHARED))
        for k, nm in enumerate(names):
            con[nm] = buf[10 + k]
        if use_curve:
            base = 10 + len(names)
            cu = tuple(buf[base + k] for k in range(_N_CURVE))
            cv = tuple(buf[base + _N_CURVE + k] for k in range(_N_CURVE))
            uhbt0 = buf[base + 2 * _N_CURVE]
            vhbt0 = buf[base + 2 * _N_CURVE + 1]

            def trans_u(u):
                return _find_uhbt_k(u, cu) + uhbt0

            def trans_v(v):
                return _find_uhbt_k(v, cv) + vhbt0
        else:
            def trans_u(u):
                return con["Datu"] * u

            def trans_v(v):
                return con["Datv"] * v

        if march:
            # wide-halo march: halo state evolves in-register exactly
            # like the jnp comm-avoiding loop; the caller exchanges
            # the wide halos between chunks, so no in-kernel fixing
            def yfix(f):
                return f

            def xfix(f):
                return f
        else:
            # global row ids for the y-wall zeroing
            grow = jax.lax.broadcasted_iota(jnp.int32, (R, nip), 0) \
                + in_start
            y_wet = (grow >= H) & (grow < H + nj)

            def yfix(f):
                return jnp.where(y_wet, f, 0.0)

            def xfix(f):
                # static-slice concatenation (Mosaic has no scatter):
                # columns [H-3,H) ← east interior, [H+ni,H+ni+3) ← west
                if reentrant_x:
                    src_w = f[:, H + ni - 3:H + ni]
                    src_e = f[:, H:H + 3]
                else:
                    src_w = jnp.zeros_like(f[:, :3])
                    src_e = jnp.zeros_like(f[:, :3])
                return jnp.concatenate(
                    [f[:, :H - 3], src_w, f[:, H:H + ni], src_e,
                     f[:, H + ni + 3:]], axis=1)

        def cor_u(vbt):
            dvv = con["Dv_q"] * vbt
            A = con["q"] * (ip1(dvv) + dvv)
            return A + jm1(A)

        def cor_v(ubt):
            duu = con["Du_q"] * ubt
            B = con["q"] * (duu + jp1(duu))
            return -(B + im1(B))

        def div(uh, vh):
            return ((uh - im1(uh)) + (vh - jm1(vh))) * con["IareaT"]

        n0 = n0_ref[0]
        for s in range(chunk):
            n = n0 + s
            uhbt = trans_u(ubt)
            vhbt = trans_v(vbt)
            eta_pred = (eta + con["eta_src"]) - dtbt * div(uhbt, vhbt)
            eta_bt_pf = (1.0 - bebt) * eta + bebt * eta_pred
            d_eta = eta_bt_pf - con["eta_pf"]
            pf_u = (d_eta * con["gtot_E"]
                    - ip1(d_eta * con["gtot_W"])) * con["IdxCu"]
            pf_v = (d_eta * con["gtot_N"]
                    - jp1(d_eta * con["gtot_S"])) * con["IdyCv"]
            if s % 2 == 0:
                cu_t = cor_u(vbt) - con["Cor_ref_u"]
                ubt2 = con["bt_rem_u"] * (
                    ubt + dtbt * ((con["BT_force_u"] + cu_t) + pf_u))
                cv_t = cor_v(ubt2) - con["Cor_ref_v"]
                vbt2 = con["bt_rem_v"] * (
                    vbt + dtbt * ((con["BT_force_v"] + cv_t) + pf_v))
            else:
                cv_t = cor_v(ubt) - con["Cor_ref_v"]
                vbt2 = con["bt_rem_v"] * (
                    vbt + dtbt * ((con["BT_force_v"] + cv_t) + pf_v))
                cu_t = cor_u(vbt2) - con["Cor_ref_u"]
                ubt2 = con["bt_rem_u"] * (
                    ubt + dtbt * ((con["BT_force_u"] + cu_t) + pf_u))

            uhbt2 = trans_u(ubt2)
            vhbt2 = trans_v(vbt2)
            eta2 = (eta + con["eta_src"]) - dtbt * div(uhbt2, vhbt2)

            # fill_halos(width=3) semantics
            eta = xfix(yfix(eta2))
            ubt = xfix(yfix(ubt2))
            vbt = xfix(yfix(vbt2))

            # weighted accumulations (wt rows: vel, eta, trans, accel)
            w_v = wt_ref[0, n]
            w_e = wt_ref[1, n]
            w_t = wt_ref[2, n]
            w_a = wt_ref[3, n]
            sums[0] = sums[0] + w_t * uhbt2
            sums[1] = sums[1] + w_t * vhbt2
            sums[2] = sums[2] + w_e * eta
            sums[3] = sums[3] + w_a * (cu_t + pf_u)
            sums[4] = sums[4] + w_a * (cv_t + pf_v)
            sums[5] = sums[5] + w_v * ubt
            sums[6] = sums[6] + w_v * vbt

        # write back valid rows only
        buf[0, :, :] = eta
        buf[1, :, :] = ubt
        buf[2, :, :] = vbt
        for k in range(7):
            buf[3 + k, :, :] = sums[k]
        wb = []
        for k in range(10):
            wb.append(pltpu.make_async_copy(
                buf.at[k, pl.ds(off, B), :],
                out_state[k].at[pl.ds(r0, B), :],
                sem.at[k]))
        for c in wb:
            c.start()
        for c in wb:
            c.wait()

    return kernel


def subcycle_pallas(eta0, ubt0, vbt0, consts, curve_args, wt_rows,
                    dtbt: float, bebt: float, total: int,
                    reentrant_x: bool, H: int, ni: int, nj: int,
                    march: bool = False, fill_fn=None,
                    chunk_force: int | None = None,
                    vma: tuple = ()):
    """Run the full ``total``-substep barotropic subcycle through the
    fused kernel.  consts: dict of 2D fields; curve_args: None or
    (cu(10), cv(10), uhbt0, vhbt0); wt_rows: (4, total) numpy weights.

    march/fill_fn/chunk_force: wide-halo comm-avoiding mode — the
    kernel runs ``chunk_force`` substeps with no edge fixing on the
    widened arrays, then ``fill_fn((eta, ubt, vbt))`` refreshes the
    wide halos (a ppermute exchange under shard_map) between chunks.
    Returns (eta, ubt, vbt, sums dict)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    njp_raw, nip_raw = eta0.shape
    dtype = eta0.dtype
    use_curve = curve_args is not None

    # Mosaic DMA slicing needs tile-aligned extents: zero-pad the x
    # (lane) axis to 128 and the y (sublane) axis to 8.  Safe because
    # reads never reach past ring 3 of the x halo (refreshed in-kernel
    # by xfix every substep) and padded rows sit beyond the y wall,
    # re-zeroed by yfix every substep.
    nip = -(-nip_raw // 128) * 128
    njp = -(-njp_raw // 8) * 8
    xpad = nip - nip_raw
    ypad = njp - njp_raw

    def _pad(a):
        # concatenate-based (jnp.pad's inner jit trips a lowering-
        # cache bug when nested in shard_map + interpret-mode pallas)
        if xpad:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (xpad,), a.dtype)],
                axis=-1)
        if ypad:
            a = jnp.concatenate(
                [a, jnp.zeros((ypad,) + a.shape[1:], a.dtype)],
                axis=0)
        return a

    eta0, ubt0, vbt0 = _pad(eta0), _pad(ubt0), _pad(vbt0)

    const_list = []
    if not use_curve:
        const_list += [consts["Datu"], consts["Datv"]]
    const_list += [consts[k] for k in _CONST_SHARED]
    if use_curve:
        cu, cv, uhbt0, vhbt0 = curve_args
        const_list += list(cu) + list(cv) + [uhbt0, vhbt0]
    const_list = [_pad(a) for a in const_list]
    n_const = len(const_list)

    plan = _plan_march(nip, use_curve, chunk_force) if march \
        else _plan(nip, use_curve)
    if plan is None:          # callers check pallas_supported first
        raise ValueError(f"no VMEM-feasible pallas plan at nip={nip}")
    chunk, ov, B = plan

    # pad weights to a chunk multiple (dtype follows the fields so
    # the f64 interpreter tests match the jnp path's weights exactly)
    nchunks = -(-total // chunk)
    tpad = nchunks * chunk
    wt = np.zeros((4, tpad), np.dtype(dtype.name))
    wt[:, :total] = wt_rows[:, :total]
    wt = jnp.asarray(wt)

    zero = jnp.zeros_like(eta0)
    state = [eta0, ubt0, vbt0] + [zero] * 7

    B = min(B, njp)
    R = min(B + 2 * ov, njp)
    kernel = _make_kernel(0, n_const, use_curve, reentrant_x, H,
                          ni, nj, njp, nip, dtbt, bebt, tpad, R, B,
                          chunk, ov, march=march)
    nblocks = -(-njp // B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] * 10
                  + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_const
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 10,
        scratch_shapes=[
            pltpu.VMEM((10 + n_const, R, nip), dtype),
            pltpu.SemaphoreType.DMA((10 + n_const,)),
        ],
    )
    # under shard_map, outputs must declare which mesh axes they vary
    # over (jax's check_vma).  Interpreter mode hits a jax lowering-
    # cache bug with vma-annotated closed_calls; interpret-mode tests
    # run their shard_map with check_vma=False instead.
    kw = {"vma": frozenset(vma)} if (vma and not _interpret()) else {}
    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((njp, nip), dtype,
                                        **kw)] * 10,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )

    def chunk_step(c, st):
        n0 = jnp.reshape(c * chunk, (1,)).astype(jnp.int32)
        outs = list(call(n0, *st, *const_list, wt))
        if march:
            # between-chunk wide-halo exchange (the jnp march's
            # do_fill-at-chunk-end, on the caller's domain semantics)
            trio = tuple(a[:njp_raw, :nip_raw] if (xpad or ypad)
                         else a for a in outs[:3])
            trio = fill_fn(trio)
            outs[0], outs[1], outs[2] = (_pad(a) for a in trio)
        return outs

    state = jax.lax.fori_loop(0, nchunks, chunk_step, state)

    def _crop(a):
        return a[:njp_raw, :nip_raw] if (xpad or ypad) else a

    state = [_crop(a) for a in state]
    eta_f, ubt_f, vbt_f = state[0], state[1], state[2]
    sums = dict(uhbt=state[3], vhbt=state[4], eta=state[5],
                accel_u=state[6], accel_v=state[7], ubt=state[8],
                vbt=state[9])
    return eta_f, ubt_f, vbt_f, sums
