"""Layout invariance of the FULL ocean step (step_ocean).

Round-1 coverage stopped at the dynamical core; this extends the
(shard_map vs single-device) invariance claim to the complete phase
sequence — split RK2 dynamics, KPP + background diabatic with surface
cooling, GM thickness diffusion, MLE restratification, T/S/tracer
advection with lateral diffusion, and the Z* ALE regrid/remap —
mirroring the reference's .testing layout matrix on a tc2-class
configuration (ALE + thermo)."""

import numpy as np
import jax
import jax.numpy as jnp

from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.parallel.domain import (Domain, make_mesh, pad_field,
                                      unpad_field)
from mom6_tpu.core.grid import cartesian_grid, blockify_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing, Fluxes
from mom6_tpu.core.dynamics_split_rk2 import (SplitCfg,
                                              init_split_state)
from mom6_tpu.core.barotropic import BarotropicCfg
from mom6_tpu.core.vert_friction import VertViscCfg
from mom6_tpu.core.orchestrator import OceanCfg, step_ocean
from mom6_tpu.param.vertical.diabatic import DiabaticCfg
from mom6_tpu.param.vertical.set_diffusivity import DiffusivityCfg
from mom6_tpu.param.lateral.thickness_diffuse import ThicknessDiffuseCfg
from mom6_tpu.param.lateral.mixed_layer_restrat import MLRestratCfg
from mom6_tpu.tracer.hor_diff import TracerHorDiffCfg
from mom6_tpu.ale.ale_main import ALECfg
from mom6_tpu.ale.regridding import RegridCfg
from mom6_tpu.ale.remapping import RemapCfg
from mom6_tpu.eos import make_eos


def _cfgs(dt):
    split_cfg = SplitCfg(vertvisc=VertViscCfg(kv=1e-4),
                         barotropic=BarotropicCfg(nstep=12))
    ocfg = OceanCfg(
        split=True, split_cfg=split_cfg,
        diabatic=DiabaticCfg(
            diffusivity=DiffusivityCfg(kd=1e-5), use_kpp=True),
        thickness_diffuse=ThicknessDiffuseCfg(khth=200.0),
        use_mle=True, mlrestrat=MLRestratCfg(),
        hordiff=TracerHorDiffCfg(khtr=200.0),
        ale=ALECfg(regrid=RegridCfg(mode="Z*"),
                   remap=RemapCfg(scheme="PPM_H4"),
                   vel_remap=RemapCfg(scheme="PPM_H4")),
        thermo=True)
    return split_cfg, ocfg


def test_step_ocean_layout_invariance():
    ni = nj = 32
    nk = 3
    dt = 600.0
    rng = np.random.default_rng(11)

    d1 = Domain(ni=ni, nj=nj, halo=4, reentrant_x=True,
                reentrant_y=True)
    g1 = cartesian_grid(d1, lenlon_km=320.0, lenlat_km=320.0, f0=1e-4,
                        max_depth=1000.0)
    vg = VerticalGrid.uniform(nk=nk)
    eos = make_eos("WRIGHT")
    _, ocfg = _cfgs(dt)

    h0 = jnp.asarray(rng.uniform(300.0, 360.0, (nk, nj, ni)))
    T0 = jnp.asarray(12.0 - 3.0 * np.arange(nk)[:, None, None]
                     + 0.2 * rng.standard_normal((nk, nj, ni)))
    S0 = jnp.full((nk, nj, ni), 35.0)
    u0 = jnp.asarray(0.05 * rng.standard_normal((nk, nj, ni)))
    v0 = jnp.asarray(0.05 * rng.standard_normal((nk, nj, ni)))
    age0 = jnp.zeros((nk, nj, ni))
    taux0 = jnp.full((nj, ni), 0.1)
    q0 = jnp.full((nj, ni), -100.0)

    # --- single device ---
    st = State(u=d1.fill_halos(d1.pad(u0)), v=d1.fill_halos(d1.pad(v0)),
               h=d1.fill_halos(d1.pad(h0)),
               T=d1.fill_halos(d1.pad(T0)),
               S=d1.fill_halos(d1.pad(S0)))
    sp = init_split_state(d1, g1, vg, st)
    forces = MechForcing(taux=d1.fill_halos(d1.pad(taux0))
                         * g1.mask2dCu)
    fluxes = Fluxes(sensible=d1.fill_halos(d1.pad(q0)) * g1.mask2dT)
    tr = {"age": d1.fill_halos(d1.pad(age0))}
    for n in range(2):
        st, sp, tr, _ = step_ocean(d1, g1, vg, st, sp, tr, forces,
                                   fluxes, dt, ocfg, eos=eos,
                                   x_first=(n % 2 == 0))
    ref = {k: np.asarray(d1.interior(getattr(st, k)))
           for k in ("u", "v", "h", "T", "S")}
    ref["age"] = np.asarray(d1.interior(tr["age"]))

    # --- 8 virtual devices, (4,2) layout ---
    layout = (4, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout,
                reentrant_x=True, reentrant_y=True).sharded()
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    s2 = P("y", "x")
    sspec = State(u=s3, v=s3, h=s3, T=s3, S=s3)
    gspec = jax.tree.map(lambda _: s2, gn)

    def run(s, gr, tx, q, age):
        s = jax.tree.map(dn.fill_halos, s)
        sp = init_split_state(dn, gr, vg, s)
        fr = MechForcing(taux=dn.fill_halos(tx) * gr.mask2dCu)
        fl = Fluxes(sensible=dn.fill_halos(q) * gr.mask2dT)
        trs = {"age": dn.fill_halos(age)}
        for n in range(2):
            s, sp, trs, _ = step_ocean(dn, gr, vg, s, sp, trs, fr, fl,
                                       dt, ocfg, eos=eos,
                                       x_first=(n % 2 == 0))
        return s, trs["age"]

    stN = State(u=pad_field(dn, u0), v=pad_field(dn, v0),
                h=pad_field(dn, h0), T=pad_field(dn, T0),
                S=pad_field(dn, S0))
    out, ageN = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(sspec, gspec, s2, s2, s3),
        out_specs=(sspec, s3)))(stN, gn, pad_field(dn, taux0),
                                pad_field(dn, q0), pad_field(dn, age0))
    for k in ("u", "v", "h", "T", "S"):
        got = np.asarray(unpad_field(dn, getattr(out, k)))
        scale = np.max(np.abs(ref[k])) + 1e-30
        np.testing.assert_allclose(got / scale, ref[k] / scale,
                                   rtol=0, atol=1e-10,
                                   err_msg=f"field {k} layout-variant")
    got = np.asarray(unpad_field(dn, ageN))
    scale = np.max(np.abs(ref["age"])) + 1e-30
    np.testing.assert_allclose(got / scale, ref["age"] / scale,
                               rtol=0, atol=1e-10,
                               err_msg="tracer layout-variant")
