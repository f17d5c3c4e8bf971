"""Layout invariance of OBC segments (circle_obcs-class): the same
radiating-bump run on one device and on a (2,2) shard_map mesh must
agree, exercising the 2D edge-ownership masks that replace the
reference's segment-owning PE lists (MOM_open_boundary.F90 +
mpp domains)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.framework.config import ParamFile
from mom6_tpu.parallel.domain import (Domain, make_mesh, pad_field,
                                      unpad_field)
from mom6_tpu.core.grid import cartesian_grid, blockify_grid
from mom6_tpu.core.vertical_grid import VerticalGrid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.dynamics_split_rk2 import SplitCfg, init_split_state
from mom6_tpu.core.barotropic import BarotropicCfg
from mom6_tpu.core.vert_friction import VertViscCfg
from mom6_tpu.core.orchestrator import OceanCfg, step_ocean
from mom6_tpu.obc.open_boundary import (build_open_boundaries,
                                        open_grid_masks, blockify_obc)

OBC_TEXT = '''
OBC_NUMBER_OF_SEGMENTS = 4
OBC_SEGMENT_001 = "J=N,I=N:0,FLATHER,ORLANSKI"
OBC_SEGMENT_002 = "J=0,I=0:N,FLATHER,ORLANSKI"
OBC_SEGMENT_003 = "I=N,J=0:N,FLATHER,ORLANSKI"
OBC_SEGMENT_004 = "I=0,J=N:0,FLATHER,ORLANSKI"
'''


def test_obc_layout_invariance():
    ni = nj = 24
    nk = 1
    dt = 300.0
    nsteps = 12

    pf = ParamFile(text=OBC_TEXT)
    d1 = Domain(ni=ni, nj=nj, halo=4)
    obc1 = build_open_boundaries(pf, d1)
    g1 = cartesian_grid(d1, lenlon_km=240.0, lenlat_km=240.0,
                        f0=5e-5, max_depth=100.0)
    g1 = open_grid_masks(g1, obc1)
    vg = VerticalGrid.uniform(nk=nk)
    cfg = OceanCfg(split=True,
                   split_cfg=SplitCfg(vertvisc=VertViscCfg(kv=1e-4),
                                      barotropic=BarotropicCfg(nstep=10)),
                   thermo=False, adiabatic=True)

    # interface bump in the center (circle_obcs IC)
    jj, ii = np.meshgrid(np.arange(nj), np.arange(ni), indexing="ij")
    r2 = (jj - nj / 2 + 0.5) ** 2 + (ii - ni / 2 + 0.5) ** 2
    h0 = jnp.asarray(100.0 + 5.0 * np.exp(-r2 / 8.0))
    u0 = jnp.zeros((nk, nj, ni))

    st = State(u=d1.fill_halos(d1.pad(u0)),
               v=d1.fill_halos(d1.pad(u0)),
               h=d1.fill_halos(d1.pad(h0[None])))
    st = st.replace(h=obc1.extend(st.h))
    sp = init_split_state(d1, g1, vg, st)
    forces = MechForcing(taux=None, tauy=None)
    for n in range(nsteps):
        st, sp, _, _ = step_ocean(d1, g1, vg, st, sp, None, forces,
                                  None, dt, cfg, x_first=(n % 2 == 0),
                                  obc=obc1)
    ref = {k: np.asarray(d1.interior(getattr(st, k)))
           for k in ("u", "v", "h")}
    # the bump must actually radiate out (mass leaves the domain)
    assert ref["h"].sum() < np.asarray(h0).sum() - 1.0

    layout = (2, 2)
    dn = Domain(ni=ni, nj=nj, halo=4, layout=layout).sharded()
    obcn = blockify_obc(dn, obc1)
    gn = blockify_grid(dn, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    s2 = P("y", "x")
    sspec = State(u=s3, v=s3, h=s3)
    gspec = jax.tree.map(lambda _: s2, gn)
    # masks shard over the mesh; scalar external data replicate
    ospec = jax.tree.map(
        lambda x: s2 if getattr(x, "ndim", 0) == 2 else P(), obcn)

    def run(s, gr, ob):
        s = jax.tree.map(dn.fill_halos, s)
        s = s.replace(h=ob.extend(s.h))
        sp = init_split_state(dn, gr, vg, s)
        fr = MechForcing(taux=None, tauy=None)
        for n in range(nsteps):
            s, sp, _, _ = step_ocean(dn, gr, vg, s, sp, None, fr,
                                     None, dt, cfg,
                                     x_first=(n % 2 == 0), obc=ob)
        return s

    stN = State(u=pad_field(dn, u0), v=pad_field(dn, u0),
                h=pad_field(dn, h0[None]))
    out = jax.jit(shard_map(run, mesh=mesh,
                            in_specs=(sspec, gspec, ospec),
                            out_specs=sspec))(stN, gn, obcn)
    for k in ("u", "v", "h"):
        got = np.asarray(unpad_field(dn, getattr(out, k)))
        scale = np.max(np.abs(ref[k])) + 1e-30
        np.testing.assert_allclose(got / scale, ref[k] / scale,
                                   rtol=0, atol=1e-10,
                                   err_msg=f"field {k} layout-variant")
