"""Communication-budget regression guard.

The reference's scaling story counts halo messages: ~10 group passes
per dynamics step plus one 3-field exchange per barotropic substep,
with the wide-halo march dividing the latter by the exchange period
(MOM_barotropic.F90:782-786,1842-1850; nonblocking passes overlap the
rest — on TPU that overlap is XLA's async collective-permute +
latency-hiding scheduler, so OUR lever is the message count).  This
test compiles the sharded split step and pins the collective-permute
count so an accidental per-substep or per-field exchange inflation
can never land silently, and proves the wide-halo march actually
removes exchanges from the compiled program."""

import dataclasses as dc

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

import __graft_entry__ as ge
from mom6_tpu.parallel.domain import make_mesh, pad_field
from mom6_tpu.core.grid import blockify_grid
from mom6_tpu.core.state import State
from mom6_tpu.core.forcing import MechForcing
from mom6_tpu.core.dynamics_split_rk2 import (init_split_state,
                                              step_dyn_split_rk2)


def _count(period: int) -> int:
    d1, g1, vg, cfg = ge._build(64, 32, 3)
    layout = (4, 2)
    d2 = dc.replace(d1, layout=layout).sharded()
    g2 = blockify_grid(d2, g1)
    mesh = make_mesh(layout)
    s3 = P(None, "y", "x")
    bt = dc.replace(cfg.barotropic, wide_halo_period=period,
                    use_pallas=False, nstep=64)
    cfg = dc.replace(cfg, barotropic=bt)
    h0 = jnp.full((3, 32, 64), 1000.0 / 3)
    st = State(u=pad_field(d2, 0.0 * h0), v=pad_field(d2, 0.0 * h0),
               h=pad_field(d2, h0))
    fr = MechForcing(taux=0.1 * g2.mask2dCu)
    gspec = jax.tree.map(lambda _: P("y", "x"), g2)

    def run(s, gr, f2):
        s = State(u=d2.fill_halos(s.u), v=d2.fill_halos(s.v),
                  h=d2.fill_halos(s.h))
        sp = init_split_state(d2, gr, vg, s)
        out, _, _ = step_dyn_split_rk2(d2, gr, vg, s, sp, f2, 300.0,
                                       cfg)
        return out.h

    c = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(State(u=s3, v=s3, h=s3), gspec,
                  MechForcing(taux=P("y", "x"))),
        out_specs=s3)).lower(st, g2, fr).compile()
    return c.as_text().count("collective-permute(")


def test_split_step_comm_budget():
    n1 = _count(period=1)
    # measured ~870 at pinning time (nstep=64 barotropic with
    # per-substep 3-field exchanges + ~10 dynamics-phase passes x 4
    # directions); headroom for benign refactors, but a per-field or
    # per-substep exchange inflation must fail
    assert n1 <= 1200, n1


def test_wide_halo_march_reduces_exchange_cadence(monkeypatch):
    """The march exchanges once per ``period`` substeps instead of
    every substep.  The per-substep exchanges live inside a fori_loop
    (one static HLO site regardless of cadence), so this counts
    DYNAMIC halo-fill invocations by unrolling fori_loop into a
    Python loop and tallying Domain fill calls through one btstep."""
    import numpy as np
    from mom6_tpu.parallel.domain import Domain
    from mom6_tpu.core.barotropic import BarotropicCfg, btstep

    calls = {"n": 0}
    orig_fill = Domain.fill_halos

    def counting_fill(self, f, *a, **k):
        calls["n"] += 1
        return orig_fill(self, f, *a, **k)

    def py_fori(lo, hi, body, init):
        val = init
        for i in range(int(lo), int(hi)):
            val = body(i, val)
        return val

    monkeypatch.setattr(Domain, "fill_halos", counting_fill)
    monkeypatch.setattr(jax.lax, "fori_loop", py_fori)

    d1, g1, vg, cfg = ge._build(64, 32, 3)
    rng = np.random.default_rng(0)
    pad = lambda a: d1.fill_halos(d1.pad(jnp.asarray(a)))
    h = pad(np.full((3, 32, 64), 300.0))
    u = pad(0.02 * rng.standard_normal((3, 32, 64)))
    eta = pad(0.01 * rng.standard_normal((32, 64)))
    acc = pad(1e-6 * rng.standard_normal((3, 32, 64)))
    pbce = jnp.full_like(h, 9.8 / 3)

    counts = {}
    for period in (1, 4):
        calls["n"] = 0
        cfgbt = BarotropicCfg(nstep=64, wide_halo_period=period,
                              use_pallas=False)
        btstep(d1, g1, vg, u, u, eta, h, acc, acc, pbce, u, u,
               600.0, cfgbt)
        counts[period] = calls["n"]
    # 64 per-substep fills collapse to 16 chunk fills plus the
    # one-time constant widening (a couple of tree fills)
    assert counts[4] < 0.5 * counts[1], counts
