import numpy as np
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
from mom6_tpu.framework.restart import (save_restart, restore_restart,
                                        query_restart)


def test_restart_bitwise_identical(tmp_path):
    """One 2N-step run == N steps + save/restore + N steps, bitwise
    (the reference's test.restart, .testing/Makefile:144)."""
    d = Domain(ni=16, nj=16, halo=4, reentrant_x=True, reentrant_y=True)
    g = cartesian_grid(d, lenlon_km=160.0, lenlat_km=160.0, f0=1e-4,
                       max_depth=500.0)
    vg = VerticalGrid.uniform(nk=2, gint=0.0098)
    cfg = SplitCfg(barotropic=BarotropicCfg(nstep=8),
                   vertvisc=VertViscCfg(kv=1e-4))
    rng = np.random.default_rng(0)
    h = d.fill_halos(d.pad(jnp.asarray(
        250.0 + rng.standard_normal((2, 16, 16)))))
    st = State(u=jnp.zeros_like(h), v=jnp.zeros_like(h), h=h)
    sp = init_split_state(d, g, vg, st)
    forces = MechForcing()
    step = jax.jit(lambda s, a: step_dyn_split_rk2(d, g, vg, s, a, forces,
                                                   600.0, cfg)[:2])

    # continuous run: 6 steps
    st_c, sp_c = st, sp
    for _ in range(6):
        st_c, sp_c = step(st_c, sp_c)

    # split run: 3 steps, checkpoint, restore, 3 more
    st_a, sp_a = st, sp
    for _ in range(3):
        st_a, sp_a = step(st_a, sp_a)
    path = str(tmp_path / "restart")
    save_restart(path, {"state": st_a, "split": sp_a},
                 meta={"step": 3, "time_days": 3 * 600.0 / 86400.0})
    assert query_restart(path)

    trees, meta = restore_restart(path, {"state": st_a, "split": sp_a})
    assert meta["step"] == 3
    st_b, sp_b = trees["state"], trees["split"]
    for _ in range(3):
        st_b, sp_b = step(st_b, sp_b)

    for k in "uvh":
        a = np.asarray(getattr(st_c, k))
        b = np.asarray(getattr(st_b, k))
        np.testing.assert_array_equal(a, b, err_msg=f"field {k} not "
                                      "bitwise identical after restart")


def test_restore_schema_mismatch(tmp_path):
    path = str(tmp_path / "r")
    save_restart(path, {"x": {"a": jnp.ones(3)}})
    import pytest
    with pytest.raises(ValueError):
        restore_restart(path, {"x": {"a": jnp.ones(3), "b": jnp.ones(2)}})
