"""DTBT_RESET_PERIOD: periodic re-estimation of the barotropic
substep count from the evolving free surface (MOM_barotropic.F90:2801).

nstep is a static trip count under XLA, so the solo driver swaps in a
re-jitted step closure when the estimate changes; the closure carry
(transport accumulators, truncation counts, reservoirs) must survive
the swap and results must stay physical.
"""

import os

import numpy as np

CFG = """
NIGLOBAL = 12
NJGLOBAL = 10
NK = 3
DT = 600.0
DAYMAX = 0.0417
ENERGYSAVEDAYS = 0.0208
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 120.0
LENLAT = 100.0
TOPO_CONFIG = flat
MAXIMUM_DEPTH = 400.0
F_0 = 1.0e-4
REENTRANT_X = True
ENABLE_THERMODYNAMICS = False
ADIABATIC = True
WIND_CONFIG = gyres
TAUX_MAGNITUDE = 0.1
DTBT_RESET_PERIOD = 600.0
"""


def test_reset_dtbt_tracks_column_thickness():
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    import jax.numpy as jnp

    m = build_model(ParamFile(text=CFG))
    n0 = m.reset_dtbt(m.state)
    assert n0 >= 1
    # doubling the column thickness raises the wave speed by sqrt(2)
    # and must not lower the substep count
    import dataclasses
    s2 = dataclasses.replace(m.state, h=2.0 * m.state.h)
    n2 = m.reset_dtbt(s2)
    assert n2 >= n0
    assert n2 >= int(np.ceil(n0 * np.sqrt(2.0))) - 1


def test_step_swap_carries_accumulators(tmp_path):
    """Mid-run nstep swap: identical trajectory when the substep count
    genuinely matches, carry threads through step_fn(carry=...)."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model

    m = build_model(ParamFile(text=CFG))
    step = m.step_fn()
    s, a, tr = m.state, m.split_state, m.tracers
    for k in range(2):
        s, a, tr = step(s, a, tr, n=k)
    t_before = step.truncations()
    # rebuild with the same nstep but carried accumulators
    step2 = m.step_fn(nstep_bt=step.nstep_bt, carry=step.carry())
    assert step2.nstep_bt == step.nstep_bt
    assert step2.truncations() == t_before
    s2, a2, tr2 = step2(s, a, tr, n=2)
    assert np.all(np.isfinite(np.asarray(m.domain.interior(s2.h))))

    # a genuinely different nstep still steps stably
    step3 = m.step_fn(nstep_bt=step.nstep_bt + 3, carry=step.carry())
    assert step3.nstep_bt == step.nstep_bt + 3
    s3, _, _ = step3(s, a, tr, n=2)
    assert np.all(np.isfinite(np.asarray(m.domain.interior(s3.h))))


def test_solo_driver_dtbt_reset(tmp_path):
    from mom6_tpu.drivers.solo import main
    case = tmp_path / "case"
    case.mkdir()
    (case / "MOM_input").write_text(CFG)
    main([str(case), "--cpu"])
    stats = open(os.path.join(case, "ocean.stats")).read()
    assert len(stats.splitlines()) >= 3
