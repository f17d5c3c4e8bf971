"""Clocks/profiling and error-channel infrastructure.

Covers the redesigns of /root/reference/src/framework/MOM_cpu_clock.F90
and /root/reference/src/framework/MOM_error_handler.F90.
"""

import io

import pytest

from mom6_tpu.framework.clock import ClockRegistry
from mom6_tpu.framework.error_handler import (
    FATAL, WARNING, NOTE, FatalError, MOM_error, MOM_mesg,
    set_verbosity, set_log_file, call_tree)


def test_clock_counts_and_report():
    clocks = ClockRegistry(trace=False)
    with clocks("outer"):
        with clocks("inner"):
            pass
        with clocks("inner"):
            pass
    rep = clocks.report()
    assert clocks._clocks["outer"].count == 1
    assert clocks._clocks["inner"].count == 2
    # nested clock is indented under its parent in the report
    assert "outer" in rep and "  inner" in rep
    clocks.reset()
    assert clocks.report().count("\n") == 1  # header only


def test_clock_exception_still_recorded():
    clocks = ClockRegistry(trace=False)
    with pytest.raises(ValueError):
        with clocks("failing"):
            raise ValueError("boom")
    assert clocks._clocks["failing"].count == 1
    assert not clocks._stack  # stack unwound


def test_clock_sync_blocks_on_result():
    import jax.numpy as jnp
    clocks = ClockRegistry(trace=False)
    x = jnp.ones((8, 8))
    with clocks("device", sync=lambda: y):
        y = x @ x
    assert clocks._clocks["device"].total >= 0.0


def test_fatal_raises_and_logs():
    log = io.StringIO()
    set_log_file(log)
    try:
        with pytest.raises(FatalError, match="bad state"):
            MOM_error(FATAL, "bad state")
    finally:
        set_log_file(None)
    assert "FATAL: bad state" in log.getvalue()


def test_verbosity_filters_notes():
    log = io.StringIO()
    set_log_file(log)
    try:
        set_verbosity(1)
        MOM_error(NOTE, "quiet note")
        MOM_error(WARNING, "loud warning")
        set_verbosity(2)
        MOM_mesg("a mesg")
    finally:
        set_log_file(None)
        set_verbosity(2)
    text = log.getvalue()
    assert "quiet note" not in text
    assert "WARNING: loud warning" in text
    assert "a mesg" in text


def test_call_tree_trail_in_messages():
    log = io.StringIO()
    set_log_file(log)
    try:
        with call_tree("step_MOM", enabled=True):
            with call_tree("diabatic"):
                MOM_error(WARNING, "inside")
        MOM_error(WARNING, "outside")
    finally:
        set_log_file(None)
        with call_tree("off", enabled=False):
            pass
    text = log.getvalue()
    assert "[in step_MOM > diabatic]" in text
    assert "outside" in text and "outside [in" not in text


def test_blowup_is_fatal_subclass():
    from mom6_tpu.diagnostics.sum_output import EnergyBlowupError
    assert issubclass(EnergyBlowupError, FatalError)
