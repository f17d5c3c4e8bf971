"""Error / message channel.

Re-design of /root/reference/src/framework/MOM_error_handler.F90:
``MOM_error(FATAL|WARNING|NOTE, msg)`` routed through one channel with
a registered log sink, ``MOM_mesg`` verbosity filtering, and the
callTree_enter/leave trail that prefixes messages when enabled.
FATAL raises ``FatalError`` (the Fortran abort) after logging, so
drivers and tests can intercept it.
"""

from __future__ import annotations

import contextlib
import sys

__all__ = ["FATAL", "WARNING", "NOTE", "FatalError", "MOM_error",
           "MOM_mesg", "set_verbosity", "set_log_file", "call_tree"]

FATAL, WARNING, NOTE = 0, 1, 2
_LABEL = {FATAL: "FATAL", WARNING: "WARNING", NOTE: "NOTE"}


class FatalError(RuntimeError):
    """Raised by MOM_error(FATAL, ...) — the MOM6 abort path."""


_state = {"verbosity": 2, "log": None, "tree": [], "tree_on": False}


def set_verbosity(level: int):
    """0 = errors only, 1 = +warnings, 2 = +notes, 3+ = +debug mesg."""
    _state["verbosity"] = int(level)


def set_log_file(fileobj):
    """Additionally write every message to this open file object."""
    _state["log"] = fileobj


def _emit(line: str):
    print(line, file=sys.stderr)
    if _state["log"] is not None:
        _state["log"].write(line + "\n")
        _state["log"].flush()


def MOM_error(level: int, message: str):
    trail = ""
    if _state["tree_on"] and _state["tree"]:
        trail = " [in " + " > ".join(_state["tree"]) + "]"
    if level == FATAL or level <= _state["verbosity"]:
        _emit(f"{_LABEL.get(level, 'NOTE')}: {message}{trail}")
    if level == FATAL:
        raise FatalError(message)


def MOM_mesg(message: str, verbosity: int = 2):
    if verbosity <= _state["verbosity"]:
        _emit(message)


@contextlib.contextmanager
def call_tree(name: str, enabled: bool | None = None):
    """callTree_enter/leave: record the active routine for message
    trails (and print at verbosity >= 3)."""
    if enabled is not None:
        _state["tree_on"] = enabled
    _state["tree"].append(name)
    if _state["verbosity"] >= 3:
        _emit("callTree: " + "  " * (len(_state["tree"]) - 1)
              + "-> " + name)
    try:
        yield
    finally:
        _state["tree"].pop()
