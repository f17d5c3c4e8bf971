"""Equations of state for seawater.

Re-design of the reference EOS façade
(/root/reference/src/equation_of_state/MOM_EOS.F90:228-1459): each EOS
is a small object with vectorized ``density(T, S, p)`` and
``density_derivs`` methods operating on whole arrays (no elemental
loops — the TPU form is fused elementwise math over (nk, njh, nih)
blocks).
"""

from __future__ import annotations

from mom6_tpu.eos.base import EOS
from mom6_tpu.eos.linear import LinearEOS
from mom6_tpu.eos.wright import WrightEOS, WrightFullEOS, WrightRedEOS
from mom6_tpu.eos.unesco import UnescoEOS
from mom6_tpu.eos.jackett06 import Jackett06EOS
from mom6_tpu.eos.roquet import RoquetRhoEOS, RoquetSpVEOS
from mom6_tpu.eos.teos10 import TEOS10EOS

__all__ = ["EOS", "LinearEOS", "WrightEOS", "WrightFullEOS", "WrightRedEOS",
           "UnescoEOS", "Jackett06EOS", "RoquetRhoEOS", "RoquetSpVEOS",
           "TEOS10EOS", "make_eos"]

_REGISTRY = {
    "LINEAR": LinearEOS,
    "WRIGHT": WrightEOS,
    "WRIGHT_FULL": WrightFullEOS,
    "WRIGHT_RED": WrightRedEOS,
    "UNESCO": UnescoEOS,
    "JACKETT_06": Jackett06EOS,
    "ROQUET_RHO": RoquetRhoEOS,
    "ROQUET_SPV": RoquetSpVEOS,
    "TEOS10": TEOS10EOS,
}


def make_eos(form: str = "WRIGHT", **kw) -> EOS:
    """EOS factory keyed on the reference's EQN_OF_STATE strings
    (MOM_EOS.F90:1459 EOS_init)."""
    key = form.upper()
    if key not in _REGISTRY:
        raise ValueError(f"Unknown EQN_OF_STATE '{form}'; known: "
                         + ", ".join(sorted(_REGISTRY)))
    return _REGISTRY[key](**kw)
