"""Obsolete-parameter guard.

Re-design of /root/reference/src/diagnostics/MOM_obsolete_params.F90:
parameters retired from the reference are flagged at startup — FATAL
when their presence can only mean a stale config (no safe value),
WARNING when the present value matches what the code now always does.
Run from build_model before the unused-parameter audit so users get
the reference's hint text instead of an anonymous "unused parameter"
failure.
"""

from __future__ import annotations

from mom6_tpu.framework.error_handler import (MOM_error, FATAL,
                                              WARNING)

__all__ = ["check_obsolete_params"]

# (name, safe_value_or_None, hint) — mirrors the obsolete_logical/
# real/int/char calls of MOM_obsolete_params.F90:32-130; a safe value
# of None means any occurrence is fatal.
_OBSOLETE = [
    ("BLOCKED_ANALYTIC_FV_PGF", None,
     "The blocked analytic PGF has been removed."),
    ("ADD_KV_SLOW", None,
     "Kv_slow is always added when set_visc provides it."),
    ("OBC_CONFIG", None, "Use OBC_SEGMENT_xxx instead."),
    ("READ_OBC_ETA", None, "Use OBC segment data files instead."),
    ("READ_OBC_UV", None, "Use OBC segment data files instead."),
    ("READ_OBC_TS", None, "Use OBC segment data files instead."),
    ("EXTEND_OBC_SEGMENTS", None, "Segments are always extended."),
    ("MEKE_VISCOSITY_COEFF", None,
     "Use MEKE_VISCOSITY_COEFF_KU instead."),
    ("CONVERT_THICKNESS_UNITS", True, ""),
    ("MASK_MASSLESS_TRACERS", False, ""),
    ("SALT_REJECT_BELOW_ML", False, ""),
    ("MLE_USE_MLD_AVE_BUG", False, ""),
    ("CORRECT_DENSITY", True, ""),
    ("WINDSTRESS_STAGGER", "C", "Use WIND_STAGGER instead."),
    ("VSTAR_SCALE_FACTOR", None,
     "Use EPBL_VEL_SCALE_FACTOR instead."),
    ("VSTAR_SCALE_COEF", None, ""),
    ("ZSTAR_RIGID_SURFACE_THRESHOLD", None, ""),
    ("HENYEY_IGW_BACKGROUND_NEW", None, ""),
    ("CONTINUITY_SCHEME", "PPM",
     "Only the PPM continuity scheme remains."),
    ("BT_MASS_SOURCE_LIMIT", 0.0, ""),
    ("FIRST_GUESS_SURFACE_LAYER_DEPTH", None, ""),
    ("CORRECT_SURFACE_LAYER_AVERAGE", None, ""),
    ("SEAMOUNT_LENGTH_SCALE", None,
     "Use SEAMOUNT_X_LENGTH_SCALE instead."),
    ("USE_LATERAL_BOUNDARY_DIFFUSION", None,
     "Use USE_HORIZONTAL_BOUNDARY_DIFFUSION instead."),
    ("MSTAR_FIXED", None, "Instead use MSTAR_MODE."),
    ("USE_VISBECK_SLOPE_BUG", False, ""),
    ("Use_PP81", None,
     "get_param is case sensitive so use USE_PP81."),
    ("ALLOW_CLOCKS_IN_OMP_LOOPS", True, ""),
    ("LARGE_FILE_SUPPORT", True, ""),
    ("MIN_Z_DIAG_INTERVAL", None, ""),
]


def check_obsolete_params(pf) -> None:
    """Flag any obsolete parameter present in the config files."""
    for name, safe, hint in _OBSOLETE:
        if not pf.has(name):
            continue
        typ = type(safe) if safe is not None else str
        val = pf.get(name, typ if typ is not str else str,
                     safe if safe is not None else "",
                     desc="OBSOLETE parameter")
        suffix = f" {hint}" if hint else ""
        if safe is None:
            MOM_error(FATAL, f"{name} is an obsolete parameter."
                             f"{suffix}")
        elif val != safe:
            MOM_error(FATAL, f"{name} is obsolete and can only take "
                             f"the value {safe!r}.{suffix}")
        else:
            MOM_error(WARNING, f"{name} is obsolete (harmless at "
                               f"{safe!r}); remove it.{suffix}")
