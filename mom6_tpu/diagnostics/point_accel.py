"""Truncation-point column dumps.

Re-design of /root/reference/src/diagnostics/MOM_PointAccel.F90
(write_u_accel / write_v_accel): when the velocity limiter truncates,
dump the state of the worst column to a text file so the blowup can
be diagnosed.  The reference writes the full acceleration budget from
inside the step; here the driver dumps the prognostic column (u, v,
h, T, S and the location) after the step — the state needed to replay
the column — which avoids threading diagnostics through the jitted
step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["dump_worst_column"]


def dump_worst_column(path: str, domain, grid, state, step: int,
                      label: str = "") -> str:
    """Append the column at the current |u|max point to ``path``.

    Returns the formatted block (also written to the file)."""
    ui = np.asarray(domain.interior(state.u))
    vi = np.asarray(domain.interior(state.v))
    sp = np.abs(ui) + np.abs(vi)
    k, j, i = np.unravel_index(np.argmax(sp), sp.shape)
    H = domain.halo
    jj, ii = j + H, i + H
    cols = {"u": np.asarray(state.u[:, jj, ii]),
            "v": np.asarray(state.v[:, jj, ii]),
            "h": np.asarray(state.h[:, jj, ii])}
    if state.T is not None:
        cols["T"] = np.asarray(state.T[:, jj, ii])
        cols["S"] = np.asarray(state.S[:, jj, ii])
    lines = [f"# step {step} {label}: worst column at "
             f"(i={i}, j={j}, k={k}), depth "
             f"{float(grid.bathyT[jj, ii]):.1f} m, "
             f"|u|max={sp[k, j, i]:.4e} m/s"]
    for name, col in cols.items():
        vals = " ".join(f"{x: .6e}" for x in col)
        lines.append(f"{name}: {vals}")
    block = "\n".join(lines) + "\n"
    with open(path, "a") as f:
        f.write(block)
    return block
