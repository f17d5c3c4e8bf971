"""Quarter-turn index rotation of C-grid fields.

Re-design of /root/reference/src/framework/MOM_array_transform.F90 and
the rotate_index machinery (MOM.F90:225,621): rotating the model state
and grid by 90° and re-running must reproduce the rotated solution —
a powerful stencil-correctness harness (the reference's test.rotate).

Convention: one counterclockwise quarter turn; old +x → new +y.
For the positional staggering (u at east faces stored at the cell
index, v at north faces, q at NE corners) on halo-padded arrays:

  scalar:  A'[j', i'] = A[J-1-i', j']          (J = padded nj)
  u → v':  v'[j', i'] = A_u[J-1-i', j']
  v → -u': u'[j', i'] = -A_v[J-1-i', j'-1]... (see functions)

Rotating a PADDED array works cell-for-cell when halo widths are
symmetric; the one-position staggering shifts are handled per kind.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rotate_scalar", "rotate_vector", "rotate_corner"]


def rotate_scalar(a):
    """CCW quarter turn of a cell-centered (..., nj, ni) field →
    (..., ni, nj)."""
    # new[j', i'] = old[nj-1-i', j']
    return jnp.flip(jnp.swapaxes(a, -1, -2), axis=-2)


def rotate_corner(q):
    """Corner (NE-of-cell) field under the quarter turn: the new NE
    corner corresponds to the old corner one position lower in the old
    x index → a -1 roll along the new j' axis after the scalar map."""
    r = rotate_scalar(q)
    return jnp.roll(r, -1, axis=-2)


def rotate_vector(u, v):
    """(u, v) at east/north faces → rotated (u', v').

    old +x becomes new +y: the old u (east face of old cell) sits on
    the NORTH face of the corresponding new cell → contributes to v'
    with sign +1.  The old v (north face) maps to the new WEST face →
    u' = −v with a one-cell shift in the new x' direction.
    """
    # with new[j', i'] = old[i', ni-1-j'] (new +x' = old +y):
    # old v (north faces) lands on new east faces with sign +1;
    # old u (east faces) lands on new north faces with sign -1 and a
    # one-cell shift along the new j' axis.
    u_new = rotate_scalar(v)
    v_new = -jnp.roll(rotate_scalar(u), -1, axis=-2)
    return u_new, v_new
