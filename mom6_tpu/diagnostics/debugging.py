"""Debugging aids: state checksums and cross-shard redundancy checks.

Re-designs of /root/reference/src/core/MOM_checksum_packages.F90
(MOM_state_chksum bundles) and /root/reference/src/diagnostics/
MOM_debugging.F90:104-552 (check_redundant — verifying that values in
halo zones match the neighboring shard's interior, the distributed-
correctness self-check that plays the role of a race detector in the
reference's MPI world).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mom6_tpu.framework.checksums import chksum, Chksum
from mom6_tpu.parallel.domain import Domain, unpad_field

__all__ = ["state_chksum", "check_halo_consistency"]


def state_chksum(domain: Domain, state, label: str = "") -> dict:
    """min/max/mean/bitcount bundle for the prognostic state
    (MOM_state_chksum)."""
    out = {}
    for name in ("u", "v", "h", "T", "S"):
        f = getattr(state, name, None)
        if f is not None:
            out[name] = chksum(domain, f)
    if label:
        for k, v in out.items():
            print(f"{label} {k}: {v}")
    return out


def check_halo_consistency(domain: Domain, blocked_field,
                           reentrant_wrap: bool = True,
                           atol: float = 0.0) -> int:
    """Host-side check that every shard's halo equals the neighboring
    shard's interior in a blocked (py*njh, px*nih) array (the
    check_redundant analog).  Returns the number of mismatches."""
    px, py = domain.layout
    H = domain.halo
    njl, nil = domain.njl, domain.nil
    x = np.asarray(blocked_field)
    lead = x.shape[:-2]
    xb = x.reshape(lead + (py, njl + 2 * H, px, nil + 2 * H))
    interior = unpad_field(domain, blocked_field)
    gi = np.asarray(interior)
    nj, ni = py * njl, px * nil
    bad = 0
    for by in range(py):
        for bx in range(px):
            tile = xb[..., by, :, bx, :]
            for jj in range(njl + 2 * H):
                for ii in range(nil + 2 * H):
                    gj = by * njl + jj - H
                    gib = bx * nil + ii - H
                    if reentrant_wrap:
                        gj %= nj
                        gib %= ni
                    elif not (0 <= gj < nj and 0 <= gib < ni):
                        continue
                    expect = gi[..., gj, gib]
                    got = tile[..., jj, ii]
                    if not np.allclose(got, expect, atol=atol, rtol=0):
                        bad += 1
    return bad
