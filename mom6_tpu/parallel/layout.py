"""Layout selection and land-block mask tables.

Re-design of the layout machinery in
/root/reference/src/framework/MOM_domains.F90:488-681
(MOM_define_layout, mask-table ingestion, gen_auto_mask_table).

TPU framing: the reference eliminates all-land MPI ranks from the
communicator so they never run.  Under XLA SPMD every device in the
mesh executes the same program, so "elimination" here is numerical
rather than topological: a mask table zeroes the wet mask of listed
blocks (their tiles still execute but contribute nothing and halo
exchange stays globally correct), while :func:`define_layout` /
:func:`auto_mask_table` let a config pick the decomposition and
discover the skippable blocks the same way the reference tools
(check_mask) do.  The real TPU lever the table feeds is choosing a
``layout`` whose tiles align with land so the *useful* FLOPs per chip
stay balanced.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["define_layout", "read_mask_table", "write_mask_table",
           "auto_mask_table", "apply_mask_table"]


def define_layout(ni: int, nj: int, ndivs: int) -> tuple[int, int]:
    """Choose an (nx, ny) processor layout for ``ndivs`` devices with
    tiles as close to square as possible — MOM_define_layout
    (MOM_domains.F90:1181): start from the sqrt split and walk to the
    nearest factorization, preferring even splits of the longer axis.
    """
    if ndivs < 1:
        raise ValueError("ndivs must be >= 1")
    idiv = max(1, round(math.sqrt(ndivs * ni / max(nj, 1))))
    # search outward for a divisor of ndivs
    best = None
    for d in range(ndivs, 0, -1):
        if ndivs % d:
            continue
        if best is None or abs(d - idiv) < abs(best - idiv):
            best = d
    nx = best
    ny = ndivs // nx
    # both axes must be divisible into whole tiles in this framework;
    # prefer a factorization that divides the grid if one exists
    def ok(l):
        return ni % l[0] == 0 and nj % l[1] == 0
    if not ok((nx, ny)):
        cands = [(d, ndivs // d) for d in range(1, ndivs + 1)
                 if ndivs % d == 0 and ok((d, ndivs // d))]
        if cands:
            nx, ny = min(cands,
                         key=lambda l: abs(l[0] - idiv))
    return nx, ny


def read_mask_table(path: str) -> tuple[tuple[int, int],
                                        list[tuple[int, int]]]:
    """Parse an FMS mask_table: line 1 = number of masked blocks,
    line 2 = 'nx, ny' layout, then one 'i, j' (1-based) block per
    line (MOM_domains.F90:314-321)."""
    with open(path) as f:
        lines = [ln.split("#")[0].strip() for ln in f]
    lines = [ln for ln in lines if ln]
    n_mask = int(lines[0])
    nx, ny = (int(v) for v in lines[1].replace(",", " ").split())
    blocks = []
    for ln in lines[2:2 + n_mask]:
        i, j = (int(v) for v in ln.replace(",", " ").split())
        blocks.append((i, j))
    if len(blocks) != n_mask:
        raise ValueError(f"mask_table {path}: header says {n_mask} "
                         f"blocks, found {len(blocks)}")
    return (nx, ny), blocks


def write_mask_table(path: str, layout: tuple[int, int],
                     blocks: list[tuple[int, int]]) -> None:
    with open(path, "w") as f:
        f.write(f"{len(blocks)}\n{layout[0]}, {layout[1]}\n")
        for i, j in blocks:
            f.write(f"{i}, {j}\n")


def auto_mask_table(wet: np.ndarray, layout: tuple[int, int]
                    ) -> list[tuple[int, int]]:
    """All-land blocks of a (nj, ni) wet mask under ``layout`` —
    gen_auto_mask_table (MOM_domains.F90:322-335) without the
    PE-count re-balancing (the TPU mesh size is fixed by hardware).
    Returns 1-based (i, j) block coordinates."""
    nx, ny = layout
    nj, ni = wet.shape
    if ni % nx or nj % ny:
        raise ValueError(f"grid ({ni},{nj}) not divisible by layout "
                         f"({nx},{ny})")
    nil, njl = ni // nx, nj // ny
    blocks = []
    for bj in range(ny):
        for bi in range(nx):
            tile = wet[bj * njl:(bj + 1) * njl, bi * nil:(bi + 1) * nil]
            if not np.any(tile > 0):
                blocks.append((bi + 1, bj + 1))
    return blocks


def apply_mask_table(wet: np.ndarray, layout: tuple[int, int],
                     blocks: list[tuple[int, int]],
                     strict: bool = True) -> np.ndarray:
    """Zero the wet mask over each masked block.  With ``strict``,
    refuse blocks that contain ocean points — masking wet cells would
    silently change answers (the reference fatals identically when a
    mask table disagrees with the topography)."""
    nx, ny = layout
    nj, ni = wet.shape
    nil, njl = ni // nx, nj // ny
    out = np.array(wet, copy=True)
    for (bi, bj) in blocks:
        if not (1 <= bi <= nx and 1 <= bj <= ny):
            raise ValueError(f"mask_table block ({bi},{bj}) outside "
                             f"layout ({nx},{ny})")
        tile = out[(bj - 1) * njl:bj * njl, (bi - 1) * nil:bi * nil]
        if strict and np.any(tile > 0):
            raise ValueError(
                f"mask_table block ({bi},{bj}) contains "
                f"{int((tile > 0).sum())} ocean points; refusing to "
                "mask wet cells")
        tile[...] = 0
    return out
