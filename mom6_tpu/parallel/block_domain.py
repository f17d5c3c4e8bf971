"""Block-compressed domain: land-block compute elimination.

The reference removes all-land ranks from its MPI layout so they cost
nothing (gen_auto_mask_table / determine_land_blocks,
/root/reference/src/framework/MOM_domains.F90:488-681).  Under SPMD a
device cannot simply "leave the mesh", so the TPU-native equivalent
compresses the *array layout* instead: the horizontal domain is cut
into (tj × ti) blocks, all-land blocks are dropped, and the surviving
wet blocks are stacked along the i (lane) axis — each carrying its own
halo ring — giving rank-3 arrays of shape (..., tj+2h, B·(ti+2h)).

Why the i axis: the TPU vector unit tiles the minor dimension in
128-lane chunks, so a lone block's padded width ti+2h (e.g. 136) would
round up to 256 lanes and waste ~half the machine; concatenating the
blocks along the lanes amortizes that round-up across the whole stack
(B·136 → one ≤128-lane round-up total).  The sublane (second-minor)
dimension only rounds to multiples of 8, which tj+2h already is.

Why this works unchanged: every stencil in the model reaches at most
``halo`` cells, so provided each block's ring is refreshed from its
true neighbors, ``ip1/jm1``-style shifted-slice stencils work
UNCHANGED on the packed layout — values that cross a block boundary
land in halo positions that the next fill refreshes.  Halo refresh is
a static-index gather over the block axis (XLA lowers it to cheap
copies), with walls/reentrancy expressed through the precomputed
neighbor table exactly like the dense Domain's wrap/zero logic.

Compute saved ≈ land fraction × (useful/padded block area).  At the
OM4-class 0.25° grid ~40 % of blocks are land; with 128×128 blocks the
packing overhead is ~12 %, a net ~30 % throughput gain.

This class intentionally mirrors the :class:`Domain` API (nil/njl,
interior/pad, fill_halos/fill_vector_halos, global reductions) so
model components are layout-agnostic.  v1 scope: single-device,
reentrant x/y or walls; tripolar folds and shard_map distribution of
the block axis stay on the dense Domain path.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BlockDomain", "choose_wet_blocks", "blockify", "unblockify"]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class BlockDomain:
    ni: int                       # global compute points, x
    nj: int                       # global compute points, y
    tj: int                       # block interior rows
    ti: int                       # block interior cols
    blocks: tuple                 # ((jb, ib), ...) wet blocks, ordered
    halo: int = 4
    reentrant_x: bool = False
    reentrant_y: bool = False
    # kept for Domain API parity (checked false)
    tripolar_n: bool = False
    shmap: bool = False
    layout: tuple = (1, 1)

    def __post_init__(self):
        if self.ni % self.ti or self.nj % self.tj:
            raise ValueError(f"({self.nj},{self.ni}) not divisible by "
                             f"block ({self.tj},{self.ti})")
        if self.halo > self.ti or self.halo > self.tj:
            raise ValueError("halo wider than block interior")

    # -- derived sizes (Domain API) -----------------------------------
    @property
    def nbx(self) -> int:
        return self.ni // self.ti

    @property
    def nby(self) -> int:
        return self.nj // self.tj

    @property
    def nb(self) -> int:
        return len(self.blocks)

    @property
    def tjh(self) -> int:
        return self.tj + 2 * self.halo

    @property
    def tih(self) -> int:
        return self.ti + 2 * self.halo

    @property
    def nil(self) -> int:
        return self.nb * self.ti

    @property
    def njl(self) -> int:
        return self.tj

    @property
    def nih(self) -> int:
        return self.nb * self.tih

    @property
    def njh(self) -> int:
        return self.tjh

    def sharded(self):
        raise NotImplementedError(
            "block-compressed domains are single-device in v1; use the "
            "dense Domain for shard_map runs")

    def local(self):
        return self

    def axis_names(self):
        return ()

    # -- block index tables (host, cached) ----------------------------
    def _tables(self):
        """Neighbor ids per wet block for W/E/S/N (self.nb entries
        each; value nb = the all-zero ghost block)."""
        if not hasattr(self, "_tbl"):
            idx = {c: k for k, c in enumerate(self.blocks)}
            ghost = self.nb

            def nb_of(jb, ib, dj, di):
                jn, in_ = jb + dj, ib + di
                if in_ < 0:
                    in_ = self.nbx - 1 if self.reentrant_x else None
                elif in_ >= self.nbx:
                    in_ = 0 if self.reentrant_x else None
                if jn < 0:
                    jn = self.nby - 1 if self.reentrant_y else None
                elif jn >= self.nby:
                    jn = 0 if self.reentrant_y else None
                if jn is None or in_ is None:
                    return ghost
                return idx.get((jn, in_), ghost)

            tbl = {}
            for nm, (dj, di) in (("w", (0, -1)), ("e", (0, 1)),
                                 ("s", (-1, 0)), ("n", (1, 0))):
                tbl[nm] = np.asarray(
                    [nb_of(jb, ib, dj, di) for jb, ib in self.blocks],
                    np.int32)
            object.__setattr__(self, "_tbl", tbl)
        return self._tbl

    # -- views (Domain API) -------------------------------------------
    def _as_blocks(self, f):
        """(..., tjh, nb·tih) → (..., tjh, nb, tih) view (free: splits
        the minor dim)."""
        return f.reshape(f.shape[:-1] + (self.nb, self.tih))

    def _from_blocks(self, fb):
        return fb.reshape(fb.shape[:-2] + (self.nb * self.tih,))

    def interior(self, f):
        """Strip per-block halos: (..., tj, nb·ti)."""
        H = self.halo
        fb = self._as_blocks(f)
        fb = fb[..., H:H + self.tj, :, H:H + self.ti]
        return fb.reshape(fb.shape[:-2] + (self.nb * self.ti,))

    def pad(self, f):
        """(..., tj, nb·ti) → halo-padded block stack (zero rings)."""
        H = self.halo
        fb = f.reshape(f.shape[:-1] + (self.nb, self.ti))
        pads = [(0, 0)] * (fb.ndim - 3) + [(H, H), (0, 0), (H, H)]
        return self._from_blocks(jnp.pad(fb, pads))

    # -- halo exchange -------------------------------------------------
    def fill_halos(self, f, width: int | None = None,
                   corners: bool = True, stagger: str = "T",
                   sign: float = 1.0):
        w = self.halo if width is None else width
        if w == 0:
            return f
        if w > self.halo:
            raise ValueError(f"halo width {w} exceeds {self.halo}")
        return jax.tree.map(lambda a: self._fill(a, w), f)

    def fill_halos_group(self, fields, width: int | None = None,
                         corners: bool = True):
        # single-device: per-leaf fills are already gather/concat only
        return self.fill_halos(fields, width, corners)

    def fill_vector_halos(self, u, v, width=None, corners=True,
                          stagger: str = "C"):
        # no tripolar fold in v1 → no sign flips/stagger shifts
        return (self.fill_halos(u, width), self.fill_halos(v, width))

    def fill_halos_x(self, f, width=None):
        w = self.halo if width is None else width
        return jax.tree.map(
            lambda a: self._from_blocks(
                self._fill_x(self._as_blocks(a), w)), f)

    def fill_halos_y(self, f, width=None, stagger="T", sign=1.0):
        w = self.halo if width is None else width
        return jax.tree.map(
            lambda a: self._from_blocks(
                self._fill_y(self._as_blocks(a), w)), f)

    def _gather(self, fb, ids):
        """Gather blocks by id with a zeros ghost appended.
        fb: (..., tjh, nb, tih); gathers along the block axis (-2)."""
        zeros = jnp.zeros_like(fb[..., :1, :])
        fbz = jnp.concatenate([fb, zeros], axis=-2)
        return jnp.take(fbz, jnp.asarray(ids), axis=-2)

    def _fill_x(self, fb, w):
        H, ti = self.halo, self.ti
        t = self._tables()
        wnb = self._gather(fb, t["w"])
        enb = self._gather(fb, t["e"])
        west = wnb[..., H + ti - w:H + ti]
        east = enb[..., H:H + w]
        return jnp.concatenate(
            [fb[..., :H - w], west, fb[..., H:H + ti], east,
             fb[..., H + ti + w:]], axis=-1)

    def _fill_y(self, fb, w):
        H, tj = self.halo, self.tj
        t = self._tables()
        snb = self._gather(fb, t["s"])
        nnb = self._gather(fb, t["n"])
        # strips span the full padded x width, so corners pick up the
        # neighbor's just-filled x halos (the standard two-pass trick)
        south = snb[..., H + tj - w:H + tj, :, :]
        north = nnb[..., H:H + w, :, :]
        return jnp.concatenate(
            [fb[..., :H - w, :, :], south, fb[..., H:H + tj, :, :],
             north, fb[..., H + tj + w:, :, :]], axis=-3)

    def _fill(self, a, w):
        fb = self._as_blocks(a)
        fb = self._fill_x(fb, w)
        fb = self._fill_y(fb, w)
        return self._from_blocks(fb)

    # -- reductions (Domain API) --------------------------------------
    def global_sum(self, f, interior_only: bool = True):
        x = self.interior(f) if interior_only else f
        return jnp.sum(x)

    def global_max(self, f, interior_only: bool = True):
        x = self.interior(f) if interior_only else f
        return jnp.max(x)

    def global_min(self, f, interior_only: bool = True):
        x = self.interior(f) if interior_only else f
        return jnp.min(x)


def choose_wet_blocks(mask: np.ndarray, tj: int, ti: int,
                      halo: int = 4, reentrant_x: bool = True,
                      reentrant_y: bool = True) -> tuple:
    """Wet-block list from a (nj, ni) 0/1 land mask — the
    AUTO_MASKTABLE step (determine_land_blocks,
    MOM_domains.F90:633).  A block is eliminated only when it is land
    INCLUDING a halo-wide buffer ring, exactly like the reference's
    ibuf/jbuf criterion: stencils reach ``halo`` cells, and wet cells
    legitimately read land-cell *metrics* (the reference's loops do
    too), so every cell within stencil reach of water must live in a
    surviving block."""
    nj, ni = mask.shape
    out = []
    for jb in range(nj // tj):
        for ib in range(ni // ti):
            js, ie = jb * tj - halo, (ib + 1) * ti + halo
            is_, je = ib * ti - halo, (jb + 1) * tj + halo
            jj = np.arange(js, je)
            ii = np.arange(is_, ie)
            jj = jj % nj if reentrant_y else jj[(jj >= 0) & (jj < nj)]
            ii = ii % ni if reentrant_x else ii[(ii >= 0) & (ii < ni)]
            if np.any(mask[np.ix_(jj, ii)] > 0):
                out.append((jb, ib))
    return tuple(out)


def blockify(bd: BlockDomain, f):
    """Dense global (..., nj, ni) (no halos) → packed padded stack."""
    f = jnp.asarray(f)
    parts = []
    for jb, ib in bd.blocks:
        parts.append(f[..., jb * bd.tj:(jb + 1) * bd.tj,
                       ib * bd.ti:(ib + 1) * bd.ti])
    packed = jnp.stack(parts, axis=-2)          # (..., tj, nb, ti)
    packed = packed.reshape(packed.shape[:-2] + (bd.nb * bd.ti,))
    return bd.fill_halos(bd.pad(packed))


def blockify_grid(bd: BlockDomain, dense_domain, grid):
    """Dense :class:`~mom6_tpu.core.grid.Grid` → block-packed grid:
    every 2D metric gathered into the wet-block stack (halo rings
    from true neighbors; ghost-facing rings zero — which is why
    elimination keeps the halo-buffer rim, see choose_wet_blocks)."""
    import dataclasses as _dc
    repl = {}
    for fld in _dc.fields(grid):
        v = getattr(grid, fld.name)
        if fld.name == "domain":
            repl[fld.name] = bd
        elif hasattr(v, "ndim") and getattr(v, "ndim", 0) == 2:
            repl[fld.name] = blockify(bd, dense_domain.interior(v))
        else:
            repl[fld.name] = v
    return _dc.replace(grid, **repl)


def unblockify(bd: BlockDomain, f, fill=np.nan):
    """Packed padded stack → dense global (..., nj, ni) numpy array
    (land blocks = ``fill``)."""
    x = np.asarray(bd.interior(f))
    xb = x.reshape(x.shape[:-1] + (bd.nb, bd.ti))
    out = np.full(x.shape[:-2] + (bd.nj, bd.ni), fill, x.dtype)
    for k, (jb, ib) in enumerate(bd.blocks):
        out[..., jb * bd.tj:(jb + 1) * bd.tj,
            ib * bd.ti:(ib + 1) * bd.ti] = xb[..., :, k, :]
    return out
