"""2D domain decomposition and halo exchange — the TPU-native
replacement for the reference's FMS mpp_domains layer.

Re-design of ``MOM_domain_infra`` / ``MOM_domains``
(/root/reference/config_src/infra/FMS2/MOM_domain_infra.F90:171-1203,
/root/reference/src/framework/MOM_domains.F90:66-681).

Conventions
-----------
* All fields are stored in a *padded local view*: shape
  ``(..., njl + 2H, nil + 2H)`` where ``(njl, nil)`` is the per-device
  compute tile and ``H`` the halo width.  x is the last (lane) axis,
  y the second-to-last (sublane) axis — the TPU-friendly layout.
* Arakawa C-grid staggering is positional, not shape-based: for a cell
  ``(j, i)``, ``u[..., j, i]`` is the zonal velocity at its *east* face
  and ``v[..., j, i]`` the meridional velocity at its *north* face;
  ``q[..., j, i]`` sits at the cell's north-east corner.  With halos
  filled, every cell sees all of its faces (the "symmetric memory"
  guarantee of the reference, without the shifted index ranges).
* On one device the padded view covers the whole globe and
  :meth:`Domain.fill_halos` fills halos from the array's own opposite
  edge (reentrant) or zeros (solid wall).  Across devices the same call
  runs ``jax.lax.ppermute`` neighbor exchanges inside ``shard_map``;
  unpaired boundary receives are zero-filled by ppermute, which
  reproduces the solid-wall semantics, and reentrant wrap adds the
  (p-1, 0) pair.  Corners are handled by exchanging x first and letting
  the y strips span the freshly-filled x halos (Omit_Corners of the
  reference is the ``corners=False`` fast path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["Domain", "make_mesh", "pad_field", "unpad_field"]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Domain:
    """Static description of the horizontal domain decomposition."""

    ni: int                      # global compute points, x
    nj: int                      # global compute points, y
    halo: int = 4
    layout: tuple[int, int] = (1, 1)     # (shards_x, shards_y)
    reentrant_x: bool = False
    reentrant_y: bool = False
    # tripolar fold along the northern edge (the FOLD_NORTH_EDGE
    # flag of MOM_domains.F90:572): the north halo is the model's own
    # top rows reflected in x about the fold, with stagger-dependent
    # index shifts and a sign flip for vector components
    tripolar_n: bool = False
    shmap: bool = False          # True when executing inside shard_map
    axis_x: str = "x"
    axis_y: str = "y"

    def __post_init__(self):
        if self.ni % self.layout[0] or self.nj % self.layout[1]:
            raise ValueError(
                f"Global size ({self.ni},{self.nj}) not divisible by "
                f"layout {self.layout}")
        # halo data comes from the adjacent shard only (one ppermute
        # hop), so a tile must be at least as wide as the halo — the
        # same constraint FMS places on mpp_domains halos.
        if self.layout[0] > 1 and self.halo > self.ni // self.layout[0]:
            raise ValueError(f"halo {self.halo} wider than x tile "
                             f"{self.ni // self.layout[0]}")
        if self.layout[1] > 1 and self.halo > self.nj // self.layout[1]:
            raise ValueError(f"halo {self.halo} wider than y tile "
                             f"{self.nj // self.layout[1]}")

    # -- derived sizes -------------------------------------------------
    @property
    def nil(self) -> int:
        return self.ni // self.layout[0]

    @property
    def njl(self) -> int:
        return self.nj // self.layout[1]

    @property
    def nih(self) -> int:          # padded local x size
        return self.nil + 2 * self.halo

    @property
    def njh(self) -> int:          # padded local y size
        return self.njl + 2 * self.halo

    @property
    def isc(self) -> int:          # first compute index (x and y)
        return self.halo

    @property
    def iec(self) -> int:          # one-past-last compute index, x
        return self.halo + self.nil

    @property
    def jec(self) -> int:
        return self.halo + self.njl

    def sharded(self) -> "Domain":
        return dataclasses.replace(self, shmap=True)

    def local(self) -> "Domain":
        return dataclasses.replace(self, shmap=False)

    # -- views ---------------------------------------------------------
    def interior(self, f: jnp.ndarray) -> jnp.ndarray:
        """Strip halos: the (..., njl, nil) compute tile."""
        H = self.halo
        return f[..., H:H + self.njl, H:H + self.nil]

    def pad(self, f: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad a (..., njl, nil) tile out to the halo-padded view."""
        H = self.halo
        pads = [(0, 0)] * (f.ndim - 2) + [(H, H), (H, H)]
        return jnp.pad(f, pads)

    # -- halo exchange ---------------------------------------------------
    def fill_halos(self, f, width: int | None = None, corners: bool = True,
                   stagger: str = "T", sign: float = 1.0):
        """Refresh halo zones of a field or pytree of fields.

        Functional counterpart of pass_var/pass_vector/do_group_pass
        (MOM_domain_infra.F90:218,514,1141): returns arrays with halos
        filled to ``width`` (default: full halo).

        ``stagger`` ('T'|'U'|'V'|'Q') and ``sign`` only matter across a
        tripolar fold (tripolar_n), where the reflected copy is offset
        by one point for face/corner quantities and vector components
        change sign; every field in the pytree must share them — use
        :meth:`fill_vector_halos` for (u, v) pairs.
        """
        w = self.halo if width is None else width
        if w == 0:
            return f
        if w > self.halo:
            raise ValueError(f"halo width {w} exceeds allocated halo {self.halo}")
        fn = self._fill_shmap if self.shmap else self._fill_local
        return jax.tree.map(lambda a: fn(a, w, corners, stagger, sign), f)

    def fill_vector_halos(self, u, v, width: int | None = None,
                          corners: bool = True, stagger: str = "C"):
        """pass_vector analog: C-grid (u at east faces, v at north
        faces) or B-grid (both at corners) component pairs, with the
        tripolar-fold sign flip."""
        if stagger.upper() == "B":
            su = sv = "Q"
        else:
            su, sv = "U", "V"
        return (self.fill_halos(u, width, corners, stagger=su, sign=-1.0),
                self.fill_halos(v, width, corners, stagger=sv, sign=-1.0))

    def fill_halos_group(self, fields, width: int | None = None,
                         corners: bool = True):
        """Fused group pass: ONE halo exchange for a whole pytree.

        All leaves are stacked along a leading plane axis (k-planes of
        3-D fields, singleton planes of 2-D fields) so each direction
        moves a single large strip through ``ppermute`` instead of one
        message per field — the ICI cost of a halo strip is dominated
        by per-message latency, so fewer/larger messages is the win the
        reference gets from its grouped passes
        (create_group_pass/do_group_pass, MOM_domain_infra.F90:1141).
        XLA's latency-hiding scheduler then overlaps the fused
        collective-permute with any independent interior compute.

        Tripolar folds are stagger/sign-dependent per field and 2-D
        leaves of a different (njh, nih) footprint cannot ride the
        stack; those cases fall back to per-leaf :meth:`fill_halos`
        (bitwise-identical semantics either way).
        """
        w = self.halo if width is None else width
        leaves, treedef = jax.tree.flatten(fields)
        if (w == 0 or not self.shmap or self.tripolar_n
                or len(leaves) <= 1):
            return self.fill_halos(fields, width, corners)
        njh_nih = leaves[0].shape[-2:]
        dt = leaves[0].dtype
        if any(a.shape[-2:] != njh_nih or a.dtype != dt
               for a in leaves):
            return self.fill_halos(fields, width, corners)
        import numpy as _np
        flat = [a.reshape((-1,) + njh_nih) for a in leaves]
        sizes = [p.shape[0] for p in flat]
        stacked = jnp.concatenate(flat, axis=0)
        stacked = self._fill_shmap(stacked, w, corners)
        outs = jnp.split(stacked, list(_np.cumsum(sizes[:-1])), axis=0)
        new_leaves = [o.reshape(a.shape) for o, a in zip(outs, leaves)]
        return jax.tree.unflatten(treedef, new_leaves)

    def _fold_strip(self, f: jnp.ndarray, w: int, stagger: str,
                    sign: float) -> jnp.ndarray:
        """The w rows that a tripolar fold writes into the north halo,
        built from this tile's own top rows: y-reflected about the
        fold, x-reversed in the local frame (the cross-shard reversal
        is the partner-column ppermute in _exchange_y), with the
        one-point shifts of face/corner staggering.

        Index map (global, 0-based): T/V points reflect x as
        i -> ni-1-i, U/Q (east-face/corner) as i -> ni-2-i; T/U halo
        row nj+k sources row nj-1-k, V/Q (north-face/corner) source
        row nj-2-k.  The local flip of the *padded* tile realizes the
        global x reversal because column c's flipped tile lands on
        column px-1-c (MOM_domain_infra.F90 pass_var fold semantics).
        """
        H, nj = self.halo, self.njl
        joff = 2 if stagger in ("V", "Q") else 1
        rows = f[..., H + nj - joff - (w - 1):H + nj - joff + 1, :]
        strip = jnp.flip(jnp.flip(rows, axis=-2), axis=-1)
        if stagger in ("U", "Q"):
            strip = jnp.roll(strip, -1, axis=-1)
        return sign * strip

    def _wall_mask_x(self, w: int, nih: int, dtype):
        """True on the w halo columns adjacent to solid x walls."""
        H, ni = self.halo, self.nil
        i = jnp.arange(nih)
        return ((i >= H - w) & (i < H)) | ((i >= H + ni)
                                           & (i < H + ni + w))

    def _wall_mask_y(self, w: int, njh: int):
        H, nj = self.halo, self.njl
        j = jnp.arange(njh)
        return ((j >= H - w) & (j < H)) | ((j >= H + nj)
                                           & (j < H + nj + w))

    def _fill_local(self, f: jnp.ndarray, w: int, corners: bool,
                    stagger: str = "T", sign: float = 1.0) -> jnp.ndarray:
        H, ni, nj = self.halo, self.nil, self.njl
        if self.layout != (1, 1):
            raise ValueError("local halo fill requires layout (1,1); "
                             "use shard_map for decomposed runs")
        # x direction.  A wrap is ONE concatenate (a single full-array
        # copy) instead of two dynamic-update-slices (two copies); a
        # solid wall is a where-zero on a constant index mask, which
        # XLA fuses into the consumer for ~no extra HBM traffic.
        if self.reentrant_x:
            west = f[..., :, H + ni - w:H + ni]
            east = f[..., :, H:H + w]
            f = jnp.concatenate(
                [f[..., :, :H - w], west, f[..., :, H:H + ni], east,
                 f[..., :, H + ni + w:]], axis=-1)
        else:
            f = jnp.where(self._wall_mask_x(w, f.shape[-1], f.dtype),
                          jnp.zeros((), dtype=f.dtype), f)
        # y direction (strips span x halos → corners filled)
        if self.tripolar_n:
            north = self._fold_strip(f, w, stagger, sign)
            if self.reentrant_y:
                south = f[..., H + nj - w:H + nj, :]
            else:
                south = jnp.zeros_like(f[..., :w, :])
            f = f.at[..., H - w:H, :].set(south)
            f = f.at[..., H + nj:H + nj + w, :].set(north)
            if self.reentrant_x:
                # corner refresh: fold-row x halos wrap through the
                # (correct) compute columns of the fold rows
                f = self._fill_local_x(f, w)
            return f
        if self.reentrant_y:
            south = f[..., H + nj - w:H + nj, :]
            north = f[..., H:H + w, :]
            f = jnp.concatenate(
                [f[..., :H - w, :], south, f[..., H:H + nj, :], north,
                 f[..., H + nj + w:, :]], axis=-2)
        else:
            f = jnp.where(self._wall_mask_y(w, f.shape[-2])[:, None],
                          jnp.zeros((), dtype=f.dtype), f)
        return f

    def _fill_shmap(self, f: jnp.ndarray, w: int, corners: bool,
                    stagger: str = "T", sign: float = 1.0) -> jnp.ndarray:
        f = self._exchange_x(f, w)
        f = self._exchange_y(f, w, stagger, sign)
        if self.tripolar_n:
            # corner refresh: the fold writes new north-halo rows whose
            # own x-halo columns must wrap through the x neighbors (the
            # reference refreshes folded corners the same way)
            f = self._exchange_x(f, w)
        return f

    def _exchange_x(self, f: jnp.ndarray, w: int) -> jnp.ndarray:
        H, ni = self.halo, self.nil
        px = self.layout[0]
        if px > 1 or self.reentrant_x:
            # eastward sends: my east interior edge → east neighbor's west halo
            fwd = [(i, i + 1) for i in range(px - 1)]
            bwd = [(i + 1, i) for i in range(px - 1)]
            if self.reentrant_x:
                fwd.append((px - 1, 0))
                bwd.append((0, px - 1))
            east_edge = f[..., :, H + ni - w:H + ni]
            west_edge = f[..., :, H:H + w]
            from_west = jax.lax.ppermute(east_edge, self.axis_x, fwd)
            from_east = jax.lax.ppermute(west_edge, self.axis_x, bwd)
            f = f.at[..., :, H - w:H].set(from_west)
            f = f.at[..., :, H + ni:H + ni + w].set(from_east)
        else:
            f = jnp.where(self._wall_mask_x(w, f.shape[-1], f.dtype),
                          jnp.zeros((), dtype=f.dtype), f)
        return f

    def _exchange_y(self, f: jnp.ndarray, w: int, stagger: str = "T",
                    sign: float = 1.0) -> jnp.ndarray:
        H, nj = self.halo, self.njl
        py = self.layout[1]
        if py > 1 or self.reentrant_y:
            fwd = [(i, i + 1) for i in range(py - 1)]
            bwd = [(i + 1, i) for i in range(py - 1)]
            if self.reentrant_y:
                fwd.append((py - 1, 0))
                bwd.append((0, py - 1))
            north_edge = f[..., H + nj - w:H + nj, :]
            south_edge = f[..., H:H + w, :]
            from_south = jax.lax.ppermute(north_edge, self.axis_y, fwd)
            from_north = jax.lax.ppermute(south_edge, self.axis_y, bwd)
            f = f.at[..., H - w:H, :].set(from_south)
            f = f.at[..., H + nj:H + nj + w, :].set(from_north)
        else:
            f = jnp.where(self._wall_mask_y(w, f.shape[-2])[:, None],
                          jnp.zeros((), dtype=f.dtype), f)
        if self.tripolar_n:
            f = self._fold_shmap(f, w, stagger, sign)
        return f

    def _fold_shmap(self, f: jnp.ndarray, w: int, stagger: str,
                    sign: float) -> jnp.ndarray:
        """Tripolar north-halo fill under shard_map: every shard builds
        its fold strip locally; shard column c swaps strips with its
        mirror column px-1-c via ppermute; only the top shard row
        (ry == py-1) writes the result into its north halo."""
        H, nj = self.halo, self.njl
        px, py = self.layout
        strip = self._fold_strip(f, w, stagger, sign)
        if px > 1:
            pairs = [(c, px - 1 - c) for c in range(px)
                     if c != px - 1 - c]
            swapped = jax.lax.ppermute(strip, self.axis_x, pairs)
            if px % 2 == 1:
                cx = jax.lax.axis_index(self.axis_x)
                mid = (cx == px - 1 - cx)
                swapped = jnp.where(mid, strip, swapped)
            strip = swapped
        north = f[..., H + nj:H + nj + w, :]
        if py > 1:
            ry = jax.lax.axis_index(self.axis_y)
            north = jnp.where(ry == py - 1, strip, north)
        else:
            north = strip
        return f.at[..., H + nj:H + nj + w, :].set(north)

    # single-direction fills used by directionally-split sweeps
    def fill_halos_x(self, f, width: int | None = None):
        w = self.halo if width is None else width
        if self.shmap:
            return jax.tree.map(lambda a: self._exchange_x(a, w), f)
        return jax.tree.map(lambda a: self._fill_local_x(a, w), f)

    def fill_halos_y(self, f, width: int | None = None,
                     stagger: str = "T", sign: float = 1.0):
        w = self.halo if width is None else width
        if self.shmap:
            return jax.tree.map(
                lambda a: self._exchange_y(a, w, stagger, sign), f)
        return jax.tree.map(
            lambda a: self._fill_local_y(a, w, stagger, sign), f)

    def _fill_local_x(self, f, w):
        H, ni = self.halo, self.nil
        if self.reentrant_x:
            west = f[..., :, H + ni - w:H + ni]
            east = f[..., :, H:H + w]
            return jnp.concatenate(
                [f[..., :, :H - w], west, f[..., :, H:H + ni], east,
                 f[..., :, H + ni + w:]], axis=-1)
        return jnp.where(self._wall_mask_x(w, f.shape[-1], f.dtype),
                         jnp.zeros((), dtype=f.dtype), f)

    def _fill_local_y(self, f, w, stagger: str = "T", sign: float = 1.0):
        H, nj = self.halo, self.njl
        if self.tripolar_n:
            north = self._fold_strip(f, w, stagger, sign)
            if self.reentrant_y:
                south = f[..., H + nj - w:H + nj, :]
            else:
                south = jnp.zeros_like(f[..., :w, :])
            f = f.at[..., H - w:H, :].set(south)
            f = f.at[..., H + nj:H + nj + w, :].set(north)
            return f
        if self.reentrant_y:
            south = f[..., H + nj - w:H + nj, :]
            north = f[..., H:H + w, :]
            return jnp.concatenate(
                [f[..., :H - w, :], south, f[..., H:H + nj, :], north,
                 f[..., H + nj + w:, :]], axis=-2)
        return jnp.where(self._wall_mask_y(w, f.shape[-2])[:, None],
                         jnp.zeros((), dtype=f.dtype), f)

    # -- reductions ------------------------------------------------------
    def axis_names(self) -> tuple[str, ...]:
        if not self.shmap:
            return ()
        return (self.axis_y, self.axis_x)

    def global_sum(self, f: jnp.ndarray, interior_only: bool = True):
        """Plain (fast, non-reproducing) global sum over compute domain."""
        x = self.interior(f) if interior_only else f
        s = jnp.sum(x)
        for ax in self.axis_names():
            s = jax.lax.psum(s, ax)
        return s

    def global_max(self, f: jnp.ndarray, interior_only: bool = True):
        x = self.interior(f) if interior_only else f
        s = jnp.max(x)
        for ax in self.axis_names():
            s = jax.lax.pmax(s, ax)
        return s

    def global_min(self, f: jnp.ndarray, interior_only: bool = True):
        x = self.interior(f) if interior_only else f
        s = jnp.min(x)
        for ax in self.axis_names():
            s = jax.lax.pmin(s, ax)
        return s


def make_mesh(layout: tuple[int, int], devices=None) -> Mesh:
    """Create a ('y','x') device mesh matching a Domain layout."""
    px, py = layout
    if devices is None:
        devices = jax.devices()
    if len(devices) < px * py:
        raise ValueError(f"need {px*py} devices, have {len(devices)}")
    dev = np.array(devices[:px * py]).reshape(py, px)
    return Mesh(dev, (("y", "x")))


def pad_field(domain: Domain, f: jnp.ndarray) -> jnp.ndarray:
    """Global (..., nj, ni) array → blocked padded (..., py*njh, px*nih).

    Each device's block of the result is its halo-padded local tile
    (halos zero; call fill_halos inside shard_map to populate).  Used to
    set up the resident distributed state layout.
    """
    px, py = domain.layout
    H = domain.halo
    njl, nil = domain.njl, domain.nil
    lead = f.shape[:-2]
    f = f.reshape(lead + (py, njl, px, nil))
    pads = [(0, 0)] * len(lead) + [(0, 0), (H, H), (0, 0), (H, H)]
    f = jnp.pad(f, pads)   # lead + (py, njh, px, nih)
    return f.reshape(lead + (py * (njl + 2 * H), px * (nil + 2 * H)))


def unpad_field(domain: Domain, f: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pad_field: blocked padded array → global compute array."""
    px, py = domain.layout
    H = domain.halo
    njl, nil = domain.njl, domain.nil
    lead = f.shape[:-2]
    f = f.reshape(lead + (py, njl + 2 * H, px, nil + 2 * H))
    f = f[..., :, H:H + njl, :, H:H + nil]
    return f.reshape(lead + (py * njl, px * nil))
