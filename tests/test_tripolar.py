"""Tripolar north-edge fold and land-block mask tables.

The fold (FOLD_NORTH_EDGE of MOM_domains.F90:572, pass_var/pass_vector
semantics of MOM_domain_infra.F90) maps the north halo onto the
model's own top rows reflected in x, with one-point index shifts for
face/corner staggering and a sign flip for vector components:

  T: halo(nj+k, i) =  f(nj-1-k, ni-1-i)
  U: halo(nj+k, i) = -u(nj-1-k, ni-2-i)
  V: halo(nj+k, i) = -v(nj-2-k, ni-1-i)
  Q: halo(nj+k, i) =  q(nj-2-k, ni-2-i)   (sign -1 for B-grid vectors)

(global 0-based compute indices).  The decomposed fill must reproduce
the single-device fill exactly (layout invariance).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mom6_tpu.parallel.domain import Domain, make_mesh, pad_field, \
    unpad_field
from mom6_tpu.parallel.layout import (define_layout, read_mask_table,
                                      write_mask_table, auto_mask_table,
                                      apply_mask_table)

NI, NJ, H = 16, 12, 3


def _dom(layout=(1, 1), halo=H):
    return Domain(ni=NI, nj=NJ, halo=halo, layout=layout,
                  reentrant_x=True, tripolar_n=True)


def _field(seed=0, nz=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((nz, NJ, NI)))


def _filled(d, f, stagger="T", sign=1.0):
    return np.asarray(d.fill_halos(d.pad(f), stagger=stagger, sign=sign))


@pytest.mark.parametrize("stagger,sign,ioff,joff", [
    ("T", 1.0, 1, 1), ("U", -1.0, 2, 1),
    ("V", -1.0, 1, 2), ("Q", -1.0, 2, 2)])
def test_fold_index_map_local(stagger, sign, ioff, joff):
    d = _dom()
    f = np.asarray(_field())
    g = _filled(d, jnp.asarray(f), stagger=stagger, sign=sign)
    for k in range(H):
        for i in range(NI):
            src_j = NJ - joff - k
            src_i = (NI - ioff - i) % NI      # x-reentrant wrap
            np.testing.assert_allclose(
                g[:, H + NJ + k, H + i],
                sign * f[:, src_j, src_i],
                err_msg=f"{stagger} k={k} i={i}")


def test_fold_scalar_consistency():
    """A field symmetric under the fold map yields a halo identical to
    the mirrored interior — the bitwise self-consistency the reference
    checks with its redundant-point diagnostics."""
    d = _dom()
    # build a fold-symmetric T field: f(j,i) over the two rows that
    # meet at the fold must mirror
    f = np.asarray(_field(3))
    g = _filled(d, jnp.asarray(f), "T", 1.0)
    # the first halo row equals the top interior row reversed
    np.testing.assert_allclose(g[:, H + NJ, H:H + NI],
                               f[:, NJ - 1, ::-1])


def test_fold_vector_pair():
    d = _dom()
    u = _field(1)
    v = _field(2)
    gu, gv = d.fill_vector_halos(d.pad(u), d.pad(v))
    gu, gv = np.asarray(gu), np.asarray(gv)
    un, vn = np.asarray(u), np.asarray(v)
    # C-grid: u gets U-stagger with sign flip, v gets V-stagger
    np.testing.assert_allclose(gu[:, H + NJ, H:H + NI],
                               -un[:, NJ - 1, (NI - 2 - np.arange(NI)) % NI])
    np.testing.assert_allclose(gv[:, H + NJ, H:H + NI],
                               -vn[:, NJ - 2, ::-1])


@pytest.mark.parametrize("layout", [(2, 1), (4, 2), (2, 2), (1, 2)])
@pytest.mark.parametrize("stagger,sign", [("T", 1.0), ("U", -1.0),
                                          ("V", -1.0)])
def test_fold_layout_invariance(layout, stagger, sign):
    """Decomposed tripolar fill == single-device fill, including every
    halo cell of every shard (the mirror-column ppermute path)."""
    d1 = _dom()
    dn = _dom(layout).sharded()
    f = _field(5)
    ref = _filled(d1, f, stagger, sign)

    mesh = make_mesh(layout)
    fill = shard_map(
        lambda a: dn.fill_halos(a, stagger=stagger, sign=sign),
        mesh=mesh, in_specs=P(None, "y", "x"),
        out_specs=P(None, "y", "x"))
    got_blocked = np.asarray(jax.jit(fill)(pad_field(dn, f)))

    px, py = layout
    nil, njl = NI // px, NJ // py
    gb = got_blocked.reshape(2, py, njl + 2 * H, px, nil + 2 * H)
    for by in range(py):
        for bx in range(px):
            tile = gb[:, by, :, bx, :]
            exp = np.zeros_like(tile)
            for jj in range(njl + 2 * H):
                gj = by * njl + jj - H
                if gj < 0:
                    continue                      # solid south wall
                for ii in range(nil + 2 * H):
                    gi = bx * nil + ii - H
                    exp[:, jj, ii] = ref[:, H + gj, H + (gi % NI)]
            np.testing.assert_allclose(tile, exp,
                                       err_msg=f"tile {by},{bx}")


def test_define_layout():
    assert define_layout(32, 32, 4) == (2, 2)
    nx, ny = define_layout(64, 16, 8)
    assert nx * ny == 8 and nx > ny          # wide grid → wide layout
    assert define_layout(48, 16, 6) in ((3, 2), (6, 1))
    # divisibility preferred when the square-ish split doesn't divide
    nx, ny = define_layout(10, 12, 4)
    assert nx * ny == 4 and 10 % nx == 0 and 12 % ny == 0


def test_mask_table_roundtrip(tmp_path):
    p = str(tmp_path / "mask_table")
    write_mask_table(p, (4, 3), [(1, 2), (3, 3)])
    lay, blocks = read_mask_table(p)
    assert lay == (4, 3) and blocks == [(1, 2), (3, 3)]


def test_auto_mask_table_and_apply():
    wet = np.ones((12, 16))
    wet[0:6, 0:4] = 0.0                      # block (1,1) of a 4x2 layout
    blocks = auto_mask_table(wet, (4, 2))
    assert blocks == [(1, 1)]
    out = apply_mask_table(wet, (4, 2), blocks, strict=True)
    assert np.array_equal(out, wet)          # masking land is a no-op
    # refusing to mask wet cells
    with pytest.raises(ValueError, match="ocean points"):
        apply_mask_table(wet, (4, 2), [(2, 1)], strict=True)


def test_masktable_in_model(tmp_path):
    """MASKTABLE / AUTO_MASKTABLE flow through build_model."""
    from mom6_tpu.framework.config import ParamFile
    from mom6_tpu.model import build_model
    case = tmp_path
    base = f"""
NIGLOBAL = 16
NJGLOBAL = 12
NK = 2
DT = 600.0
DAYMAX = 0.01
GRID_CONFIG = cartesian
AXIS_UNITS = k
LENLON = 160.0
LENLAT = 120.0
TOPO_CONFIG = bowl
MAXIMUM_DEPTH = 1000.0
MINIMUM_DEPTH = 1.0
F_0 = 1.0e-4
TS_CONFIG = linear
T_RANGE = 0.0
S_RANGE = 0.0
EQN_OF_STATE = LINEAR
BULKMIXEDLAYER = False
INPUTDIR = {case}
"""
    (case / "MOM_input").write_text(base + "AUTO_MASKTABLE = True\n")
    m = build_model(ParamFile(str(case / "MOM_input")))
    auto = case / "MOM_auto_mask_table"
    assert auto.exists()
    lay, blocks = read_mask_table(str(auto))
    # the bowl topography has land corners only if min_depth cuts them;
    # whatever was found must validate strictly against the model mask
    wet = np.asarray(m.domain.interior(m.grid.mask2dT))
    apply_mask_table(wet, lay, blocks, strict=True)
    # and a hand-written table with a wet block must be rejected
    (case / "mask_table_bad").write_text("1\n2, 2\n2, 1\n")
    (case / "MOM_input").write_text(base + "MASKTABLE = mask_table_bad\n")
    with pytest.raises(ValueError, match="ocean points"):
        build_model(ParamFile(str(case / "MOM_input")))
