"""Differential tests: native/rasterize.cpp vs the NumPy fallbacks.

Mirrors test_native_edit.py's pattern for the rasterizer half of the native
surface (VERDICT r1 weak #5): every entry point that has a NumPy fallback
must agree with it bit-for-bit over randomized scenes —

* ``rasterize_flat`` + ``pack_pyramid``  vs  ``_dense_from_flat`` + ``_pack_pyramid``
  (compared through ``build_bitgrid``, which selects between them),
* ``rasterize_window``                   vs  dense-grid slicing,
* ``bulk_group``                         vs  the NumPy grouping path in
  ``tree.build.from_voxels`` (compared through ``flatten``),
* ``copy_region``                        vs  NumPy clipped slicing.
"""

import numpy as np
import pytest

from voxelhex_tpu import native
from voxelhex_tpu.render.bitgrid import build_bitgrid, _dense_from_flat
from voxelhex_tpu.tree.build import from_voxels
from voxelhex_tpu.tree.flat import flatten

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native rasterize library unavailable"
)


def _random_scene(rng, size=64, brick_dim=4, n=600, with_lod=True):
    """A tree with point voxels, a filled LOD box (solid bricks / uniform
    leaves) and some clears — exercises every brick-descriptor kind."""
    pts = rng.integers(0, size, (n, 3))
    cols = rng.integers(0, 256, (n, 4))
    cols[:, 3] = 255
    tree = from_voxels(pts, cols.astype(np.uint8), size=size,
                       brick_dim=brick_dim, simplify=True)
    if with_lod:
        from voxelhex_tpu.tree.boxtree import Albedo

        tree.insert_at_lod((8, 8, 8), 16, Albedo(10, 200, 30, 255))
        tree.insert_at_lod((size - 24, 0, size - 24), 8,
                           Albedo(250, 100, 0, 255))
        for _ in range(20):
            tree.clear(tuple(int(v) for v in rng.integers(0, size, 3)))
    return tree


def _no_native_bitgrid(monkeypatch, flat):
    monkeypatch.setattr(native, "rasterize_flat", lambda f: None)
    monkeypatch.setattr(native, "pack_pyramid", lambda occ, S: None)
    return build_bitgrid(flat)


@pytest.mark.parametrize("size,brick_dim", [(64, 4), (32, 8)])
def test_rasterize_flat_and_pack_match_numpy(monkeypatch, size, brick_dim):
    rng = np.random.default_rng(11 + brick_dim)
    flat = flatten(_random_scene(rng, size=size, brick_dim=brick_dim))
    nat = build_bitgrid(flat)
    ref = _no_native_bitgrid(monkeypatch, flat)
    assert nat.size == ref.size and nat.n_levels == ref.n_levels
    assert np.array_equal(nat.level_bases, ref.level_bases)
    assert np.array_equal(nat.occ_lo, ref.occ_lo)
    assert np.array_equal(nat.occ_hi, ref.occ_hi)
    assert np.array_equal(nat.colors, ref.colors)


def test_rasterize_window_matches_dense_slices():
    rng = np.random.default_rng(23)
    flat = flatten(_random_scene(rng, size=64))
    occ_ref, col_ref = _dense_from_flat(flat)  # [x, y, z]
    S = flat.size
    corners = [(0, 0, 0), (16, 8, 24), (48, 48, 48), (60, 60, 60)]
    corners += [tuple(int(v) for v in rng.integers(0, S, 3)) for _ in range(6)]
    W = 16
    for (x0, y0, z0) in corners:
        out = native.rasterize_window(flat, x0, y0, z0, W)
        assert out is not None
        occ_n = out[0].reshape(W, W, W).transpose(2, 1, 0) != 0  # -> [x,y,z]
        col_n = out[1].reshape(W, W, W).transpose(2, 1, 0)
        # reference: clipped slice of the dense grids, padded empty
        occ_e = np.zeros((W, W, W), dtype=bool)
        col_e = np.full((W, W, W), 0xFFFF, dtype=np.uint16)
        xs, ys, zs = (min(W, S - x0), min(W, S - y0), min(W, S - z0))
        if xs > 0 and ys > 0 and zs > 0:
            occ_e[:xs, :ys, :zs] = occ_ref[x0:x0 + xs, y0:y0 + ys, z0:z0 + zs]
            col_e[:xs, :ys, :zs] = col_ref[x0:x0 + xs, y0:y0 + ys, z0:z0 + zs]
        assert np.array_equal(occ_n, occ_e), (x0, y0, z0)
        assert np.array_equal(col_n, col_e), (x0, y0, z0)


@pytest.mark.parametrize("simplify", [True, False])
def test_bulk_group_matches_numpy_grouping(monkeypatch, simplify):
    """from_voxels must build the identical tree with and without the native
    grouping pass (duplicates: last wins; solid-brick collapse)."""
    rng = np.random.default_rng(37)
    n = 2000
    pts = rng.integers(0, 64, (n, 3))
    # force duplicates with conflicting colors (last-wins semantics)
    pts[n // 2:] = pts[: n - n // 2]
    cols = rng.integers(0, 256, (n, 4))
    cols[:, 3] = 255
    # a fully-filled brick so the solid path triggers
    bx, by, bz = np.meshgrid(*[np.arange(4)] * 3, indexing="ij")
    full = np.stack([bx, by, bz], axis=-1).reshape(-1, 3) + 16
    fcols = np.tile([200, 50, 50, 255], (len(full), 1))
    pts = np.concatenate([pts, full])
    cols = np.concatenate([cols, fcols])

    t_nat = from_voxels(pts, cols.astype(np.uint8), size=64, brick_dim=4,
                        simplify=simplify)
    monkeypatch.setattr(native, "bulk_group", lambda *a, **k: None)
    t_ref = from_voxels(pts, cols.astype(np.uint8), size=64, brick_dim=4,
                        simplify=simplify)
    fa, fb = flatten(t_nat), flatten(t_ref)
    assert np.array_equal(fa.node_meta, fb.node_meta)
    assert np.array_equal(fa.node_children, fb.node_children)
    assert np.array_equal(fa.bricks, fb.bricks)
    assert np.array_equal(fa.palette, fb.palette)


def test_copy_region_matches_numpy():
    lib = native.load()
    rng = np.random.default_rng(41)
    S, W = 16, 8
    occ = (rng.random((S, S, S)) < 0.3).astype(np.uint8)  # [z, y, x]
    col = rng.integers(0, 0xFFFF, (S, S, S)).astype(np.uint16)
    src_occ = np.ascontiguousarray(occ.ravel())
    src_col = np.ascontiguousarray(col.ravel())
    for (x0, y0, z0) in [(0, 0, 0), (4, 2, 6), (12, 12, 12), (-3, 5, 14)]:
        dst_occ = np.empty(W * W * W, dtype=np.uint8)
        dst_col = np.empty(W * W * W, dtype=np.uint16)
        lib.copy_region(src_occ, src_col, np.int32(S), np.int32(x0),
                        np.int32(y0), np.int32(z0), np.int32(W),
                        dst_occ, dst_col)
        exp_occ = np.zeros((W, W, W), dtype=np.uint8)  # [z, y, x]
        exp_col = np.full((W, W, W), 0xFFFF, dtype=np.uint16)
        for dz in range(W):
            for dy in range(W):
                for dx in range(W):
                    sx, sy, sz = x0 + dx, y0 + dy, z0 + dz
                    if 0 <= sx < S and 0 <= sy < S and 0 <= sz < S:
                        exp_occ[dz, dy, dx] = occ[sz, sy, sx]
                        exp_col[dz, dy, dx] = col[sz, sy, sx]
        assert np.array_equal(dst_occ.reshape(W, W, W), exp_occ), (x0, y0, z0)
        assert np.array_equal(dst_col.reshape(W, W, W), exp_col), (x0, y0, z0)


def test_rasterize_regions_matches_window_and_pack():
    """The batched region rasterize+pack (one native call per chunk — the
    streaming paging hot path) must be bit-identical to per-region
    rasterize_window + _pack_bits, including out-of-bounds corners."""
    from voxelhex_tpu import native
    from voxelhex_tpu.render.bitgrid import _pack_bits

    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.tree.flat import flatten

    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    t = BoxTree(64, 4, auto_simplify=False)
    for _ in range(400):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        t.insert(p, Albedo(int(rng.integers(1, 255)), 90, 40, 255))
    t.insert_at_lod((16, 16, 16), 16, Albedo(10, 200, 30, 255))
    flat = flatten(t)
    R = 16
    corners = np.array(
        [[0, 0, 0], [16, 32, 48], [48, 48, 48], [60, 0, 0], [64, 0, 0]],
        dtype=np.int32,
    )
    occ, col, lo, hi = native.rasterize_regions(flat, corners, R)
    for i, c in enumerate(corners):
        if (c < 64).all():
            ref_occ, ref_col = native.rasterize_window(
                flat, int(c[0]), int(c[1]), int(c[2]), R
            )
        else:
            ref_occ = np.zeros(R**3, np.uint8)
            ref_col = np.full(R**3, 0xFFFF, np.uint16)
        np.testing.assert_array_equal(occ[i], ref_occ)
        np.testing.assert_array_equal(col[i], ref_col)
        g = occ[i].reshape(R, R, R).transpose(2, 1, 0) != 0  # [x, y, z]
        plo, phi, _ = _pack_bits(g)
        np.testing.assert_array_equal(lo[i], plo)
        np.testing.assert_array_equal(hi[i], phi)
