"""Batched edit queue (insert_many) parity + speed tests."""

import numpy as np

from voxelhex_tpu.tree import mipmap
from voxelhex_tpu.tree.boxtree import Albedo
from voxelhex_tpu.tree.build import from_voxels, insert_many


def _base(size=64, seed=1, mips=False):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, size, size=(300, 3))
    cols = rng.integers(1, 255, size=(300, 4))
    cols[:, 3] = 255
    tree = from_voxels(pts, cols.astype(np.uint8), size=size, brick_dim=4,
                       simplify=True)
    if mips:
        mipmap.enable_mips(tree)
    return tree


def _edits(size=64, seed=7, n=500):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, size, size=(n, 3))
    cols = rng.integers(1, 255, size=(n, 4))
    cols[:, 3] = 255
    return pts, cols.astype(np.uint8)


def _dense(tree):
    from voxelhex_tpu.render.bitgrid import _dense_from_flat
    from voxelhex_tpu.tree.flat import flatten

    return _dense_from_flat(flatten(tree))


def test_insert_many_matches_sequential_inserts():
    pts, cols = _edits()
    a = _base()
    b = _base()
    insert_many(a, pts, cols)
    for p, c in zip(pts, cols):
        b.insert(tuple(int(v) for v in p), Albedo(*(int(x) for x in c)))
    occ_a, col_a = _dense(a)
    occ_b, col_b = _dense(b)
    np.testing.assert_array_equal(occ_a, occ_b)
    # palette indices may differ in insertion order; compare resolved RGBA
    pal_a = np.array([[c.r, c.g, c.b, c.a] for c in a.color_palette] + [[0] * 4])
    pal_b = np.array([[c.r, c.g, c.b, c.a] for c in b.color_palette] + [[0] * 4])
    ia = np.where(occ_a, np.minimum(col_a, len(a.color_palette)), len(a.color_palette))
    ib = np.where(occ_b, np.minimum(col_b, len(b.color_palette)), len(b.color_palette))
    np.testing.assert_array_equal(pal_a[ia], pal_b[ib])


def test_insert_many_updates_mips_like_sequential():
    pts, cols = _edits(n=200, seed=8)
    a = _base(mips=True)
    b = _base(mips=True)
    insert_many(a, pts, cols)
    for p, c in zip(pts, cols):
        b.insert(tuple(int(v) for v in p), Albedo(*(int(x) for x in c)))
    # coarse samples resolve through node MIPs: RGBA must agree everywhere
    from voxelhex_tpu.tree.flat import flatten, sample_coarse

    fa, fb = flatten(a), flatten(b)
    n = a.size // 4
    q = (np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), axis=-1)
         .reshape(-1, 3) * 4 + 2)
    occ_a, col_a = sample_coarse(fa, q, 4)
    occ_b, col_b = sample_coarse(fb, q, 4)
    np.testing.assert_array_equal(occ_a, occ_b)
    ca = fa.palette[np.clip(col_a, 0, fa.palette.shape[0] - 1)]
    cb = fb.palette[np.clip(col_b, 0, fb.palette.shape[0] - 1)]
    # MIP colors may differ up to the configured color-similarity threshold:
    # palette reuse is order-dependent (reference: mipmap.rs:274-308), and
    # the batched path resamples each texel once from the final content
    np.testing.assert_allclose(np.where(occ_a[:, None], ca, 0),
                               np.where(occ_b[:, None], cb, 0), atol=0.11)


def test_insert_many_fires_triggers():
    a = _base()
    calls = []
    a.update_triggers.append(lambda stack, sectants: calls.append((len(stack), sectants)))
    pts, cols = _edits(n=50, seed=3)
    insert_many(a, pts, cols)
    assert calls  # one per touched bottom node
    assert all(len(s) >= 1 for _l, s in calls)


def test_insert_many_speedup():
    import gc
    import time

    pts, cols = _edits(size=64, seed=5, n=2000)
    # best-of-2 on FRESH trees per rep: after heavy suite neighbors
    # (multi-GB far-field tests) the first vectorized pass runs against a
    # cold/fragmented allocator and measured ~2x slower than in isolation
    # (full-suite flake, 2026-08-22); the second rep reflects steady state
    gc.collect()
    batched = float("inf")
    for _ in range(2):
        a = _base()
        t0 = time.time()
        insert_many(a, pts, cols)
        batched = min(batched, time.time() - t0)
    sequential = float("inf")
    for _ in range(2):
        b = _base()
        t0 = time.time()
        for p, c in zip(pts, cols):
            b.insert(tuple(int(v) for v in p), Albedo(*(int(x) for x in c)))
        sequential = min(sequential, time.time() - t0)
    # sequential single-voxel inserts got ~4.5x faster (scalar-math edit
    # path), so the batched advantage narrowed to ~2-2.5x; assert a
    # conservative 1.5x plus an absolute per-op ceiling
    assert batched < sequential / 1.5
    assert batched / len(pts) < 200e-6
