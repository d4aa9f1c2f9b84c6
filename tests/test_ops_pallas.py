"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.ops.shade_pallas import pallas_shade, shade_reference


def _data(R=3000, P=200, seed=0):
    rng = np.random.default_rng(seed)
    hit = jnp.asarray(rng.random(R) < 0.6)
    voxel = jnp.asarray(
        np.where(rng.random(R) < 0.1, 0x3FFFFFFE, rng.integers(0, P, R)),
        dtype=jnp.int32,
    )
    normal = rng.normal(size=(R, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    palette = jnp.asarray(rng.random((P, 4)).astype(np.float32))
    bg = jnp.asarray([0.1, 0.2, 0.3], dtype=jnp.float32)
    return hit, voxel, jnp.asarray(normal), palette, bg


def test_pallas_shade_matches_reference():
    hit, voxel, normal, palette, bg = _data()
    a = shade_reference(hit, voxel, normal, palette, bg)
    b = pallas_shade(hit, voxel, normal, palette, bg, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_shade_unpadded_sizes():
    for R in (1, 1000, 1024, 1025, 4096):
        hit, voxel, normal, palette, bg = _data(R=R, P=16, seed=R)
        a = shade_reference(hit, voxel, normal, palette, bg)
        b = pallas_shade(hit, voxel, normal, palette, bg, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_traverse_tile_prototype_matches_tracer():
    """The Pallas tile-traversal prototype (interpreter mode) agrees with the
    XLA BitGrid tracer on hits and hit voxels."""
    from voxelhex_tpu.ops.traverse_pallas import traverse_tiles
    from voxelhex_tpu.render.bitgrid import BitGridRenderer, build_bitgrid
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(8)
    for _ in range(800):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, Albedo.from_u32(0xFF0000FF))
    bg = build_bitgrid(tree)
    r = BitGridRenderer(bg)

    n = 2048
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # skip boundary-grazing rays like every other parity test
    keep = (np.abs(targets - np.round(targets)) >= 0.05).all(axis=1)
    targets, dirs = targets[keep], dirs[keep]
    origins = (targets - dirs * 200).astype(np.float32)
    dirs = dirs.astype(np.float32)

    ref_hit, _v, ref_hvox, _p, _n2 = r.trace(origins, dirs)
    occ_pairs = np.stack([bg.occ_lo, bg.occ_hi], axis=1).astype(np.uint32)
    hit, hvox = traverse_tiles(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(occ_pairs),
        n_levels=bg.n_levels, bases=tuple(int(b) for b in bg.level_bases),
        dims=(16, 4, 1), size=64.0,
    )
    ref_hit = np.asarray(ref_hit)
    hit = np.asarray(hit)
    agree = (ref_hit == hit)
    # the prototype omits restart fallbacks; allow a tiny disagreement rate
    assert agree.mean() > 0.995, agree.mean()
    both = ref_hit & hit
    np.testing.assert_array_equal(np.asarray(ref_hvox)[both], np.asarray(hvox)[both])
