"""Coarse LOD sampling + streaming placeholder (probe_MIP parity) tests.

The reference shows MIP-brick colors for regions whose bricks the streamer
has not uploaded yet (reference: viewport_render.wgsl:328-364, :437-454).
Our analog: `sample_coarse` over the flat snapshot + coarse placeholder
fills in the paged window.
"""

import numpy as np

from voxelhex_tpu.render.camera import Camera
from voxelhex_tpu.render.streaming import StreamingView
from voxelhex_tpu.tree import mipmap
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.build import from_voxels
from voxelhex_tpu.tree.flat import EMPTY_DESC, NO_COLOR_HIT, flatten, sample_coarse


import functools


@functools.lru_cache(maxsize=None)
def _scene(with_mips: bool, seed=0, size=64):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, size, size=(400, 3))
    cols = rng.integers(1, 255, size=(400, 4))
    cols[:, 3] = 255
    tree = from_voxels(pts, cols.astype(np.uint8), size=size, brick_dim=4,
                       simplify=True)
    if with_mips:
        mipmap.enable_mips(tree)
    return tree, pts


def _check_against_brute_force(tree, pts, g=4):
    flat = flatten(tree)
    n = tree.size // g
    occ_ref = np.zeros((n, n, n), dtype=bool)
    for p in pts:
        occ_ref[tuple(p // g)] = True
    q = (
        np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), axis=-1)
        .reshape(-1, 3) * g + g // 2
    )
    occ, col = sample_coarse(flat, q, g)
    np.testing.assert_array_equal(occ, occ_ref.reshape(-1))
    # every occupied cell must carry a usable color value
    assert not (occ & (col == EMPTY_DESC)).any()
    valid = (col >= 0) & ((col < flat.palette.shape[0]) | (col == NO_COLOR_HIT))
    assert (valid | ~occ).all()


def test_sample_coarse_matches_brute_force_with_mips():
    tree, pts = _scene(with_mips=True)
    _check_against_brute_force(tree, pts)


def test_sample_coarse_matches_brute_force_without_mips():
    tree, pts = _scene(with_mips=False)
    _check_against_brute_force(tree, pts)


def test_sample_coarse_solid_uniform_region():
    # a bulk cubic fill becomes uniform/solid nodes; coarse cells inside it
    # must be occupied with the fill color
    tree = BoxTree(64, 4, auto_simplify=True)
    tree.insert_at_lod((0, 0, 0), 32, Albedo.from_u32(0x10E070FF))
    flat = flatten(tree)
    q = np.array([[2, 2, 2], [17, 9, 25], [30, 30, 30], [40, 40, 40]])
    occ, col = sample_coarse(flat, q, 4)
    assert occ[:3].all() and not occ[3]
    pal = flat.palette[np.clip(col[:3], 0, flat.palette.shape[0] - 1)]
    np.testing.assert_allclose(pal[:, 1], 0xE0 / 255.0, atol=0.01)


def test_streaming_placeholder_shows_coarse_content():
    """Not-yet-paged regions render coarse MIP-colored blocks instead of
    holes, and real content replaces them as it pages in."""
    tree, pts = _scene(with_mips=True, size=256)
    # budget of 1: after the first update almost everything is placeholder
    view = StreamingView(tree, view_size=64, regions_per_update=8)
    view.update(np.array([32.0, 32.0, 32.0]))
    assert len(view._placeholder) > 0
    # pick a content voxel inside a placeholder (non-resident) region
    found = None
    for p in pts:
        if (p < 64).all():
            r = tuple(int(c) // 16 for c in p)
            if r in view._placeholder:
                found = p
                break
    assert found is not None
    assert view._occ[tuple(found)]  # coarse block covers the voxel
    assert view._col[tuple(found)] != 0xFFFF
    # empty space well away from content must stay empty in placeholders
    # (no false coarse fill): check the majority of the window is empty
    assert view._occ.mean() < 0.5

    # page everything in: placeholders fully replaced by exact content
    for _ in range(200):
        if view.update(np.array([32.0, 32.0, 32.0])) == 0:
            break
    assert len(view._placeholder) == 0
    exact = StreamingView(tree, view_size=64, regions_per_update=100000,
                          placeholder_lod=False)
    exact.update(np.array([32.0, 32.0, 32.0]))
    np.testing.assert_array_equal(view._occ, exact._occ)
    np.testing.assert_array_equal(view._col, exact._col)


def test_streaming_placeholder_device_render_parity():
    """Once fully resident, a view that went through placeholders renders
    identically to one built without them."""
    tree, _pts = _scene(with_mips=True, size=256)
    cam = Camera(
        origin=np.array([32.0, 32.0, -30.0]),
        target=np.array([32.0, 32.0, 32.0]),
        resolution=(32, 32),
        fov_y_deg=40.0,
    )
    view = StreamingView(tree, view_size=64, regions_per_update=16)
    for _ in range(200):
        if view.update(np.array([32.0, 32.0, 32.0])) == 0:
            break
    img = np.asarray(view.render(cam))
    exact = StreamingView(tree, view_size=64, regions_per_update=100000,
                          placeholder_lod=False)
    img2 = np.asarray(exact.render(cam))
    np.testing.assert_array_equal(img, img2)


def test_sample_coarse_small_content_under_internal_node_without_mips():
    """Content smaller than the coarse texel under a MIP-less INTERNAL node
    must sample a real descendant color, not NO_COLOR_HIT (regression:
    far-field rings at factor >= 16 rendered such content as hit-but-black
    silhouettes on 1024^3+ worlds)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    tree.insert_at_lod((224, 16, 224), 16, Albedo(40, 200, 40, 255))
    flat = flatten(tree)
    q = np.array([[232, 24, 232]])  # center of the F16 cell holding it
    occ, col = sample_coarse(flat, q, 16)
    assert occ[0]
    assert col[0] != NO_COLOR_HIT and col[0] >= 0
    pal = flat.palette[col[0]]
    assert pal[1] > pal[0] and pal[1] > pal[2]  # the block's green
