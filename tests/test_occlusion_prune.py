"""Occlusion-bit consumption in the streaming layer (VERDICT r1 missing #4).

The tree maintains per-node occlusion bits (all six same-size neighbors
fully occupied); the reference uses them to stop the upload walk at
enclosed nodes (upload_queue.rs:528-530).  The StreamingView analog parks
regions inside an occluded node at coarse-LOD placeholder content: fewer
real region uploads, bit-identical frames (enclosed content can never be a
first hit).
"""

import numpy as np
import pytest

from voxelhex_tpu.render.streaming import REGION, StreamingView
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree


def _solid_cube_tree():
    """A 64^3 solid cube assembled from 16^3 cells so the size-16 node layer
    exists (a single 64-LOD fill would collapse to one uniform leaf with no
    interior structure): the 2^3 interior 16-nodes end up occluded.

    Two passes (seed every cell, then fill) because occlusion bits — like
    the reference's (insert.rs:452-469) — are only PUSHED onto siblings
    that already exist when a node becomes full; that is the natural order
    of a voxel-wise model load, where nodes exist long before they fill."""
    tree = BoxTree(256, 4, auto_simplify=True)
    c = Albedo(180, 140, 90, 255)
    cells = [(x, y, z) for x in range(0, 64, 16)
             for y in range(0, 64, 16) for z in range(0, 64, 16)]
    for p in cells:
        tree.insert_at_lod(p, 4, c)  # allocate the size-16 node
    for p in cells:
        tree.insert_at_lod(p, 16, c)  # fill it (pushes sibling occlusion)
    return tree


def _drain(view, center):
    while view.update(center) > 0:
        pass


def test_occluded_regions_park_at_lod():
    tree = _solid_cube_tree()
    v_on = StreamingView(tree, view_size=64, regions_per_update=16,
                         occlusion_prune=True)
    v_off = StreamingView(tree, view_size=64, regions_per_update=16,
                          occlusion_prune=False)
    center = np.array([32.0, 32.0, 32.0])
    _drain(v_on, center)
    _drain(v_off, center)
    assert np.array_equal(v_on.origin, v_off.origin)
    # the 2^3 interior 16-regions of the 4^3-region cube park at LOD
    assert len(v_on._occluded) == 8
    assert v_on.uploads == v_off.uploads - 8
    # the parked regions' mirrors hold the placeholder fill — for a solid
    # uniform region that's the identical solid content
    np.testing.assert_array_equal(v_on._occ, v_off._occ)
    np.testing.assert_array_equal(v_on._col, v_off._col)


def test_occlusion_prune_frames_bit_identical():
    from voxelhex_tpu.render.camera import Camera

    tree = _solid_cube_tree()
    cam = Camera(
        origin=np.array([150.0, 120.0, 150.0], dtype=np.float32),
        target=np.array([32.0, 32.0, 32.0], dtype=np.float32),
        up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
        fov_y_deg=50.0,
        resolution=(64, 48),
    )
    v_on = StreamingView(tree, view_size=64, regions_per_update=4096,
                         occlusion_prune=True)
    v_off = StreamingView(tree, view_size=64, regions_per_update=4096,
                          occlusion_prune=False)
    f_on = np.asarray(v_on.render(cam, out_u8=True))
    f_off = np.asarray(v_off.render(cam, out_u8=True))
    assert v_on.uploads < v_off.uploads
    np.testing.assert_array_equal(f_on, f_off)


def test_edit_unparks_occluded_regions():
    """Clearing a wall un-occludes the interior: parked regions must go back
    to dirty and re-page their REAL content."""
    tree = _solid_cube_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=4096,
                         occlusion_prune=True)
    center = np.array([32.0, 32.0, 32.0])
    _drain(view, center)
    assert len(view._occluded) == 8
    # carve a tunnel through the +x wall into the interior
    tree.clear_at_lod((48, 16, 16), 16)
    _drain(view, center)
    # interior no longer fully enclosed along that column
    assert len(view._occluded) < 8
    # the view's mirrors now match fresh per-voxel queries everywhere
    rng = np.random.default_rng(3)
    for _ in range(200):
        p = rng.integers(0, 64, 3)
        r = tuple(int(c) // REGION for c in p)
        if r in view._occluded:
            continue  # parked regions intentionally hold LOD content
        expected = tree.get(tuple(int(c) for c in p)).is_some
        assert bool(view._occ[p[0], p[1], p[2]]) == expected, p
