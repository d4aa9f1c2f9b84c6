"""Streaming view (out-of-core paging) tests."""

import numpy as np
import jax.numpy as jnp

from voxelhex_tpu.render.camera import Camera
from voxelhex_tpu.render.streaming import StreamingView
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


def make_tree():
    # a 256-world with content in two distant corners
    tree = BoxTree(256, 4, auto_simplify=False)
    for p in [(10, 10, 10), (12, 10, 10), (10, 12, 10)]:
        tree.insert(p, RED)
    for p in [(200, 200, 200), (202, 200, 200)]:
        tree.insert(p, GREEN)
    return tree


def test_view_pages_in_content():
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(32, 32),
        fov_y_deg=30.0,
    )
    img = view.render(cam)
    assert img[:, :, 0].max() > 0.2  # red voxels visible
    assert np.array_equal(view.origin, [0, 0, 0])


def test_view_follows_camera_and_evicts():
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam1 = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(24, 24),
        fov_y_deg=30.0,
    )
    view.render(cam1)
    up1 = view.uploads
    # move to the far corner: window re-anchors and pages new content
    cam2 = Camera(
        origin=np.array([201.0, 201.0, 170.0]),
        target=np.array([201.0, 200.0, 200.0]),
        resolution=(24, 24),
        fov_y_deg=30.0,
    )
    img2 = view.render(cam2)
    assert view.uploads > up1
    assert view.origin.max() > 100  # window moved
    assert img2[:, :, 1].max() > 0.2  # green voxels visible


def test_edit_invalidates_region():
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(24, 24),
        fov_y_deg=30.0,
    )
    view.render(cam)
    # edit inside the view: new voxel appears after the next update
    tree.insert((11, 11, 11), GREEN)
    assert len(view._dirty) > 0
    img = view.render(cam)
    assert img[:, :, 1].max() > 0.1


def test_partial_budget_leaves_dirty():
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=3)
    remaining = view.update(np.array([11.0, 11.0, 11.0]))
    assert remaining > 0
    # keep updating until everything is resident
    for _ in range(200):
        if view.update(np.array([11.0, 11.0, 11.0])) == 0:
            break
    assert len(view._dirty) == 0


def test_delta_upload_matches_full_rebuild():
    """Small edits go through the partial device-update path and must render
    identically to a full rebuild."""
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(32, 32),
        fov_y_deg=30.0,
    )
    view.render(cam)  # full build
    # a small edit -> few dirty regions -> delta path
    tree.insert((11, 11, 11), GREEN)
    assert 0 < len(view._dirty) <= 8
    img_delta = view.render(cam)
    # force a full rebuild and compare
    view._mark_window_dirty()
    img_full = view.render(cam)
    np.testing.assert_allclose(img_delta, img_full, atol=1e-6)


def test_window_shift_keeps_device_in_sync():
    """Budgeted window moves translate resident content ON DEVICE (roll +
    exposed-slab clear); no stale cells may survive a shift (regression:
    the partial-upload path used to skip shifted resident regions)."""
    tree = make_tree()
    for p in [(40, 40, 40), (42, 40, 40), (40, 42, 40)]:
        tree.insert(p, RED)
    # budget small enough that the partial path (not a full rebuild) runs
    view = StreamingView(tree, view_size=128, regions_per_update=8)
    for _ in range(600):
        if view.update(np.array([41.0, 41.0, 40.0])) == 0:
            break
    for tgt in ([120.0, 41.0, 40.0], [20.0, 41.0, 40.0], [41.0, 90.0, 100.0]):
        for _ in range(200):
            if view.update(np.array(tgt)) == 0:
                break
        bg = view.renderer.bitgrid
        dev_cols = np.asarray(view.renderer.tree["colors"])
        host_cols = view._col.transpose(2, 1, 0).ravel()
        assert (dev_cols != host_cols).sum() == 0
        dev_pairs = np.asarray(view.renderer.tree["occ_pairs"])
        host_pairs = np.stack([bg.occ_lo, bg.occ_hi], 1).astype(np.uint32)
        assert (dev_pairs != host_pairs).sum() == 0


def test_delta_upload_carries_new_palette_colors():
    """Edits that intern NEW colors must reach the device palette through
    the partial-update path (regression: new colors rendered black)."""
    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=100000)
    cam = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(24, 24),
        fov_y_deg=30.0,
    )
    view.render(cam)
    blue = Albedo.from_u32(0x0000FFFF)  # NOT in the palette yet
    for p in [(11, 11, 9), (12, 11, 9), (11, 12, 9)]:
        tree.insert(p, blue)
    assert 0 < len(view._dirty) <= 8  # partial path
    img = np.asarray(view.render(cam))
    assert img[:, :, 2].max() > 0.2


def test_insert_many_streams_through_view():
    """Batched edits invalidate and re-render through the paged window."""
    from voxelhex_tpu.tree.build import insert_many

    tree = make_tree()
    view = StreamingView(tree, view_size=64, regions_per_update=100000)
    cam = Camera(
        origin=np.array([11.0, 11.0, -30.0]),
        target=np.array([11.0, 11.0, 11.0]),
        resolution=(24, 24),
        fov_y_deg=30.0,
    )
    view.render(cam)
    xs, ys = np.meshgrid(np.arange(8, 16), np.arange(8, 16))
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 9)], axis=1)
    cols = np.zeros((len(pts), 4), dtype=np.uint8)
    cols[:, 2] = 255
    cols[:, 3] = 255
    insert_many(tree, pts, cols)
    assert len(view._dirty) > 0
    img = np.asarray(view.render(cam))
    assert img[:, :, 2].max() > 0.2


def test_async_uploads_converge_to_sync_result():
    """Async worker-thread rasterization reaches the same resident content
    as the sync path, with edits and a window move in between."""
    import time

    tree = make_tree()
    a = StreamingView(tree, view_size=64, regions_per_update=16,
                      async_uploads=True)
    target = np.array([11.0, 11.0, 11.0])
    for _ in range(400):
        if a.update(target) == 0 and not a._inflight:
            break
        time.sleep(0.002)
    assert len(a._dirty) == 0

    # edit mid-flight: a fresh batch of dirty regions + stale-job dropping
    tree.insert((11, 11, 11), GREEN)
    assert len(a._dirty) > 0
    for _ in range(400):
        if a.update(target) == 0 and not a._inflight:
            break
        time.sleep(0.002)

    b = StreamingView(tree, view_size=64, regions_per_update=100000)
    b.update(target)
    np.testing.assert_array_equal(a._occ, b._occ)
    np.testing.assert_array_equal(a._col, b._col)
    a.close()


def test_async_uploads_survive_window_move():
    import time

    tree = make_tree()
    a = StreamingView(tree, view_size=64, regions_per_update=8,
                      async_uploads=True)
    a.update(np.array([11.0, 11.0, 11.0]))  # jobs in flight for window @0
    # jump: in-flight jobs for the old origin must be dropped
    tgt = np.array([201.0, 201.0, 201.0])
    for _ in range(600):
        if a.update(tgt) == 0 and not a._inflight:
            break
        time.sleep(0.002)
    assert len(a._dirty) == 0
    b = StreamingView(tree, view_size=64, regions_per_update=100000)
    b.update(tgt)
    np.testing.assert_array_equal(a._occ, b._occ)
    np.testing.assert_array_equal(a._col, b._col)
    a.close()


def test_jnp_pack_bits_matches_numpy():
    """The on-device pyramid packer must produce exactly the host packer's
    words at every size, including pad-to-one-block shapes."""
    from voxelhex_tpu.render.bitgrid import _pack_bits
    from voxelhex_tpu.render.streaming import _jnp_pack_bits

    rng = np.random.default_rng(11)
    for c in (4, 8, 16, 2, 3):
        grid = rng.random((c, c, c)) < 0.4
        lo_np, hi_np, coarse_np = _pack_bits(grid)
        lo_j, hi_j, coarse_j = _jnp_pack_bits(jnp.asarray(grid))
        np.testing.assert_array_equal(np.asarray(lo_j), lo_np)
        np.testing.assert_array_equal(np.asarray(hi_j), hi_np)
        np.testing.assert_array_equal(np.asarray(coarse_j), coarse_np)


def test_device_coarse_rebuild_matches_host():
    """Rebuilding pyramid levels >= 1 on device equals the host pyramid."""
    from voxelhex_tpu.render.bitgrid import _pack_bits
    from voxelhex_tpu.render.streaming import _make_coarse_rebuild

    rng = np.random.default_rng(7)
    S = 64
    occ = rng.random((S, S, S)) < 0.1
    levels_lo, levels_hi = [], []
    grid = occ
    while grid.shape[0] > 1:
        lo, hi, coarse = _pack_bits(grid)
        levels_lo.append(lo)
        levels_hi.append(hi)
        grid = coarse
    pairs = np.stack(
        [np.concatenate(levels_lo), np.concatenate(levels_hi)], axis=1
    ).astype(np.uint32)
    # zero the coarse levels and let the device derive them from level 0
    broken = pairs.copy()
    broken[len(levels_lo[0]):] = 0
    fixed = np.asarray(_make_coarse_rebuild(S)(jnp.asarray(broken)))
    np.testing.assert_array_equal(fixed, pairs)


def test_delta_upload_u16_fallback_large_palette():
    """Palettes over 254 colors exceed the u8 wire's range: the delta path
    must fall back to the u16 wire and stay identical to a full rebuild."""
    tree = BoxTree(256, 4, auto_simplify=False)
    # intern >254 distinct colors up front
    i = 0
    for r in range(16):
        for g in range(17):
            tree.insert((r, g, 1), Albedo(50 + r * 10 % 200, 30 + g * 9 % 200,
                                          (r * 17 + g) % 255, 255))
            i += 1
    assert len(tree.color_palette) > 254
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = Camera(
        origin=np.array([8.0, 8.0, -30.0]),
        target=np.array([8.0, 8.0, 1.0]),
        resolution=(32, 32),
        fov_y_deg=30.0,
    )
    view.render(cam)  # full build
    tree.insert((8, 8, 1), Albedo(1, 2, 3, 255))  # delta path edit
    assert 0 < len(view._dirty) <= 8
    img_delta = view.render(cam)
    view._mark_window_dirty()
    img_full = view.render(cam)
    np.testing.assert_allclose(img_delta, img_full, atol=1e-6)


def test_streaming_beam_prepass_bit_exact():
    """StreamingView(beam_prepass=True): window frames stay bit-identical
    to the plain view across window moves AND edits — the beam's dilated
    occupancy grid must re-derive from the window's level-0 words after
    every content change (invalidate_beam), never go stale."""
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.render.camera import Camera

    def make():
        t = BoxTree(512, 8, auto_simplify=True)  # 512 = 8 * 4^3
        t.insert_at_lod((16, 16, 16), 16, Albedo(200, 40, 40, 255))
        t.insert_at_lod((300, 16, 300), 16, Albedo(40, 200, 40, 255))
        return t

    def cam_at(c):
        return Camera(
            origin=np.array([c - 20.0, 40.0, c - 20.0], dtype=np.float32),
            target=np.array([c, 20.0, c], dtype=np.float32),
            up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
            fov_y_deg=50.0,
            resolution=(64, 48),
        )

    v1 = StreamingView(make(), view_size=64, regions_per_update=4096,
                       far_field=False)
    v2 = StreamingView(make(), view_size=64, regions_per_update=4096,
                       far_field=False, beam_prepass=True)
    for c in (24.0, 24.0, 300.0, 300.0):  # repeats + a window teleport
        np.testing.assert_array_equal(
            np.asarray(v1.render(cam_at(c), out_u8=True)),
            np.asarray(v2.render(cam_at(c), out_u8=True)),
        )
    # an edit right in view: the beam grid must pick it up
    for v in (v1, v2):
        v.tree.insert_at_lod((296, 32, 296), 8, Albedo(40, 40, 250, 255))
    f1 = np.asarray(v1.render(cam_at(300.0), out_u8=True))
    f2 = np.asarray(v2.render(cam_at(300.0), out_u8=True))
    np.testing.assert_array_equal(f1, f2)
    # ...and the edit actually rendered (blue pixels appear)
    assert (f1[..., 2] > f1[..., 0]).sum() > 0


def test_streaming_fuse_plan_bit_exact():
    """StreamingView(fuse_plan=True): frames (window + far field) stay
    bit-identical to the adaptive view across repeats and edits — the
    second frame replays the recorded schedule as one fused dispatch."""
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.render.camera import Camera

    def make():
        t = BoxTree(256, 4, auto_simplify=True)
        t.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))
        t.insert_at_lod((224, 16, 224), 16, Albedo(40, 200, 40, 255))
        return t

    cam = Camera(
        origin=np.array([28.0, 30.0, 28.0], dtype=np.float32),
        target=np.array([34.0, 26.0, 34.0], dtype=np.float32),
        up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
        fov_y_deg=50.0,
        resolution=(64, 48),
    )
    v1 = StreamingView(make(), view_size=64, regions_per_update=4096)
    v2 = StreamingView(make(), view_size=64, regions_per_update=4096,
                       fuse_plan=True)
    for _ in range(3):  # frame 2+ replay fused schedules
        np.testing.assert_array_equal(
            np.asarray(v1.render(cam, out_u8=True)),
            np.asarray(v2.render(cam, out_u8=True)),
        )
    for v in (v1, v2):
        v.tree.insert_at_lod((40, 24, 40), 8, Albedo(250, 250, 30, 255))
    np.testing.assert_array_equal(
        np.asarray(v1.render(cam, out_u8=True)),
        np.asarray(v2.render(cam, out_u8=True)),
    )


def test_streaming_skip_tracer_bit_exact():
    """StreamingView(tracer='skip') frames are bit-identical to the stack
    tracer, including after edits (the delta path refreshes skip_rows on
    device)."""
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.render.camera import Camera

    def make():
        t = BoxTree(256, 4, auto_simplify=True)
        t.insert_at_lod((16, 16, 16), 8, Albedo(200, 40, 40, 255))
        t.insert_at_lod((224, 16, 224), 16, Albedo(40, 200, 40, 255))
        return t

    cam = Camera(
        origin=np.array([28.0, 30.0, 28.0], dtype=np.float32),
        target=np.array([34.0, 26.0, 34.0], dtype=np.float32),
        up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
        fov_y_deg=50.0,
        resolution=(64, 48),
    )
    v1 = StreamingView(make(), view_size=64, regions_per_update=4096)
    v2 = StreamingView(make(), view_size=64, regions_per_update=4096,
                       tracer="skip")
    np.testing.assert_array_equal(
        np.asarray(v1.render(cam, out_u8=True)),
        np.asarray(v2.render(cam, out_u8=True)),
    )
    for v in (v1, v2):
        v.tree.insert_at_lod((40, 24, 40), 8, Albedo(250, 250, 30, 255))
    np.testing.assert_array_equal(
        np.asarray(v1.render(cam, out_u8=True)),
        np.asarray(v2.render(cam, out_u8=True)),
    )
