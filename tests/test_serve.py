"""Render/edit server tests: frames over HTTP, live edits, stats."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from voxelhex_tpu.serve import RenderService, make_server
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree


def _scene(size=64, brick=4):
    tree = BoxTree(size, brick, auto_simplify=False)
    rng = np.random.default_rng(4)
    for _ in range(200):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        tree.insert(p, Albedo(*(int(v) for v in rng.integers(64, 255, 3)), 255))
    return tree


@pytest.fixture(scope="module")
def server():
    service = RenderService(_scene())
    srv = make_server(service, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield service, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_frame_endpoint_matches_direct_render(server):
    service, base = server
    url = (f"{base}/frame?ox=-20&oy=40&oz=-20&tx=16&ty=16&tz=16"
           f"&w=64&h=48")
    png = urllib.request.urlopen(url, timeout=30).read()
    from PIL import Image
    import io

    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (48, 64, 3)
    direct = service.render([-20, 40, -20], [16, 16, 16], (64, 48))
    np.testing.assert_array_equal(img, direct)


def test_edit_endpoint_changes_frames(server):
    service, base = server
    frame_url = (f"{base}/frame?ox=20&oy=30&oz=-6&tx=8&ty=12&tz=8&w=48&h=36")
    before = urllib.request.urlopen(frame_url, timeout=30).read()
    # drop a bright slab right under the camera
    ops = [{"op": "insert", "pos": [8, 12, 8], "color": [255, 0, 0, 255],
            "size": 4}]
    req = urllib.request.Request(
        f"{base}/edit", data=json.dumps(ops).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    resp = json.load(urllib.request.urlopen(req, timeout=30))
    assert resp["applied"] == 1
    after = urllib.request.urlopen(frame_url, timeout=30).read()
    assert before != after
    # and clearing restores emptiness at the spot
    ops = [{"op": "clear", "pos": [8, 12, 8], "size": 4}]
    req = urllib.request.Request(
        f"{base}/edit", data=json.dumps(ops).encode(), method="POST"
    )
    json.load(urllib.request.urlopen(req, timeout=30))
    assert service.tree.get((8, 12, 8)).albedo is None


def test_stats_endpoint(server):
    service, base = server
    stats = json.load(urllib.request.urlopen(f"{base}/stats", timeout=30))
    assert stats["size"] == 64
    assert stats["frames_served"] >= 1
    assert "node_count" in stats


def test_streaming_service_serves_windowed_scene():
    tree = _scene(size=64)
    service = RenderService(tree, view_size=32)
    assert service.view is not None
    rgb = service.render([-30, 60, -30], [32, 16, 32], (48, 36))
    assert rgb.shape == (36, 48, 3)
    # edits propagate through the streaming view's triggers
    service.apply_edits({"op": "insert", "pos": [32, 30, 32],
                         "color": [255, 255, 0, 255], "size": 4})
    rgb2 = service.render([-30, 60, -30], [32, 16, 32], (48, 36))
    assert not np.array_equal(rgb, rgb2)


def test_view_distance_endpoint():
    """POST /view (the whisp view-distance knob): switches the live scene
    between dense rendering and streaming windows of different sizes, and
    /stats reports the active window + far-field rings."""
    tree = _scene(size=256)
    service = RenderService(tree)
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def post_view(n):
            req = urllib.request.Request(
                f"{base}/view", data=json.dumps({"view_size": n}).encode(),
                method="POST",
            )
            return json.load(urllib.request.urlopen(req, timeout=60))

        assert service.view is None  # starts dense
        stats = post_view(64)
        assert stats["streaming"] and stats["view_size"] == 64
        assert service.view is not None and service.view.view_size == 64
        # frames still serve through the streaming path (with far rings)
        rgb = service.render([-30, 60, -30], [32, 16, 32], (48, 36))
        assert rgb.shape == (36, 48, 3)
        stats = json.load(urllib.request.urlopen(f"{base}/stats", timeout=60))
        assert stats.get("far_tiers"), "far-field rings missing from stats"
        # 0 = max view distance: back to dense
        stats = post_view(0)
        assert not stats["streaming"] and stats["view_size"] is None
        assert service.view is None
        # invalid (non-REGION-aligned) sizes are a client error
        req = urllib.request.Request(
            f"{base}/view", data=json.dumps({"view_size": 100}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP error for view_size=100")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.shutdown()


def test_viewer_page_has_view_distance_control(server):
    _service, base = server
    html = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
    assert "view distance" in html and "/view" in html


def _tiny_vox_bytes():
    """Minimal valid .vox: one 8^3 model with a few voxels."""
    import struct

    def chunk(cid, content, children=b""):
        return (cid + struct.pack("<ii", len(content), len(children))
                + content + children)

    size = chunk(b"SIZE", struct.pack("<iii", 8, 8, 8))
    voxels = [(1, 1, 1, 1), (2, 1, 1, 2), (1, 2, 1, 3), (4, 4, 4, 4)]
    xyzi = chunk(b"XYZI", struct.pack("<i", len(voxels))
                 + b"".join(struct.pack("<4B", *v) for v in voxels))
    main = chunk(b"MAIN", b"", size + xyzi)
    return b"VOX " + struct.pack("<i", 150) + main


def test_viewer_page_served(server):
    _service, base = server
    html = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
    assert "voxelhex-tpu" in html and "/frame?" in html and "/load" in html


def test_load_endpoint_swaps_scene(tmp_path):
    """POST /load with raw .vox bytes swaps the served scene (the whisp
    drag-drop loader); a second identical upload hits the bencode cache."""
    service = RenderService(_scene())
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        data = _tiny_vox_bytes()
        req = urllib.request.Request(f"{base}/load?name=tiny.vox", data=data,
                                     method="POST")
        resp = json.load(urllib.request.urlopen(req, timeout=60))
        assert resp["loaded"] and resp["size"] == 16  # 8^3 model -> 16-tree
        assert service.tree.size == 16
        # voxel (1,1,1) in Rzup converts into the tree; just check content
        assert service.tree.node_count >= 1
        png = urllib.request.urlopen(
            f"{base}/frame?ox=-10&oy=20&oz=-10&tx=8&ty=4&tz=8&w=32&h=24",
            timeout=60).read()
        assert png[:4] == b"\x89PNG"
        # cache hit path: identical upload round-trips through bencode
        resp2 = json.load(urllib.request.urlopen(
            urllib.request.Request(f"{base}/load?name=tiny.vox", data=data,
                                   method="POST"), timeout=60))
        assert resp2["loaded"]
    finally:
        srv.shutdown()


def test_pose_validated_counter_and_delta_serving():
    """An idle viewer re-requesting the SAME pose rides the validate-once
    fast paths: the service's pose_validated_frames counter climbs, frames
    stay bit-identical, and with fuse_plan the dense path serves via the
    delta stream (digest-only host traffic)."""
    service = RenderService(_scene(), fuse_plan=True)
    origin, target = [96.0, 72.0, 96.0], [32.0, 24.0, 32.0]
    res = (96, 72)
    frames = [service.render(origin, target, res) for _ in range(6)]
    for f in frames[1:]:
        np.testing.assert_array_equal(f, frames[0])
    stats = service.stats()
    assert stats["frames_served"] == 6
    # the later identical-pose frames must have ridden a validated path
    assert stats["pose_validated_frames"] >= 2
    # a different pose still renders exactly (and is not double-counted)
    f2 = service.render([80.0, 60.0, 80.0], target, res)
    assert f2.shape == frames[0].shape


def test_edit_keeps_plans_and_delta_recovers():
    """Dense-path edits refresh device content IN PLACE: the fused plans
    survive (no re-record stall), the edit is visible immediately, and
    the delta stream re-primes once then goes digest-only again."""
    service = RenderService(_scene(), fuse_plan=True)
    origin, target = [96.0, 72.0, 96.0], [32.0, 24.0, 32.0]
    res = (96, 72)
    for _ in range(5):  # record + stabilize + fuse + delta prime
        before = service.render(origin, target, res)
    plans_before = dict(service.renderer._plans)
    assert plans_before  # a plan was recorded
    r_obj = service.renderer
    n = service.apply_edits([
        {"op": "insert", "pos": [28, 28, 28], "size": 8,
         "color": [0, 0, 255, 255]},
    ])
    assert n == 1
    assert service.renderer is r_obj  # renderer object survived the edit
    after = service.render(origin, target, res)
    assert not np.array_equal(after, before)  # the edit is visible
    assert (after[..., 2].astype(int) > after[..., 0].astype(int)).any()
    # steady state again: the same pose goes digest-only once re-primed
    a2 = service.render(origin, target, res)
    a3 = service.render(origin, target, res)
    np.testing.assert_array_equal(a2, after)
    np.testing.assert_array_equal(a3, after)
    assert service.pose_validated_frames >= 2


def test_streaming_idle_pose_cache():
    """Streamed serving: once the view settles, a repeated pose at the
    same content version serves from the idle-pose cache with zero
    dispatches (counted in pose_validated_frames); edits and pose moves
    invalidate it through the content version / key."""
    tree = _scene(size=64)
    service = RenderService(tree, view_size=32)
    origin, target, res = [-30, 60, -30], [32, 16, 32], (48, 36)
    # render until the window settles (budgeted paging completes)
    for _ in range(6):
        f = service.render(origin, target, res)
        if service.view.settled():
            break
    assert service.view.settled()
    f1 = service.render(origin, target, res)  # fills the cache
    base = service.stream_cache_hits
    f2 = service.render(origin, target, res)  # cache hit
    assert service.stream_cache_hits == base + 1
    assert service.pose_validated_frames >= service.stream_cache_hits
    np.testing.assert_array_equal(f1, f2)
    # served frames are COPIES: mutating one must not poison the cache
    f2[:] = 0
    f2b = service.render(origin, target, res)
    np.testing.assert_array_equal(f2b, f1)
    base = service.stream_cache_hits
    # a different pose misses the cache
    f3 = service.render([-28, 60, -30], target, res)
    assert service.stream_cache_hits == base
    # an edit bumps the content version: the old pose re-renders
    service.apply_edits({"op": "insert", "pos": [30, 30, 30],
                         "color": [255, 0, 255, 255], "size": 4})
    f4 = service.render(origin, target, res)
    assert not np.array_equal(f4, f1)
