"""Mesh-sharded streaming render parity (8-device CPU mesh).

The BASELINE "large terrain with sharded ray tiles (streaming path)"
configuration: window + far-ring traces fan out over the rays axis of a
device mesh; frames must match the single-device StreamingView render.
"""

import jax
import numpy as np
from jax.sharding import Mesh

from voxelhex_tpu.parallel.streaming_sharded import render_streaming_sharded
from voxelhex_tpu.render.camera import orbit_camera
from voxelhex_tpu.render.streaming import StreamingView
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)
BLUE = Albedo.from_u32(0x0000FFFF)


def _mesh():
    assert len(jax.devices()) == 8
    return Mesh(np.array(jax.devices()), ("rays",))


def test_sharded_streaming_far_rings_match_single_device():
    # world larger than the window -> far-field LOD rings active
    tree = BoxTree(256, 4, auto_simplify=False)
    rng = np.random.default_rng(7)
    # content inside the (centered) window and beyond it, out to the edge
    for _ in range(300):
        p = tuple(int(v) for v in rng.integers(112, 144, 3))
        tree.insert(p, RED)
    for _ in range(200):
        p = tuple(int(v) for v in rng.integers(0, 256, 3))
        tree.insert(p, GREEN)
    tree.insert((254, 128, 128), BLUE)  # far content near the world edge

    view = StreamingView(tree, view_size=32, regions_per_update=4096)
    cam = orbit_camera(256.0, resolution=(64, 32))
    single = np.asarray(view.render(cam))
    assert view.far is not None and len(view.far.tiers) >= 1

    sharded = render_streaming_sharded(view, cam, _mesh())
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    assert float(np.abs(single).sum()) > 0  # the frame actually has content


def test_sharded_streaming_window_only_matches_single_device():
    # world == window -> no far field; pure window trace shards
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(11)
    for _ in range(300):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, RED)
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    cam = orbit_camera(64.0, resolution=(40, 24))
    single = np.asarray(view.render(cam))
    assert view.far is None

    sharded = render_streaming_sharded(view, cam, _mesh())
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_streaming_multi_ring_matches_single_device():
    """Three far rings (factors 4, 16, 64 at 1024^3/view 32 — the round-4
    4x-per-level ladder): the sharded tier loop must fold every ring
    identically to the single-device path."""
    from voxelhex_tpu.render.camera import Camera

    tree = BoxTree(1024, 4, auto_simplify=True)
    tree.insert_at_lod((16, 16, 16), 8, RED)      # window content
    tree.insert_at_lod((96, 16, 96), 4, RED)       # ring 1 (F4)
    tree.insert_at_lod((224, 16, 224), 16, GREEN)  # ring 2 (F16)
    tree.insert_at_lod((896, 16, 896), 64, BLUE)   # ring 3 (F64)
    view = StreamingView(tree, view_size=32, regions_per_update=4096)
    cam = Camera(
        origin=np.array([28.0, 30.0, 28.0], dtype=np.float32),
        target=np.array([34.0, 26.0, 34.0], dtype=np.float32),
        up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
        fov_y_deg=50.0,
        resolution=(64, 32),
    )
    single = np.asarray(view.render(cam))
    assert view.far is not None and len(view.far.tiers) == 3
    assert [t.factor for t in view.far.tiers] == [4, 16, 64]

    sharded = render_streaming_sharded(view, cam, _mesh())
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    nz = np.any(single != 0.0, axis=-1)
    assert nz.sum() >= 3  # ring content visible in both renders


def test_sharded_streaming_uses_device_raygen():
    """When rows divide the mesh, the frame's host->device traffic is
    camera params only — the cam-variant shard fn is cached (and the
    host-ray fallback engages when rows don't divide)."""
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(3)
    for _ in range(100):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, RED)
    view = StreamingView(tree, view_size=64, regions_per_update=4096)
    mesh = _mesh()
    cam = orbit_camera(64.0, resolution=(40, 24))  # 24 rows / 8 devices
    single = np.asarray(view.render(cam))
    out = render_streaming_sharded(view, cam, mesh)
    np.testing.assert_allclose(out, single, atol=1e-5)
    keys = list(view._sharded_stream_fns)
    assert any(len(k) == 5 and k[-1] == "cam" for k in keys)

    # 30 rows don't divide 8 devices -> host-ray fallback, still exact
    cam2 = orbit_camera(64.0, resolution=(40, 30))
    single2 = np.asarray(view.render(cam2))
    out2 = render_streaming_sharded(view, cam2, mesh)
    np.testing.assert_allclose(out2, single2, atol=1e-5)
