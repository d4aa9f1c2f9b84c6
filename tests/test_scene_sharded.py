"""Scene-sharded (world-partitioned) rendering tests on the 8-device mesh.

The scene is split into 8 cubic octants, one per device; rays are
replicated and the global first hit is the min-distance hit across
octants.  Must match the single-device replicated renderer bit-for-bit.
"""

import numpy as np
import pytest

from voxelhex_tpu.parallel.render import make_ray_mesh
from voxelhex_tpu.parallel.scene_sharded import (
    build_octant_grids,
    render_scene_sharded,
    sharded_scene_render_fn,
)
from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.camera import Camera, device_rays, orbit_camera
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten


def _scene(size=64, brick=4, n=700, seed=9):
    rng = np.random.default_rng(seed)
    tree = BoxTree(size, brick, auto_simplify=False)
    for _ in range(n):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        c = rng.integers(1, 255, 4)
        c[3] = 255
        tree.insert(p, Albedo(*(int(x) for x in c)))
    return flatten(tree)


def test_octant_partition_covers_scene():
    flat = _scene()
    stacked, mins, renderer = build_octant_grids(flat, 2)
    assert mins.shape == (8, 3)
    assert renderer.bitgrid.size == flat.size // 2
    # every occupied voxel of the full grid appears in exactly one octant
    from voxelhex_tpu.render.bitgrid import _dense_from_flat

    occ_full, col_full = _dense_from_flat(flat)
    total = int(occ_full.sum())
    got = 0
    W = flat.size // 2
    colors = np.asarray(stacked["colors"])  # [8, W^3]
    from voxelhex_tpu.render.bitgrid import COLOR_EMPTY

    for i in range(8):
        got += int((colors[i] != COLOR_EMPTY).sum())
    assert got == total


def test_scene_sharded_matches_replicated():
    flat = _scene()
    mesh = make_ray_mesh(axis_name="scene")
    cam = orbit_camera(64.0, resolution=(64, 48))
    rgb_sharded = render_scene_sharded(flat, cam, mesh)

    single = BitGridRenderer(flat)
    rgb_single = single.render(cam, compact=False)
    np.testing.assert_allclose(rgb_sharded, rgb_single, atol=1e-5)


def test_scene_sharded_camera_inside():
    """Cameras inside the world (origin within some octant) still combine
    correctly — the containing octant starts its march at the origin."""
    flat = _scene(seed=3)
    mesh = make_ray_mesh(axis_name="scene")
    cam = Camera(origin=(20.0, 30.0, 25.0), target=(50.0, 40.0, 45.0),
                 resolution=(48, 32))
    rgb_sharded = render_scene_sharded(flat, cam, mesh)
    single = BitGridRenderer(flat)
    rgb_single = single.render(cam, compact=False)
    np.testing.assert_allclose(rgb_sharded, rgb_single, atol=1e-5)


def test_scene_sharded_memory_factor():
    """Each octant stores 1/8 of the voxel data (the vast-scene enabler)."""
    flat = _scene()
    stacked, _mins, _r = build_octant_grids(flat, 2)
    per_dev_voxels = np.asarray(stacked["colors"]).shape[1]
    assert per_dev_voxels * 8 == flat.size**3


def _hybrid_mesh(n_scene, n_rays):
    import jax

    devs = np.array(jax.devices()[: n_scene * n_rays]).reshape(n_scene, n_rays)
    from jax.sharding import Mesh

    return Mesh(devs, ("scene", "rays"))


@pytest.mark.parametrize("n_scene,n_rays", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_hybrid_mesh_matches_replicated(n_scene, n_rays):
    """2-D (scene, rays) mesh: octants sharded on one axis, rays DP on the
    other — must match the single-device replicated render."""
    from voxelhex_tpu.parallel.scene_sharded import render_hybrid

    flat = _scene()
    mesh = _hybrid_mesh(n_scene, n_rays)
    cam = orbit_camera(64.0, resolution=(64, 48))
    rgb_hybrid = render_hybrid(flat, cam, mesh)

    single = BitGridRenderer(flat)
    rgb_single = single.render(cam, compact=False)
    np.testing.assert_allclose(rgb_hybrid, rgb_single, atol=1e-5)


def test_hybrid_mesh_ray_padding_and_inside_camera():
    """Ray counts that don't divide the ray axis get padded; cameras inside
    the world still combine correctly."""
    from voxelhex_tpu.parallel.scene_sharded import render_hybrid

    flat = _scene(seed=3)
    mesh = _hybrid_mesh(2, 4)
    # 50*30 = 1500 rays; 1500 % 4 = 0 -> use 49x30 = 1470, 1470 % 4 = 2
    cam = Camera(origin=(20.0, 30.0, 25.0), target=(50.0, 40.0, 45.0),
                 resolution=(49, 30))
    rgb_hybrid = render_hybrid(flat, cam, mesh)
    single = BitGridRenderer(flat)
    rgb_single = single.render(cam, compact=False)
    np.testing.assert_allclose(rgb_hybrid, rgb_single, atol=1e-5)


def test_scene_sharded_u8_colors_match_replicated():
    """Small palettes store octant colors as u8 on device (halved HBM);
    renders must still match the replicated u16 renderer exactly."""
    from voxelhex_tpu.parallel.scene_sharded import build_octant_grids

    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(5)
    cols = [Albedo(200, 40, 40, 255), Albedo(40, 200, 40, 255),
            Albedo(40, 40, 200, 255)]
    for _ in range(700):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, cols[int(rng.integers(0, 3))])
    flat = flatten(tree)
    stacked, _mins, _r = build_octant_grids(flat, 2)
    assert np.asarray(stacked["colors"]).dtype == np.uint8

    mesh = make_ray_mesh(axis_name="scene")
    cam = orbit_camera(64.0, resolution=(64, 48))
    rgb_sharded = render_scene_sharded(flat, cam, mesh)
    rgb_single = BitGridRenderer(flat).render(cam, compact=False)
    np.testing.assert_allclose(rgb_sharded, rgb_single, atol=1e-5)
