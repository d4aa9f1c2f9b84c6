"""Wavefront (flat batched loop) renderer parity tests vs the oracle."""

import numpy as np
import pytest

from voxelhex_tpu.render.camera import Camera, orbit_camera
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.render.wavefront import WavefrontRenderer
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)
BLUE = Albedo.from_u32(0x0000FFFF)


@pytest.fixture(scope="module", params=[1, 2, 4])
def scene(request):
    dim = request.param
    size = 4 * dim if dim > 1 else 16
    tree = BoxTree(size, dim, auto_simplify=False)
    rng = np.random.default_rng(100 + dim)
    colors = [RED, GREEN, BLUE]
    for _ in range(size**2 * 2):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        tree.insert(p, colors[rng.integers(0, 3)])
    if size >= 16:
        tree.insert_at_lod((8, 8, 8), 4, RED)
    flat = flatten(tree)
    return flat, WavefrontRenderer(flat)


def test_wavefront_matches_oracle(scene):
    flat, renderer = scene
    size = flat.size
    rng = np.random.default_rng(55)
    n = 120
    targets = rng.random((n, 3)) * size
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 3 * size).astype(np.float32)
    dirs = dirs.astype(np.float32)
    hit, voxel, hb, hc, hpoint, hnormal = renderer.trace(origins, dirs)
    hit, voxel = np.asarray(hit), np.asarray(voxel)
    hb, hc = np.asarray(hb), np.asarray(hc)
    hpoint = np.asarray(hpoint)
    checked = 0
    for i in range(n):
        frac = np.abs(targets[i] - np.round(targets[i]))
        if np.any(frac < 0.05):
            continue
        expected = get_by_ray(flat, origins[i], dirs[i])
        checked += 1
        assert (expected is not None) == bool(hit[i]), i
        if expected is not None:
            assert expected.voxel == int(voxel[i]), i
            np.testing.assert_allclose(expected.point, hpoint[i], atol=2e-2)
            # hit indices point to the hit voxel in the brick pool
            if hb[i] >= 0:
                assert flat.bricks[hb[i], hc[i]] == expected.voxel
    assert checked > 60


def test_wavefront_inside_rays(scene):
    flat, renderer = scene
    size = flat.size
    rng = np.random.default_rng(77)
    n = 60
    origins = (rng.random((n, 3)) * (size - 2) + 1).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(np.float32)
    hit, voxel, _hb, _hc, _, _ = renderer.trace(origins, dirs)
    hit, voxel = np.asarray(hit), np.asarray(voxel)
    checked = 0
    for i in range(n):
        frac = np.abs(origins[i] - np.round(origins[i]))
        if np.any(frac < 0.05):
            continue
        expected = get_by_ray(flat, origins[i], dirs[i])
        checked += 1
        assert (expected is not None) == bool(hit[i]), i
        if expected is not None:
            assert expected.voxel == int(voxel[i]), i
    assert checked > 25


def test_wavefront_render_frame(scene):
    flat, renderer = scene
    cam = orbit_camera(flat.size, resolution=(48, 32))
    img = renderer.render(cam)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()


def test_wavefront_matches_vmap_renderer():
    from voxelhex_tpu.render.jax_renderer import JaxRenderer

    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(1)
    for _ in range(100):
        tree.insert(tuple(int(v) for v in rng.integers(0, 16, 3)), GREEN)
    flat = flatten(tree)
    cam = orbit_camera(flat.size, resolution=(32, 24))
    a = WavefrontRenderer(flat).render(cam)
    b = JaxRenderer(flat).render(cam)
    np.testing.assert_allclose(a, b, atol=1e-5)
