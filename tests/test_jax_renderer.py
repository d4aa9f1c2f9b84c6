"""JAX renderer parity tests vs the NumPy oracle (CPU backend)."""

import numpy as np
import pytest

from voxelhex_tpu.render.camera import Camera, orbit_camera
from voxelhex_tpu.render.jax_renderer import JaxRenderer
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)
BLUE = Albedo.from_u32(0x0000FFFF)


@pytest.fixture(scope="module")
def scene():
    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(11)
    colors = [RED, GREEN, BLUE]
    for _ in range(150):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        tree.insert(p, colors[rng.integers(0, 3)])
    tree.insert_at_lod((8, 8, 8), 4, RED)  # one solid uniform node
    flat = flatten(tree)
    return flat, JaxRenderer(flat)


def test_matches_oracle_on_random_rays(scene):
    flat, renderer = scene
    rng = np.random.default_rng(5)
    n = 150
    targets = rng.random((n, 3)) * 16
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 40).astype(np.float32)
    dirs = dirs.astype(np.float32)
    hit, voxel, _hb, _hc, hpoint, _ = renderer.trace(origins, dirs)
    hit, voxel = np.asarray(hit), np.asarray(voxel)
    hpoint = np.asarray(hpoint)
    checked = 0
    for i in range(n):
        frac = np.abs(targets[i] - np.round(targets[i]))
        if np.any(frac < 0.05):
            continue  # boundary-grazing rays are documented-flaky
        expected = get_by_ray(flat, origins[i], dirs[i])
        checked += 1
        assert (expected is not None) == bool(hit[i]), i
        if expected is not None:
            assert expected.voxel == int(voxel[i]), i
            np.testing.assert_allclose(expected.point, hpoint[i], atol=1e-2)
    assert checked > 80


def test_matches_oracle_rays_from_inside(scene):
    flat, renderer = scene
    rng = np.random.default_rng(9)
    n = 60
    origins = (rng.random((n, 3)) * 12 + 2).astype(np.float32)
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
    assert checked > 30


def test_render_frame_shapes_and_content(scene):
    flat, renderer = scene
    cam = orbit_camera(flat.size, resolution=(64, 48))
    img = renderer.render(cam)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something visible


def test_render_solid_cube_covers_screen():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 16, GREEN)
    flat = flatten(tree)
    renderer = JaxRenderer(flat)
    cam = Camera(
        origin=np.array([8.0, 8.0, -20.0]),
        target=np.array([8.0, 8.0, 8.0]),
        resolution=(32, 32),
        fov_y_deg=40.0,
    )
    img = renderer.render(cam)
    # green everywhere, shaded
    assert (img[:, :, 1] > 0.1).mean() > 0.95
    assert img[:, :, 0].max() < 1e-3


def test_degenerate_lookat_camera_renders():
    """A camera straight above (or below) its target makes forward parallel
    to the default up vector; the basis must fall back to another axis
    instead of producing a NaN ray grid (regression: black frames + NaN
    normalize warnings for top-down cameras)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 16, GREEN)
    flat = flatten(tree)
    renderer = JaxRenderer(flat)
    for eye_y in (24.0, -8.0):  # close enough that the cube fills the fov
        cam = Camera(
            origin=np.array([8.0, eye_y, 8.0]),
            target=np.array([8.0, 8.0, 8.0]),
            resolution=(16, 16),
            fov_y_deg=40.0,
        )
        f, r, u = cam.basis()
        for v in (f, r, u):
            assert np.isfinite(v).all()
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        img = renderer.render(cam)
        assert np.isfinite(img).all()
        assert (img[:, :, 1] > 0.1).mean() > 0.9  # cube fills the view


def test_orbit_roll_continuity_through_pole():
    """An orbiting camera crossing straight-down keeps a continuous roll:
    the basis now Gram-Schmidts the supplied up hint against forward
    instead of snapping to a world axis at the 0.9999 parallel threshold
    (ADVICE r3).  Consecutive right vectors across the pole crossing must
    stay nearly parallel (no ~90-degree flip)."""
    target = np.array([8.0, 8.0, 8.0])
    rights = []
    # pitch approaches 90 degrees (camera almost directly above the target);
    # the old code snapped to a world axis once |dot| crossed 0.9999
    for pitch_deg in (88.0, 89.5, 89.995, 89.9999):
        pitch = np.radians(pitch_deg)
        r = 20.0
        eye = target + r * np.array([0.0, np.sin(pitch), -np.cos(pitch)])
        cam = Camera(origin=eye, target=target, resolution=(8, 8))
        f, right, u = cam.basis()
        for v in (f, right, u):
            assert np.isfinite(v).all()
            assert abs(np.linalg.norm(v) - 1.0) < 1e-4
        rights.append(right)
    for a, b in zip(rights, rights[1:]):
        assert float(np.dot(a, b)) > 0.999, (a, b)


def test_near_parallel_supplied_up_is_honored():
    """A user-supplied up within the old 0.9999 threshold is Gram-Schmidted,
    not discarded: the projected up keeps the supplied tilt direction."""
    eye = np.array([8.0, 28.0, 8.0])
    target = np.array([8.0, 8.0, 8.0])
    # up tilted a hair off straight-up, toward +x
    up_hint = np.array([5e-3, 1.0, 0.0])
    cam = Camera(origin=eye, target=target, up=up_hint, resolution=(8, 8))
    f, r, u = cam.basis()
    # forward is [0,-1,0]; the orthogonalized up must point along +x
    assert float(u[0]) > 0.99, u


def test_exactly_parallel_up_still_falls_back():
    """With forward EXACTLY parallel to up (zero residual) the fixed-axis
    fallback still applies — finite orthonormal basis, no NaNs."""
    cam = Camera(
        origin=np.array([8.0, 24.0, 8.0]),
        target=np.array([8.0, 8.0, 8.0]),
        up=np.array([0.0, 1.0, 0.0]),
        resolution=(8, 8),
    )
    f, r, u = cam.basis()
    for v in (f, r, u):
        assert np.isfinite(v).all()
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
