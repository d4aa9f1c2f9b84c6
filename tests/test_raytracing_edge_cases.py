"""Named raytracing regression scenarios ported from the reference
(reference: src/raytracing/tests.rs:250-530) — frozen rays that once hit
traversal bugs (stuck loops, zero advances, missed bricks, corner grazes).
Each scenario runs against the oracle AND the BitGrid device renderer.
"""

import numpy as np
import pytest

from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree, Entry
from voxelhex_tpu.tree.flat import flatten


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).astype(np.float32)


def both_renderers_hit(tree, origin, direction):
    """(oracle_hit, device_hit) for one ray."""
    flat = flatten(tree)
    o = np.asarray(origin, dtype=np.float32)
    d = _norm(direction)
    oracle = get_by_ray(flat, o, d)
    r = BitGridRenderer(tree, max_iters=512)
    hit, voxel, _, _, _ = r.trace(o[None], d[None])
    return oracle, bool(np.asarray(hit)[0])


def diagonal_scene():
    """The reference's 'unreachable'/'zero advance'/'loop stuck' scene: a
    diagonal wall plus corner voxels in a 4^3 dim-1 tree."""
    tree = BoxTree(4, 1, auto_simplify=False)
    a1 = Albedo.from_u32(1)  # tiny alpha, still occupied
    a2 = Albedo.from_u32(2)
    a3 = Albedo.from_u32(3)
    tree.insert((3, 0, 0), a1)
    tree.insert((3, 3, 0), a1)
    tree.insert((0, 3, 0), a2)
    for y in range(4):
        for x in range(4):
            tree.insert((x, y, y), a3)
    return tree


def test_edge_case_unreachable_terminates():
    tree = diagonal_scene()
    # must terminate without errors (hit or miss both acceptable)
    oracle, dev = both_renderers_hit(
        tree, [10.0, 10.0, -5.0], [-0.66739213, -0.6657588, 0.333696]
    )
    assert (oracle is not None) == dev


def test_edge_case_zero_advance():
    tree = diagonal_scene()
    oracle, dev = both_renderers_hit(
        tree, [8.930992, 10.0, -4.498597], [-0.4687217, -0.772969, 0.42757326]
    )
    assert oracle is not None
    assert dev


def test_edge_case_empty_line_in_middle():
    tree = BoxTree(4, 1, auto_simplify=False)
    tree.insert((2, 1, 1), Albedo.from_u32(3))
    oracle, dev = both_renderers_hit(
        tree, [8.965594, 10.0, -4.4292345], [-0.5082971, -0.72216684, 0.46915793]
    )
    assert oracle is not None
    assert dev


def test_edge_case_ray_behind_boxtree():
    tree = BoxTree(4, 1, auto_simplify=False)
    tree.insert((0, 3, 0), Entry(data=5))
    origin = np.array([2.0, 2.0, -5.0])
    direction = np.array([0.0, 3.0, 0.0]) - origin
    oracle, dev = both_renderers_hit(tree, origin, direction)
    assert oracle is not None
    assert dev


def test_edge_case_overlapping_voxels():
    tree = BoxTree(4, 1, auto_simplify=False)
    tree.insert((0, 0, 0), Entry(data=5))
    tree.insert((1, 0, 0), Albedo.from_u32(6))
    flat = flatten(tree)
    o = np.array([2.0, 4.0, -2.0], dtype=np.float32)
    d = _norm([-0.23184556, -0.79392403, 0.5620785])
    hit = get_by_ray(flat, o, d)
    assert hit is not None
    # the ray must hit voxel (1,0,0) (color 6), not the data voxel behind it
    assert hit.albedo(flat)[3] > 0 or hit.voxel != 0x3FFFFFFE


def test_edge_case_edge_raycast_floor():
    tree = BoxTree(4, 1, auto_simplify=False)
    for x in range(4):
        for z in range(4):
            tree.insert((x, 0, z), Entry(data=5))
    oracle, dev = both_renderers_hit(
        tree, [2.0, 4.0, -2.0], [-0.47839317, -0.71670955, 0.50741255]
    )
    # reference allows miss-or-hit-the-floor on this edge graze
    assert (oracle is not None) == dev


def test_edge_case_voxel_corner():
    tree = BoxTree(4, 1, auto_simplify=False)
    for x in range(4):
        for z in range(4):
            tree.insert((x, 0, z), Entry(data=5))
    oracle, dev = both_renderers_hit(
        tree, [2.0, 4.0, -2.0], [-0.27100056, -0.7961219, 0.54106253]
    )
    assert oracle is not None
    assert dev


def test_edge_case_bottom_edge():
    tree = BoxTree(4, 1, auto_simplify=False)
    for x in range(4):
        for z in range(4):
            tree.insert((x, 0, z), Entry(data=5))
    oracle, dev = both_renderers_hit(
        tree, [2.0, 4.0, -2.0], [-0.379010856, -0.822795153, 0.423507959]
    )
    assert oracle is not None
    assert dev


def test_edge_case_loop_stuck_terminates():
    tree = BoxTree(4, 1, auto_simplify=False)
    a = Albedo.from_u32(6)
    tree.insert((3, 0, 0), Albedo.from_u32(1))
    tree.insert((3, 3, 0), Albedo.from_u32(1))
    tree.insert((0, 3, 0), Albedo.from_u32(2))
    for y in range(4):
        tree.insert((0, y, y), Albedo.from_u32(3))
        tree.insert((1, y, y), Albedo.from_u32(4))
        tree.insert((2, y, y), Entry(data=5))
        tree.insert((3, y, y), a)
    # should terminate (not loop forever)
    oracle, dev = both_renderers_hit(
        tree, [0.024999974, 10.0, 0.0], [-0.0030831057, -0.98595166, 0.16700225]
    )
    assert (oracle is not None) == dev


def test_edge_case_brick_undetected():
    """Bricks in a dim-4 tree must be found by near-tangent rays
    (reference: tests.rs:527-560)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(4):
        for z in range(16):
            tree.insert((x, 0, z), Albedo.from_u32(0xFFFFFFFF))
    flat = flatten(tree)
    r = BitGridRenderer(tree, max_iters=512)
    o = np.array([0.0, 4.0, -2.0], dtype=np.float32)
    d = _norm([0.05, -0.7, 0.7])
    oracle = get_by_ray(flat, o, d)
    hit, _, _, _, _ = r.trace(o[None], d[None])
    assert oracle is not None
    assert bool(np.asarray(hit)[0])


def test_random_grazing_rays_consistent():
    """Property sweep: oracle and device agree on near-tangent floor rays."""
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(16):
        for z in range(16):
            tree.insert((x, 0, z), Albedo.from_u32(0xAABBCCFF))
    flat = flatten(tree)
    r = BitGridRenderer(tree, max_iters=512)
    rng = np.random.default_rng(2)
    n = 60
    origins, dirs = [], []
    for _ in range(n):
        o = np.array([rng.uniform(0, 16), 4.0, -2.0], dtype=np.float32)
        tgt = np.array([rng.uniform(0.3, 15.7), 0.5, rng.uniform(0.3, 15.7)])
        dirs.append(_norm(tgt - o))
        origins.append(o)
    origins = np.stack(origins)
    dirs = np.stack(dirs)
    hits, _, _, _, _ = r.trace(origins, dirs)
    hits = np.asarray(hits)
    agree = 0
    for i in range(n):
        oracle = get_by_ray(flat, origins[i], dirs[i])
        agree += int((oracle is not None) == bool(hits[i]))
    assert agree >= n - 1  # allow at most one boundary disagreement


# ---------------------------------------------------------------------------
# remaining named regressions (reference: src/raytracing/tests.rs:560-880)
# ---------------------------------------------------------------------------

from voxelhex_tpu.tree.build import from_voxels


def _grid_scene(size, brick_dim, mask_fn, color_fn):
    """Bulk-build a tree from a boolean predicate over the voxel grid."""
    coords = np.argwhere(
        np.fromfunction(mask_fn, (size, size, size), dtype=np.int64)
    )
    colors = color_fn(coords).astype(np.uint8)
    return from_voxels(coords, colors, size, brick_dim, simplify=True)


def test_edge_case_detailed_brick_undetected():
    """Full 8^3 dim-2 tree; a grazing ray from above must hit
    (reference: src/raytracing/tests.rs test_edge_case_detailed_brick_undetected)."""
    tree = BoxTree(8, 2, auto_simplify=False)
    red = Albedo.from_u32(0xFF0000FF)
    for x in range(8):
        for y in range(8):
            for z in range(8):
                tree.insert((x, y, z), red)
    oracle, dev = both_renderers_hit(
        tree, [15.8443775, 16.0, 2.226141], [-0.7984906, -0.60134345, 0.028264323]
    )
    assert oracle is not None
    assert dev


def test_edge_case_detailed_brick_z_edge_error():
    """Filled [1,8)^3 region, dim 2: a ray entering through the front face
    must first hit a z=1 voxel with normal (0,0,-1)
    (reference: src/raytracing/tests.rs test_edge_case_detailed_brick_z_edge_error)."""
    tree = BoxTree(8, 2, auto_simplify=False)
    for x in range(1, 8):
        for y in range(1, 8):
            for z in range(1, 8):
                tree.insert((x, y, z), Albedo(z * 30, 0, 0, 255))
    o = np.array([11.92238, 16.0, -10.670372], dtype=np.float32)
    d = _norm([-0.30062392, -0.6361918, 0.7105529])
    oracle = get_by_ray(flatten(tree), o, d)
    assert oracle is not None
    np.testing.assert_array_equal(oracle.normal, [0.0, 0.0, -1.0])
    r = BitGridRenderer(tree, max_iters=512)
    hit, _voxel, hvox, _pt, normal = r.trace(o[None], d[None])
    assert bool(np.asarray(hit)[0])
    assert int(np.asarray(hvox)[0, 2]) == 1
    np.testing.assert_array_equal(np.asarray(normal)[0], [0.0, 0.0, -1.0])


def test_edge_case_deep_stack():
    """1024-tree with dim-1 bricks: a ray crossing the whole world must reach
    the far-corner voxel through the full stack depth
    (reference: src/raytracing/tests.rs test_edge_case_deep_stack)."""
    tree = BoxTree(1024, 1, auto_simplify=False)
    target = np.array([1023, 1023, 1023])
    tree.insert((0, 0, 0), Albedo.from_u32(0x000000EE))
    tree.insert(tuple(target), Albedo.from_u32(0x000000FF))
    o = np.array([0.0, 5.0, -1.0], dtype=np.float32)
    d = _norm(target + 0.5 - o)
    oracle = get_by_ray(flatten(tree), o, d, max_steps=100000)
    assert oracle is not None
    r = BitGridRenderer(tree, max_iters=4096)
    hit, _voxel, hvox, _pt, _n = r.trace(o[None], d[None])
    assert bool(np.asarray(hit)[0])
    np.testing.assert_array_equal(np.asarray(hvox)[0], target)


def test_edge_case_brick_traversal_error():
    """Single voxel at the origin of an 8-tree with dim-2 bricks; a long
    diagonal ray from outside must hit it
    (reference: src/raytracing/tests.rs test_edge_case_brick_traversal_error)."""
    tree = BoxTree(8, 2, auto_simplify=False)
    tree.insert((0, 0, 0), Albedo.from_u32(0x000000FF))
    o = [23.84362, 32.0, -21.342018]
    d = [-0.51286834, -0.70695364, 0.48701409]
    oracle, dev = both_renderers_hit(tree, o, d)
    assert oracle is not None
    assert np.linalg.norm(oracle.point - [0.0, 0.0, 0.0]) < 1.5
    assert dev


def test_edge_case_brick_boundary_error():
    """Sparse lattice walls plus a solid octant in a 128-tree with dim-8
    bricks; the frozen ray must report a hit
    (reference: src/raytracing/tests.rs test_edge_case_brick_boundary_error)."""
    S = 128

    def mask(x, y, z):
        walls = ((x < S // 4) | (y < S // 4) | (z < S // 4)) & (
            (x % 2 == 0) & (y % 4 == 0) & (z % 2 == 0)
        )
        octant = (x >= S // 2) & (y >= S // 2) & (z >= S // 2)
        return walls | octant

    def color(c):
        out = np.empty((len(c), 4), dtype=np.uint8)
        out[:, 0] = (255 * (c[:, 0] % 6) / 6.0).astype(np.uint8)
        out[:, 1] = (255 * (c[:, 1] % 6) / 6.0).astype(np.uint8)
        out[:, 2] = (255 * (c[:, 2] % 6) / 6.0).astype(np.uint8)
        out[:, 3] = 255
        return out

    tree = _grid_scene(S, 8, mask, color)
    oracle, dev = both_renderers_hit(
        tree, [191.60886, 256.0, -169.77057], [-0.38838777, -0.49688956, 0.7760514]
    )
    assert oracle is not None
    assert dev


def test_edge_case_cube_flaps():
    """Solid far octant of a 64-tree: the frozen grazing ray must MISS —
    phantom 'flaps' at cube faces once produced false hits
    (reference: src/raytracing/tests.rs test_edge_case_cube_flaps)."""
    S = 64

    def mask(x, y, z):
        return (x >= S // 2) & (y >= S // 2) & (z >= S // 2)

    def color(c):
        out = (255.0 * c / S).astype(np.uint8)
        return np.concatenate([out, np.full((len(c), 1), 255, np.uint8)], axis=1)

    tree = _grid_scene(S, 1, mask, color)
    oracle, dev = both_renderers_hit(
        tree, [47.898006, 64.0, -42.44739], [-0.42279032, -0.4016629, 0.8123516]
    )
    assert oracle is None
    assert not dev


def test_edge_case_context_bleed():
    """Sparse lattice walls in a 64-tree with dim-1 bricks; stale traversal
    state once made this frozen ray miss
    (reference: src/raytracing/tests.rs test_edge_case_context_bleed)."""
    S = 64

    def mask(x, y, z):
        return ((x < S // 4) | (y < S // 4) | (z < S // 4)) & (
            (x % 2 == 0) & (y % 4 == 0) & (z % 2 == 0)
        )

    def color(c):
        out = (255.0 * c / S).astype(np.uint8)
        return np.concatenate([out, np.full((len(c), 1), 255, np.uint8)], axis=1)

    tree = _grid_scene(S, 1, mask, color)
    oracle, dev = both_renderers_hit(
        tree, [47.898006, 64.0, -42.44739], [-0.49263135, -0.49703234, 0.714334]
    )
    assert oracle is not None
    assert dev
