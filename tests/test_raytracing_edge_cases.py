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
