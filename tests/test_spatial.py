"""Spatial math unit tests.

Covers sectant hashing/stepping, flat projection, occupancy bitmaps,
ray/cube intersection edge cases and impact normals — the same surface the
reference exercises in src/spatial/tests.rs, src/spatial/math/tests.rs and
src/spatial/raytracing/tests.rs.
"""

import numpy as np
import pytest

from voxelhex_tpu.spatial import (
    OOB_SECTANT,
    RAY_TO_NODE_OCCUPANCY_BITMASK_LUT,
    SECTANT_OFFSET_LUT,
    SECTANT_STEP_RESULT_LUT,
    child_bounds_for,
    cube_contains,
    cube_impact_normal,
    dda_scale_factors,
    dda_step_to_next_sibling,
    flat_projection,
    hash_direction,
    intersect_ray_aabb,
    offset_sectant,
    sectant_offset,
    step_sectant,
)
from voxelhex_tpu.spatial.math import brick_occupied_bits, set_occupied_bits


def test_flat_projection_roundtrip():
    size = 5
    seen = set()
    for z in range(size):
        for y in range(size):
            for x in range(size):
                i = flat_projection(x, y, z, size)
                assert i not in seen
                seen.add(i)
    assert seen == set(range(size**3))


def test_offset_sectant_corners_and_boundaries():
    assert offset_sectant([0, 0, 0], 4.0) == 0
    assert offset_sectant([3.9, 0, 0], 4.0) == 3
    assert offset_sectant([0, 3.9, 0], 4.0) == 12
    assert offset_sectant([0, 0, 3.9], 4.0) == 48
    assert offset_sectant([3.9, 3.9, 3.9], 4.0) == 63
    # upper boundary maps inside (ray entering on a face)
    assert offset_sectant([4.0, 4.0, 4.0], 4.0) == 63
    # scaling invariance
    assert offset_sectant([10.0, 20.0, 30.0], 40.0) == 1 + 2 * 4 + 3 * 16


def test_sectant_offset_lut_matches_arithmetic():
    for s in range(64):
        np.testing.assert_allclose(SECTANT_OFFSET_LUT[s], sectant_offset(s))
    # spot values against the reference table (src/spatial/lut.rs:4-24)
    np.testing.assert_allclose(sectant_offset(0), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(sectant_offset(3), [0.75, 0.0, 0.0])
    np.testing.assert_allclose(sectant_offset(21), [0.25, 0.25, 0.25])
    np.testing.assert_allclose(sectant_offset(63), [0.75, 0.75, 0.75])


def test_step_sectant_inside_and_oob():
    # stepping +x from sectant 0 -> 1; -x -> out of bounds
    assert step_sectant(0, [1, 0, 0]) == 1
    assert step_sectant(0, [-1, 0, 0]) >= OOB_SECTANT
    assert step_sectant(0, [0, 1, 0]) == 4
    assert step_sectant(0, [0, 0, 1]) == 16
    assert step_sectant(63, [1, 0, 0]) >= OOB_SECTANT
    assert step_sectant(21, [1, 1, 1]) == 21 + 1 + 4 + 16
    # LUT agrees with the arithmetic version on in-bounds results
    for s in range(64):
        for ix, dx in enumerate((-1, 0, 1)):
            for iy, dy in enumerate((-1, 0, 1)):
                for iz, dz in enumerate((-1, 0, 1)):
                    expect = step_sectant(s, [dx, dy, dz])
                    got = SECTANT_STEP_RESULT_LUT[s, ix, iy, iz]
                    if expect >= OOB_SECTANT:
                        assert got >= OOB_SECTANT
                    else:
                        assert got == expect


def test_hash_direction_octants():
    assert hash_direction(np.array([1.0, 0, 0]) / 1.0) == 1 + 2 + 4  # zeros are +
    d = np.array([-1.0, -1.0, -1.0]) / np.sqrt(3)
    assert hash_direction(d) == 0
    d = np.array([1.0, -1.0, -1.0]) / np.sqrt(3)
    assert hash_direction(d) == 1
    d = np.array([-1.0, -1.0, 1.0]) / np.sqrt(3)
    assert hash_direction(d) == 2
    d = np.array([-1.0, 1.0, -1.0]) / np.sqrt(3)
    assert hash_direction(d) == 4


def test_ray_occupancy_masks_reference_values():
    """Regression-check generated masks against values from the reference's
    shipped table (src/spatial/lut.rs:96-161)."""
    lut = RAY_TO_NODE_OCCUPANCY_BITMASK_LUT
    assert lut[0][0] == 1
    assert lut[0][1] == 15
    assert lut[0][4] == 4369
    assert lut[0][7] == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert lut[1][0] == 3
    assert lut[1][1] == 14
    assert lut[63][7] == np.uint64(1 << 63)
    assert lut[63][0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert lut[9][1] == 3822  # entry (1,2,0), +x


def test_cube_contains_half_open():
    assert cube_contains([0, 0, 0], 4.0, [0, 0, 0])
    assert cube_contains([0, 0, 0], 4.0, [3.999, 3.999, 3.999])
    assert not cube_contains([0, 0, 0], 4.0, [4.0, 0, 0])
    assert not cube_contains([0, 0, 0], 4.0, [-0.001, 0, 0])


def test_child_bounds():
    mn, sz = child_bounds_for([0, 0, 0], 16.0, 21)
    np.testing.assert_allclose(mn, [4.0, 4.0, 4.0])
    assert sz == 4.0


def _norm(v):
    v = np.asarray(v, dtype=np.float32)
    return v / np.linalg.norm(v)


def test_intersect_ray_aabb_outside_hit():
    hit, dist = intersect_ray_aabb([2, 2, -5], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert hit and dist == pytest.approx(5.0, abs=1e-5)


def test_intersect_ray_aabb_miss():
    hit, _ = intersect_ray_aabb([10, 10, -5], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert not hit


def test_intersect_ray_aabb_behind():
    hit, _ = intersect_ray_aabb([2, 2, 10], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert not hit


def test_intersect_ray_aabb_inside():
    hit, dist = intersect_ray_aabb([2, 2, 2], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert hit and dist is None


def test_intersect_ray_aabb_axis_parallel_on_edge():
    # A ray sliding exactly along the bottom edge MISSES: the 0/0 slab NaNs
    # resolve to +inf under NaN-ignoring min/max, exactly as in the reference
    # (Rust f32::min semantics) — boundary rays are treated as outside.
    hit, _ = intersect_ray_aabb([0, 0, -5], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert not hit
    # nudged barely inside, it hits
    hit, dist = intersect_ray_aabb([1e-4, 1e-4, -5], _norm([0, 0, 1]), [0, 0, 0], 4.0)
    assert hit and dist == pytest.approx(5.0, abs=1e-4)


def test_cube_impact_normal_faces():
    n = cube_impact_normal([0, 0, 0], 4.0, [2.0, 2.0, 0.0])
    np.testing.assert_allclose(n, [0, 0, -1])
    n = cube_impact_normal([0, 0, 0], 4.0, [4.0, 2.0, 2.0])
    np.testing.assert_allclose(n, [1, 0, 0])
    n = cube_impact_normal([0, 0, 0], 4.0, [2.0, 0.0, 2.0])
    np.testing.assert_allclose(n, [0, -1, 0])


def test_dda_walks_a_row_of_cells():
    direction = _norm([1.0, 0.001, 0.001])
    sf = dda_scale_factors(direction)
    p = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    cell_min = np.array([0.0, 0.0, 0.0], dtype=np.float32)
    visited = [0]
    for _ in range(3):
        p, step = dda_step_to_next_sibling(direction, p, cell_min, 1.0, sf)
        assert step[0] == 1.0 and step[1] == 0.0 and step[2] == 0.0
        cell_min = cell_min + step * 1.0
        visited.append(int(cell_min[0]))
    assert visited == [0, 1, 2, 3]


def test_dda_diagonal_hits_each_axis():
    direction = _norm([1.0, 1.0, 1.0])
    sf = dda_scale_factors(direction)
    p = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    _, step = dda_step_to_next_sibling(direction, p, [0, 0, 0], 1.0, sf)
    # perfectly diagonal: all three axes step together
    np.testing.assert_allclose(step, [1, 1, 1])


def test_set_occupied_bits_dims():
    # dim 1: whole map toggles
    assert set_occupied_bits([0, 0, 0], 1, 1, True, 0) == (1 << 64) - 1
    assert set_occupied_bits([0, 0, 0], 1, 1, False, (1 << 64) - 1) == 0
    # dim 4: one voxel -> one bit
    assert set_occupied_bits([1, 0, 0], 1, 4, True, 0) == 1 << 1
    assert set_occupied_bits([0, 1, 0], 1, 4, True, 0) == 1 << 4
    assert set_occupied_bits([0, 0, 1], 1, 4, True, 0) == 1 << 16
    # dim 2: one voxel covers a 2x2x2 block of bits
    bits = set_occupied_bits([0, 0, 0], 1, 2, True, 0)
    assert bin(bits).count("1") == 8
    assert bits & 1
    # dim 8: voxel (7,7,7) -> last bit
    assert set_occupied_bits([7, 7, 7], 1, 8, True, 0) == 1 << 63


def test_brick_occupied_bits_matches_incremental():
    rng = np.random.default_rng(42)
    for d in (1, 2, 4, 8):
        mask = rng.random(d**3) < 0.3
        expect = 0
        for z in range(d):
            for y in range(d):
                for x in range(d):
                    if mask[flat_projection(x, y, z, d)]:
                        expect = set_occupied_bits([x, y, z], 1, d, True, expect)
        got = brick_occupied_bits(mask)
        assert got == expect, f"dim {d}"


# ---------------------------------------------------------------------------
# coordinate-system conversion (reference: src/spatial/math/mod.rs:157-194)
# ---------------------------------------------------------------------------


def test_convert_coordinate_identity_and_vox_convention():
    from voxelhex_tpu.spatial.math import convert_coordinate

    v = np.array([1, 2, 3])
    for sysname in ("Lzup", "Lyup", "Rzup", "Ryup"):
        np.testing.assert_array_equal(convert_coordinate(v, sysname, sysname), v)
    # MagicaVoxel (Rzup) -> tree (Lyup): the importer's y/z swap
    np.testing.assert_array_equal(convert_coordinate(v, "Rzup", "Lyup"), [1, 3, 2])


def test_convert_coordinate_round_trips():
    from voxelhex_tpu.spatial.math import convert_coordinate

    rng = np.random.default_rng(3)
    v = rng.integers(-50, 50, (20, 3))
    # pairs whose two directions are exact inverses in the reference table
    for a, b in [
        ("Lyup", "Ryup"), ("Lzup", "Rzup"),
        ("Lyup", "Lzup"), ("Ryup", "Rzup"),
        ("Rzup", "Lyup"), ("Lzup", "Ryup"),
    ]:
        back = convert_coordinate(convert_coordinate(v, a, b), b, a)
        np.testing.assert_array_equal(back, v)


def test_convert_coordinate_hand_flip_negates_one_axis():
    from voxelhex_tpu.spatial.math import convert_coordinate

    v = np.array([4.0, 5.0, 6.0])
    np.testing.assert_array_equal(convert_coordinate(v, "Lyup", "Ryup"), [4, 5, -6])
    np.testing.assert_array_equal(convert_coordinate(v, "Rzup", "Lzup"), [4, -5, 6])
    np.testing.assert_array_equal(convert_coordinate(v, "Ryup", "Rzup"), [4, -6, 5])
    np.testing.assert_array_equal(convert_coordinate(v, "Rzup", "Ryup"), [4, 6, -5])


def test_convert_coordinate_rejects_unknown_system():
    from voxelhex_tpu.spatial.math import convert_coordinate

    with pytest.raises(ValueError):
        convert_coordinate([1, 2, 3], "Rzup", "Qzup")


def test_convert_coordinate_reference_spot_values():
    """The reference's own expectations (src/spatial/math/tests.rs
    test_coordinate_conversion)."""
    from voxelhex_tpu.spatial.math import convert_coordinate

    v = [1.0, 2.0, 3.0]
    np.testing.assert_array_equal(convert_coordinate(v, "Rzup", "Rzup"), [1, 2, 3])
    np.testing.assert_array_equal(convert_coordinate(v, "Lzup", "Ryup"), [1, 3, 2])
    np.testing.assert_array_equal(convert_coordinate(v, "Rzup", "Ryup"), [1, 3, -2])
    np.testing.assert_array_equal(convert_coordinate(v, "Lyup", "Ryup"), [1, 2, -3])


def test_occupancy_bitmap_sized_set_reference_values():
    """Sized-region occupancy updates (reference: src/spatial/math/tests.rs
    test_occupancy_bitmap_sized_set_*)."""
    assert set_occupied_bits([0, 0, 0], 3, 4, True, 0) == 0x77707770777
    assert set_occupied_bits([0, 0, 0], 2, 2, True, 0) == (1 << 64) - 1
    # size overflowing the brick saturates to a full map
    assert set_occupied_bits([0, 0, 0], 5, 4, True, 0) == (1 << 64) - 1
    assert set_occupied_bits([0, 0, 0], 3, 2, True, 0) == (1 << 64) - 1


def test_occupancy_bitmap_position_overflow_is_noop():
    """Out-of-brick positions touch no bits.  The reference debug_asserts on
    partially-overflowing coordinates (tests.rs *_pos_overflow expect a
    panic) and no-ops on fully-overflowing ones; we uniformly clip — the
    release-mode behavior — and freeze that here."""
    assert set_occupied_bits([5, 5, 5], 1, 4, True, 0) == 0
    assert set_occupied_bits([3, 1, 9], 1, 4, True, 0) == 0
    assert set_occupied_bits([4, 4, 4], 1, 2, True, 0) == 0


def test_plane_line_negative_intersection():
    """A plane behind the line origin yields a NEGATIVE distance (reference:
    src/spatial/math/tests.rs test_negative_intersection)."""
    from voxelhex_tpu.spatial.math import plane_line_intersection

    d = plane_line_intersection([0, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0])
    assert d == -1.0
    # parallel off-plane: no intersection; parallel on-plane: distance 0
    assert plane_line_intersection([0, 0, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0]) is None
    assert plane_line_intersection([0, 0, 0], [0, 1, 0], [0, 0, 0], [1, 0, 0]) == 0.0


def test_edge_case_cube_top_hit():
    """Frozen grazing ray entering through a cube's top face (reference:
    src/spatial/math/tests.rs test_edge_case_cube_top_hit)."""
    o = np.array([8.965594, 10.0, -4.4292345], dtype=np.float32)
    d = np.array([-0.5082971, -0.72216684, 0.46915793], dtype=np.float32)
    hit, dist = intersect_ray_aabb(o, d, [2.0, 0.0, 0.0], 2.0)
    assert hit and dist is not None
    assert abs(dist - 11.077772) < 1e-3
    assert abs((o + d * dist)[1] - 2.0) < 1e-3


def test_brick_slot_and_cube_sides():
    """brick_slot_for returns the brick-aligned cube containing a position
    (reference: src/spatial/raytracing/mod.rs:65-70); CubeSides matches the
    reference face numbering (src/spatial/mod.rs:29-36)."""
    from voxelhex_tpu.spatial.math import CubeSides, brick_slot_for, cube_contains

    smin, ssize = brick_slot_for([33.5, 7.9, 64.0], 32)
    assert ssize == 32.0
    np.testing.assert_allclose(smin, [32.0, 0.0, 64.0])
    assert cube_contains(smin, ssize, [33.5, 7.9, 64.0])
    assert (CubeSides.BACK, CubeSides.FRONT, CubeSides.TOP, CubeSides.BOTTOM,
            CubeSides.LEFT, CubeSides.RIGHT) == (0, 1, 2, 3, 4, 5)


def test_viewport_origin_delta_and_matrices():
    """Viewport accumulates origin_delta over moves, detects leaving its
    brick slot, and produces consistent view/projection/inverse matrices
    (reference: types.rs:61-88, view.rs:211-256)."""
    from voxelhex_tpu.render.camera import Camera, Viewport

    cam = Camera(origin=np.array([10.0, 10.0, 10.0]),
                 target=np.array([40.0, 10.0, 40.0]))
    vp = Viewport(cam)
    vp.move_viewport([3.0, 0.0, 0.0])
    assert not vp.left_brick_slot(32)
    vp.move_viewport([25.0, 0.0, 0.0])
    assert vp.left_brick_slot(32)
    np.testing.assert_allclose(vp.take_origin_delta(), [28.0, 0.0, 0.0])
    np.testing.assert_allclose(vp.origin_delta, 0.0)

    view, proj, inv_vp = vp.update_matrices()
    # a world point projects and un-projects consistently
    p = np.array([40.0, 10.0, 40.0, 1.0], dtype=np.float32)
    clip = proj @ (view @ p)
    ndc = clip / clip[3]
    back = inv_vp @ ndc
    back = back / back[3]
    np.testing.assert_allclose(back[:3], p[:3], atol=1e-3)
