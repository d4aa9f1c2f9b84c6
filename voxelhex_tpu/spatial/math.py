"""Scalar / small-array spatial math (NumPy).

Semantics follow the reference renderer's spatial layer (reference:
src/spatial/math/mod.rs, src/spatial/mod.rs, src/spatial/raytracing/mod.rs)
but are derived from first principles: a node is a cube split into a 4x4x4
grid of "sectants" indexed ``x + 4*y + 16*z``; rays traverse cells with a
classic slab test + DDA.

All functions in this module are purposely *unvectorized* — they are the
reference oracle that defines correct behavior; hot paths re-implement the
same math in vectorized JAX/Pallas form.
"""

from __future__ import annotations

import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, BOX_NODE_DIMENSION

# Sentinel sectant index meaning "stepped out of the node" — any value >= 64
# signals out-of-bounds to the traversal automaton.
OOB_SECTANT = BOX_NODE_CHILDREN_COUNT


def flat_projection(x: int, y: int, z: int, size: int) -> int:
    """Map a 3-D cell coordinate inside a ``size``-cube to a flat index.

    Convention: x varies fastest (``x + y*size + z*size**2``), matching the
    brick memory layout used across the project (reference:
    src/spatial/math/mod.rs:19-21).
    """
    return x + y * size + z * size * size


def offset_sectant(offset, size) -> int:
    """Sectant index (0..63) of a point ``offset`` inside a cube of ``size``.

    Positions on the upper cube boundary map to the last cell along that axis
    so that rays resting on a face still get a valid sectant (reference:
    src/spatial/math/mod.rs:27-44).
    """
    offset = np.asarray(offset, dtype=np.float32)
    idx = np.floor(offset * BOX_NODE_DIMENSION / np.float32(size))
    idx = np.minimum(idx, BOX_NODE_DIMENSION - 1)
    idx = np.maximum(idx, 0)
    return int(idx[0] + idx[1] * 4 + idx[2] * 16)


def sectant_offset(sectant: int) -> np.ndarray:
    """Relative (0..1) min-corner offset of ``sectant`` within its node.

    Arithmetic replacement for the reference's SECTANT_OFFSET_LUT
    (reference: src/spatial/lut.rs:4-24): cheaper than a gather on TPU.
    """
    return np.array(
        [(sectant % 4) * 0.25, ((sectant // 4) % 4) * 0.25, (sectant // 16) * 0.25],
        dtype=np.float32,
    )


def step_sectant(sectant: int, step) -> int:
    """Sectant reached from ``sectant`` when stepping ``sign(step)`` in xyz.

    Returns ``OOB_SECTANT`` (64) when the step leaves the 4x4x4 grid.
    Arithmetic replacement for SECTANT_STEP_RESULT_LUT (reference:
    src/spatial/lut.rs:27-92, src/spatial/mod.rs:23-26); callers only test
    ``>= 64`` for out-of-bounds.
    """
    step = np.asarray(step)
    x = sectant % 4 + int(np.sign(int(step[0])))
    y = (sectant // 4) % 4 + int(np.sign(int(step[1])))
    z = sectant // 16 + int(np.sign(int(step[2])))
    if 0 <= x < 4 and 0 <= y < 4 and 0 <= z < 4:
        return x + y * 4 + z * 16
    return OOB_SECTANT


def hash_direction(direction) -> int:
    """Octant (0..7) a direction vector points into.

    Used to index the per-octant ray/occupancy masks (reference:
    src/spatial/math/mod.rs:48-52).  Zero components count as positive.
    """
    d = np.asarray(direction, dtype=np.float32)
    return int((d[0] >= 0) + (d[2] >= 0) * 2 + (d[1] >= 0) * 4)


def octant_in_sectant(sectant: int) -> int:
    """Which 2x2x2 octant of the node a sectant belongs to (reference:
    src/spatial/math/mod.rs:56-59)."""
    x = (sectant % 4) >= 2
    y = ((sectant // 4) % 4) >= 2
    z = (sectant // 16) >= 2
    return int(x) + int(z) * 2 + int(y) * 4


class CubeSides:
    """Face indices for the 6-bit per-node occlusion field (reference:
    src/spatial/mod.rs:29-36 ``CubeSides``)."""

    BACK = 0
    FRONT = 1
    TOP = 2
    BOTTOM = 3
    LEFT = 4
    RIGHT = 5


def brick_slot_for(position, brick_dim: int):
    """(min_position, size) of the brick-aligned cube containing ``position``
    (reference: src/spatial/raytracing/mod.rs:65-70 ``Cube::brick_slot_for``;
    the streaming layer re-pages when the viewport origin leaves this cube)."""
    p = np.asarray(position, dtype=np.float64)
    return p - np.abs(np.mod(p, float(brick_dim))), float(brick_dim)


def cube_contains(min_position, size, position) -> bool:
    """Half-open containment test of ``position`` in the cube (reference:
    src/spatial/mod.rs:54-61)."""
    p = np.asarray(position, dtype=np.float32)
    m = np.asarray(min_position, dtype=np.float32)
    return bool(np.all(p >= m) and np.all(p < m + np.float32(size)))


def child_bounds_for(min_position, size, sectant: int):
    """Bounds (min, size) of a child sectant cell (reference:
    src/spatial/mod.rs:72-77)."""
    m = np.asarray(min_position, dtype=np.float32)
    return (
        m + sectant_offset(sectant) * np.float32(size),
        np.float32(size) / BOX_NODE_DIMENSION,
    )


def matrix_index_for(bounds_min, bounds_size, position, matrix_dimension: int):
    """Index into a ``matrix_dimension``^3 brick spanning the given bounds for
    an integer voxel position (reference: src/spatial/math/mod.rs:64-96)."""
    p = np.asarray(position, dtype=np.float32)
    m = np.asarray(bounds_min, dtype=np.float32)
    idx = np.floor((p - m) * matrix_dimension / np.float32(bounds_size)).astype(np.int64)
    return idx


def set_occupied_bits(position, size: int, brick_dim: int, occupied: bool, bitmap: int) -> int:
    """Set/clear occupancy bits covering a ``size``-cube at ``position`` inside
    a ``brick_dim``^3 brick; the 64-bit map is the brick downsampled to 4x4x4
    (reference: src/spatial/math/mod.rs:104-155).

    Returns the updated bitmap (Python int used as u64).
    """
    if brick_dim == 1:
        return (1 << 64) - 1 if occupied else 0

    update_count = int(np.ceil(size * BOX_NODE_DIMENSION / brick_dim))
    px, py, pz = (int(c) * BOX_NODE_DIMENSION // brick_dim for c in position)
    for x in range(px, min(px + update_count, BOX_NODE_DIMENSION)):
        for y in range(py, min(py + update_count, BOX_NODE_DIMENSION)):
            for z in range(pz, min(pz + update_count, BOX_NODE_DIMENSION)):
                mask = 1 << (x + y * 4 + z * 16)
                if occupied:
                    bitmap |= mask
                else:
                    bitmap &= ~mask
    return bitmap & ((1 << 64) - 1)


def brick_occupied_bits(occupied_mask: np.ndarray) -> int:
    """64-bit occupancy of a brick from a boolean per-voxel mask.

    ``occupied_mask`` is a flat (d^3,) or (d,d,d) boolean array in
    ``flat_projection`` order.  Vectorized equivalent of looping
    ``set_occupied_bits`` over every occupied voxel (reference:
    src/boxtree/node.rs:36-66).
    """
    mask = np.asarray(occupied_mask)
    d = round(mask.size ** (1.0 / 3.0))
    assert d * d * d == mask.size, "brick mask must be a cube"
    # flat_projection order is x-fastest => reshape to (z, y, x)
    mask = mask.reshape(d, d, d)
    if d == 1:
        return (1 << 64) - 1 if bool(mask.ravel()[0]) else 0
    if d >= BOX_NODE_DIMENSION:
        f = d // BOX_NODE_DIMENSION
        coarse = (
            mask.reshape(BOX_NODE_DIMENSION, f, BOX_NODE_DIMENSION, f, BOX_NODE_DIMENSION, f)
            .any(axis=(1, 3, 5))
        )
    else:  # d == 2: each voxel covers 2x2x2 bits
        r = BOX_NODE_DIMENSION // d
        coarse = np.repeat(np.repeat(np.repeat(mask, r, 0), r, 1), r, 2)
    bits = 0
    for z in range(BOX_NODE_DIMENSION):
        for y in range(BOX_NODE_DIMENSION):
            for x in range(BOX_NODE_DIMENSION):
                if coarse[z, y, x]:
                    bits |= 1 << (x + y * 4 + z * 16)
    return bits


def brick_occupied_bits_many(occupied_mask: np.ndarray) -> np.ndarray:
    """Batched ``brick_occupied_bits``: (B, d^3) boolean masks -> (B,) uint64
    occupancy words, with no per-brick Python loop."""
    mask = np.asarray(occupied_mask, dtype=bool)
    b, v = mask.shape
    d = round(v ** (1.0 / 3.0))
    assert d * d * d == v, "brick mask must be a cube"
    if b == 0:
        return np.zeros(0, dtype=np.uint64)
    grid = mask.reshape(b, d, d, d)  # flat_projection order: [b, z, y, x]
    if d == 1:
        return np.where(grid.reshape(b), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    if d >= BOX_NODE_DIMENSION:
        f = d // BOX_NODE_DIMENSION
        coarse = grid.reshape(
            b, BOX_NODE_DIMENSION, f, BOX_NODE_DIMENSION, f, BOX_NODE_DIMENSION, f
        ).any(axis=(2, 4, 6))
    else:  # d == 2: each voxel covers 2x2x2 bits
        r = BOX_NODE_DIMENSION // d
        coarse = np.repeat(np.repeat(np.repeat(grid, r, 1), r, 2), r, 3)
    # bit index = x + 4y + 16z; coarse axes are [b, z, y, x]
    weights = (
        np.uint64(1)
        << (
            np.arange(4, dtype=np.uint64)[:, None, None] * np.uint64(16)
            + np.arange(4, dtype=np.uint64)[None, :, None] * np.uint64(4)
            + np.arange(4, dtype=np.uint64)[None, None, :]
        )
    ).reshape(64)
    return (coarse.reshape(b, 64).astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )


# ---------------------------------------------------------------------------
# Ray math
# ---------------------------------------------------------------------------


def intersect_ray_aabb(origin, direction, box_min, box_size):
    """Slab-method ray/cube intersection (reference:
    src/spatial/raytracing/mod.rs:33-62).

    Returns ``(hit, impact_distance)``; ``impact_distance`` is ``None`` when
    the ray origin is inside the cube.
    """
    o = np.asarray(origin, dtype=np.float32)
    d = np.asarray(direction, dtype=np.float32)
    m = np.asarray(box_min, dtype=np.float32)
    mx = m + np.float32(box_size)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_lo = (m - o) / d
        t_hi = (mx - o) / d
    # fmin/fmax ignore the NaNs produced by 0/0 on axis-parallel rays that
    # touch a slab exactly (matches Rust f32::min/max semantics).
    per_axis_min = np.fmin(t_lo, t_hi)
    per_axis_max = np.fmax(t_lo, t_hi)
    tmin = float(np.fmax(np.fmax(per_axis_min[0], per_axis_min[1]), per_axis_min[2]))
    tmax = float(np.fmin(np.fmin(per_axis_max[0], per_axis_max[1]), per_axis_max[2]))
    if tmax < 0.0 or tmin > tmax:
        return False, None
    if tmin < 0.0:
        return True, None  # origin inside the cube
    return True, tmin


def cube_impact_normal(cube_min, cube_size, impact_point) -> np.ndarray:
    """Face normal at an impact point: the dominant axis of the vector from
    the cube center to the impact (reference:
    src/spatial/raytracing/mod.rs:97-125)."""
    m = np.asarray(cube_min, dtype=np.float32)
    p = np.asarray(impact_point, dtype=np.float32)
    mid_to_impact = m + np.float32(cube_size) / 2.0 - p
    a = np.abs(mid_to_impact)
    max_c = float(np.max(a))
    normal = np.where(a == max_c, -mid_to_impact, 0.0).astype(np.float32)
    n = float(np.linalg.norm(normal))
    return normal / n if n > 0 else normal


def dda_scale_factors(direction) -> np.ndarray:
    """Per-axis ray length scale for stepping one unit along that axis
    (reference: src/raytracing/cpu.rs:79-92)."""
    d = np.asarray(direction, dtype=np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        fx = np.sqrt(1.0 + (d[2] / d[0]) ** 2 + (d[1] / d[0]) ** 2)
        fy = np.sqrt((d[0] / d[1]) ** 2 + 1.0 + (d[2] / d[1]) ** 2)
        fz = np.sqrt((d[0] / d[2]) ** 2 + 1.0 + (d[1] / d[2]) ** 2)
    return np.array([fx, fy, fz], dtype=np.float32)


def dda_step_to_next_sibling(direction, ray_point, cell_min, cell_size, scale_factors):
    """Advance ``ray_point`` to the boundary of the current cell and report the
    step direction taken (reference: src/raytracing/cpu.rs:104-132).

    Returns ``(new_ray_point, step_vector)`` where ``step_vector`` has one
    nonzero component (+-1) per axis that reached its boundary first.
    """
    d = np.asarray(direction, dtype=np.float32)
    p = np.asarray(ray_point, dtype=np.float32)
    m = np.asarray(cell_min, dtype=np.float32)
    signum = np.sign(d).astype(np.float32)
    diff_from_min = p - m
    steps_needed = np.float32(cell_size) * np.maximum(signum, 0.0) - signum * diff_from_min
    # 0 * inf = NaN on axis-parallel rays; Rust min ignores NaNs — match it.
    with np.errstate(invalid="ignore"):
        dists = np.abs(steps_needed * np.asarray(scale_factors, dtype=np.float32))
    min_step = float(np.nanmin(dists))
    new_p = p + d * np.float32(min_step)
    step = np.where(dists == min_step, signum, 0.0).astype(np.float32)
    return new_p, step


# Coordinate-system conversion between the handedness/up conventions that the
# .vox importer deals in (reference: convert_coordinate,
# src/spatial/math/mod.rs:157-194).  Systems are named by handedness (L/R) and
# up axis (yup/zup).  The mapping table mirrors the reference exactly,
# including its quirk that every cross hand-and-up conversion shares the
# single swap formula (x, z, y).
LZUP, LYUP, RZUP, RYUP = "Lzup", "Lyup", "Rzup", "Ryup"
_COORD_SYSTEMS = (LZUP, LYUP, RZUP, RYUP)


def convert_coordinate(c, src: str, dst: str):
    """Convert 3-vector(s) ``c`` (shape ``[..., 3]``) from coordinate system
    ``src`` to ``dst``.  MagicaVoxel is Rzup; the tree is Lyup."""
    if src not in _COORD_SYSTEMS or dst not in _COORD_SYSTEMS:
        raise ValueError(f"unknown coordinate system in {src!r} -> {dst!r}")
    c = np.asarray(c)
    x, y, z = c[..., 0], c[..., 1], c[..., 2]
    if src == dst:
        out = (x, y, z)
    elif {src, dst} == {LYUP, RYUP}:
        out = (x, y, -z)
    elif {src, dst} == {LZUP, RZUP}:
        out = (x, -y, z)
    elif (src, dst) in ((LYUP, LZUP), (RYUP, RZUP)):
        out = (x, -z, y)
    elif (src, dst) in ((LZUP, LYUP), (RZUP, RYUP)):
        out = (x, z, -y)
    else:  # hand and up axis both differ
        out = (x, z, y)
    return np.stack(np.broadcast_arrays(*out), axis=-1)


def plane_line_intersection(plane_point, plane_normal, line_origin, line_direction):
    """Signed distance along the line to a plane, or None when parallel and
    off-plane; 0.0 when the origin already lies on the plane (reference:
    plane_line_intersection, src/spatial/raytracing/mod.rs:77-95).

    The distance may be negative (intersection behind the origin)."""
    pp = np.asarray(plane_point, dtype=np.float32)
    pn = np.asarray(plane_normal, dtype=np.float32)
    lo = np.asarray(line_origin, dtype=np.float32)
    ld = np.asarray(line_direction, dtype=np.float32)
    diff_dot = float(np.dot(pp - lo, pn))
    dir_dot = float(np.dot(ld, pn))
    if dir_dot == 0.0:
        return 0.0 if diff_dot == 0.0 else None
    return diff_dot / dir_dot
