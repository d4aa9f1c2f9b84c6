"""Derived lookup tables.

The reference ships three hand-generated constant LUTs (reference:
src/spatial/lut.rs, generators in src/bin/*.rs).  Here every table is
*computed* from the sectant-grid definition at import time; the generation
code doubles as documentation of the table semantics.  On the TPU device path
most of these lookups are replaced with pure arithmetic (cheaper than
gathers); the tables remain for the host oracle and for tests.
"""

from __future__ import annotations

import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, BOX_NODE_DIMENSION
from voxelhex_tpu.spatial.math import OOB_SECTANT


def _gen_sectant_offset_lut() -> np.ndarray:
    """[64, 3] relative min-corner offsets (0, .25, .5, .75) per sectant."""
    s = np.arange(BOX_NODE_CHILDREN_COUNT)
    return np.stack(
        [(s % 4) * 0.25, ((s // 4) % 4) * 0.25, (s // 16) * 0.25], axis=-1
    ).astype(np.float32)


def _gen_sectant_step_result_lut() -> np.ndarray:
    """[64, 3, 3, 3] sectant reached by stepping (dx,dy,dz) in {-1,0,1}^3.

    Out-of-grid steps yield OOB_SECTANT (the reference encodes which face was
    exited in values 64..127; only ``>= 64`` is ever tested, so a single
    sentinel suffices).
    """
    lut = np.zeros((BOX_NODE_CHILDREN_COUNT, 3, 3, 3), dtype=np.int32)
    for s in range(BOX_NODE_CHILDREN_COUNT):
        x, y, z = s % 4, (s // 4) % 4, s // 16
        for ix, dx in enumerate((-1, 0, 1)):
            for iy, dy in enumerate((-1, 0, 1)):
                for iz, dz in enumerate((-1, 0, 1)):
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if 0 <= nx < 4 and 0 <= ny < 4 and 0 <= nz < 4:
                        lut[s, ix, iy, iz] = nx + ny * 4 + nz * 16
                    else:
                        lut[s, ix, iy, iz] = OOB_SECTANT
    return lut


def _gen_ray_occupancy_masks() -> np.ndarray:
    """[64, 8] uint64: for (entry sectant, ray-direction octant) the mask of
    sectants the ray could possibly reach.

    A ray entering at sectant cell (sx,sy,sz) travelling with direction signs
    (dx,dy,dz) can only visit cells with coordinates on the directed side of
    the entry cell along each axis (reference: src/spatial/lut.rs:96-161 and
    its generator).
    """
    masks = np.zeros((BOX_NODE_CHILDREN_COUNT, 8), dtype=np.uint64)
    for s in range(BOX_NODE_CHILDREN_COUNT):
        sx, sy, sz = s % 4, (s // 4) % 4, s // 16
        for octant in range(8):
            # octant bit layout matches hash_direction: x + z*2 + y*4
            xp = bool(octant & 1)
            zp = bool((octant >> 1) & 1)
            yp = bool((octant >> 2) & 1)
            m = 0
            for z in range(BOX_NODE_DIMENSION):
                for y in range(BOX_NODE_DIMENSION):
                    for x in range(BOX_NODE_DIMENSION):
                        ok = (
                            (x >= sx if xp else x <= sx)
                            and (y >= sy if yp else y <= sy)
                            and (z >= sz if zp else z <= sz)
                        )
                        if ok:
                            m |= 1 << (x + y * 4 + z * 16)
            masks[s, octant] = np.uint64(m)
    return masks


SECTANT_OFFSET_LUT = _gen_sectant_offset_lut()
SECTANT_STEP_RESULT_LUT = _gen_sectant_step_result_lut()
RAY_TO_NODE_OCCUPANCY_BITMASK_LUT = _gen_ray_occupancy_masks()


def ray_occupancy_masks_u32() -> tuple[np.ndarray, np.ndarray]:
    """The occupancy masks split into (low, high) uint32 words for the device
    path (JAX runs in 32-bit mode by default)."""
    lo = (RAY_TO_NODE_OCCUPANCY_BITMASK_LUT & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (RAY_TO_NODE_OCCUPANCY_BITMASK_LUT >> np.uint64(32)).astype(np.uint32)
    return lo, hi
