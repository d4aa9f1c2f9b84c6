"""Spatial math for the boxtree: sectant indexing, occupancy bitmaps,
ray/AABB intersection and DDA stepping.

Everything here is plain NumPy and operates on small scalars/arrays; it is the
host-side "ground truth" math layer.  The device (JAX/Pallas) render path
re-expresses the same functions in vectorized form in
:mod:`voxelhex_tpu.render.jax_renderer` and :mod:`voxelhex_tpu.ops`.
"""

from voxelhex_tpu.spatial.math import (
    OOB_SECTANT,
    child_bounds_for,
    cube_contains,
    cube_impact_normal,
    dda_scale_factors,
    dda_step_to_next_sibling,
    flat_projection,
    hash_direction,
    intersect_ray_aabb,
    matrix_index_for,
    octant_in_sectant,
    offset_sectant,
    sectant_offset,
    set_occupied_bits,
    step_sectant,
)
from voxelhex_tpu.spatial.luts import (
    RAY_TO_NODE_OCCUPANCY_BITMASK_LUT,
    SECTANT_OFFSET_LUT,
    SECTANT_STEP_RESULT_LUT,
    ray_occupancy_masks_u32,
)

__all__ = [
    "OOB_SECTANT",
    "RAY_TO_NODE_OCCUPANCY_BITMASK_LUT",
    "SECTANT_OFFSET_LUT",
    "SECTANT_STEP_RESULT_LUT",
    "child_bounds_for",
    "cube_contains",
    "cube_impact_normal",
    "dda_scale_factors",
    "dda_step_to_next_sibling",
    "flat_projection",
    "hash_direction",
    "intersect_ray_aabb",
    "matrix_index_for",
    "octant_in_sectant",
    "offset_sectant",
    "ray_occupancy_masks_u32",
    "sectant_offset",
    "set_occupied_bits",
    "step_sectant",
]
