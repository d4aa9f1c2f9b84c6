"""voxelhex_tpu — a TPU-native differentiable sparse-voxel renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
VoxelHex sparse voxel-brick 64-tree raytracer (Rust/WGPU), redesigned for
TPU hardware:

* the boxtree lives as flat SoA device arrays (node metadata, children
  descriptors, 64-bit occupancy bitmaps as u32 pairs, a brick pool and a
  color palette) — :mod:`voxelhex_tpu.tree`;
* scene editing (insert / clear / simplify / MIP resampling) is a host-side
  builder with batched device uploads — :mod:`voxelhex_tpu.tree.boxtree`;
* the octree-DDA ray-march runs as jitted JAX (and a Pallas kernel) with a
  per-ray register stack — :mod:`voxelhex_tpu.render` and
  :mod:`voxelhex_tpu.ops`;
* pixel gradients flow back into voxel albedo — :mod:`voxelhex_tpu.diff`;
* rays shard across device meshes with ``shard_map`` —
  :mod:`voxelhex_tpu.parallel`.
"""

__version__ = "0.1.0"

from voxelhex_tpu.constants import (
    BOX_NODE_CHILDREN_COUNT,
    BOX_NODE_DIMENSION,
    EMPTY_U16,
    EMPTY_U32,
    EMPTY_VOXEL,
)

__all__ = [
    "BOX_NODE_CHILDREN_COUNT",
    "BOX_NODE_DIMENSION",
    "EMPTY_U16",
    "EMPTY_U32",
    "EMPTY_VOXEL",
    "__version__",
]
