"""Global constants of the sparse voxel-brick 64-tree ("boxtree").

A boxtree node subdivides space into 4x4x4 = 64 children ("sectants"); leaf
nodes hold NxNxN voxel bricks.  Mirrors the fundamental constants of the
reference implementation (reference: src/boxtree/mod.rs:123-124,
src/spatial/math/mod.rs:10) without copying any code: these are the defining
parameters of the data structure.
"""

# Number of child cells along one edge of a node.
BOX_NODE_DIMENSION = 4

# Total child cells of a node (4**3).
BOX_NODE_CHILDREN_COUNT = 64

# Epsilon used by traversal to nudge points off cell boundaries
# (reference: src/spatial/math/mod.rs:10).
VOXEL_EPSILON = 1e-5

# Sentinel palette index meaning "no entry" for a 16-bit palette slot
# (reference: src/object_pool.rs:6-8 `empty_marker` = T::max_value()).
EMPTY_U16 = 0xFFFF

# Sentinel for a packed 32-bit palette value / node key meaning "empty".
EMPTY_U32 = 0xFFFFFFFF

# Packed voxel value for "completely empty": no color, no data.
EMPTY_VOXEL = EMPTY_U32

# Maximum number of colors in the palette; 16-bit indices with the max value
# reserved as the empty sentinel (reference: src/boxtree/types.rs:235-238).
MAX_PALETTE_SIZE = 0xFFFF
