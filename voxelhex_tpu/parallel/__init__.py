"""Multi-device execution: ray tiles sharded over a device mesh.

The reference is single-GPU; the TPU-native scaling model (north star) is:
shard rays/pixels across chips with ``shard_map`` over a ``Mesh``, replicate
the node/brick pools, and all-reduce albedo gradients with ``psum`` riding
the ICI.
"""

from voxelhex_tpu.parallel.render import (
    make_ray_mesh,
    sharded_render_fn,
    sharded_train_step,
)

__all__ = ["make_ray_mesh", "sharded_render_fn", "sharded_train_step"]
