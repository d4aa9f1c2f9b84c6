"""The boxtree data model.

* :mod:`voxelhex_tpu.tree.boxtree` — host-side sparse voxel-brick 64-tree
  builder (insert / clear / simplify / query), the authoritative scene
  representation.
* :mod:`voxelhex_tpu.tree.flat` — conversion to flat SoA arrays consumed by
  the device render path.
"""

from voxelhex_tpu.tree.boxtree import Albedo, BoxTree, Entry

__all__ = ["Albedo", "BoxTree", "Entry"]
