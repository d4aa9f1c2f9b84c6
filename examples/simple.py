"""CPU API walkthrough — the reference's examples/simple.rs as Python.

Demonstrates: tree creation, insert/update/get/clear, LOD bulk ops, custom
user data alongside colors, simplification, save/load, and a single CPU
raycast through the oracle renderer.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from voxelhex_tpu.io import checkpoint
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree, Entry
from voxelhex_tpu.tree.flat import flatten


def main():
    # a 64^3 tree with 4^3 voxel bricks
    tree = BoxTree(size=64, brick_dim=4)

    red = Albedo.from_u32(0xFF0000FF)
    green = Albedo.from_u32(0x00FF00FF)
    blue = Albedo.from_u32(0x0000FFFF)

    # single-voxel inserts: color only, data only, both
    tree.insert((0, 0, 0), red)
    tree.insert((1, 0, 0), Entry(data=42))
    tree.insert((2, 0, 0), Entry(albedo=green, data=7))

    e = tree.get((2, 0, 0))
    print(f"voxel (2,0,0): albedo={e.albedo}, data={e.data}")

    # update merges: change only the color, keep data
    tree.update((2, 0, 0), Entry(albedo=blue))
    e = tree.get((2, 0, 0))
    print(f"after update:  albedo={e.albedo}, data={e.data}")

    # bulk fill a 16^3 region in one call, then clear a corner of it
    tree.insert_at_lod((16, 16, 16), 16, red)
    tree.clear_at_lod((16, 16, 16), 4)
    print(f"(16,16,16) cleared: {tree.get((16, 16, 16)).is_none}, "
          f"(24,24,24) still red: {tree.get((24, 24, 24)).albedo == red}")

    # clear a single voxel
    tree.clear((0, 0, 0))
    print(f"(0,0,0) after clear: empty={tree.get((0, 0, 0)).is_none}")

    # simplification collapses homogeneous regions
    before = tree.node_count
    tree.simplify(tree.ROOT, recursive=True)
    print(f"nodes: {before} -> {tree.node_count} after simplify")

    # save / load round-trip (versioned checkpoint)
    checkpoint.save_tree("/tmp/simple_scene.vhx", tree)
    loaded = checkpoint.load_tree("/tmp/simple_scene.vhx")
    assert loaded.get((24, 24, 24)).albedo == red
    print(f"checkpoint round-trip ok (version {checkpoint.peek_version('/tmp/simple_scene.vhx')})")

    # one CPU raycast via the oracle renderer
    flat = flatten(tree)
    hit = get_by_ray(flat, origin=[24.5, 24.5, -10.0],
                     direction=np.array([0, 0, 1.0], dtype=np.float32))
    print(f"raycast hit: point={hit.point}, albedo={hit.albedo(flat)}")


if __name__ == "__main__":
    main()
