"""CPU oracle raytrace benchmark — the reference's criterion workload
(reference: benches/performance.rs:29-66): 128x128 rays into a 512^3 tree
(brick_dim 8, ~quarter-filled procedural scene).

The oracle is the correctness reference, not a performance path (the device
renderers are); this bench exists for workload parity and to track the
oracle's own speed.

Usage: python benches/cpu_raytrace.py [--size 512] [--rays 128]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.build import from_voxels
from voxelhex_tpu.tree.flat import flatten


def build_quarter_filled(size: int, brick_dim: int = 8):
    """~quarter-filled box, mirroring the reference bench scene."""
    n = size // 2  # fill half extent in x/y -> quarter volume slab-ish
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    pts = []
    cols = []
    for z in range(0, size, 4):  # layered fill keeps build time sane
        pts.append(np.stack([xs.ravel(), ys.ravel(),
                             np.full(xs.size, z)], axis=1))
        c = np.zeros((xs.size, 4), dtype=np.uint8)
        c[:, 0] = 128 + (z % 127)
        c[:, 3] = 255
        cols.append(c)
    pts = np.concatenate(pts)
    cols = np.concatenate(cols)
    return from_voxels(pts, cols, size=size, brick_dim=brick_dim, simplify=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--rays", type=int, default=128)
    args = ap.parse_args()

    t0 = time.time()
    tree = build_quarter_filled(args.size)
    print(f"built {args.size}^3 scene in {time.time()-t0:.1f}s "
          f"({tree.node_count} nodes)")
    flat = flatten(tree)

    n = args.rays
    origin_z = -float(args.size)
    hits = 0
    t0 = time.time()
    for i in range(n):
        for j in range(n):
            x = (i + 0.5) * args.size / n
            y = (j + 0.5) * args.size / n
            d = np.array([0.002, 0.002, 1.0], dtype=np.float32)
            d /= np.linalg.norm(d)
            if get_by_ray(flat, np.array([x, y, origin_z], dtype=np.float32), d):
                hits += 1
    dt = time.time() - t0
    total = n * n
    print(f"cpu get_by_ray: {total} rays in {dt:.2f}s "
          f"({total/dt:,.0f} rays/s, {hits} hits)")


if __name__ == "__main__":
    main()
