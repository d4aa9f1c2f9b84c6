"""Boxtree operation microbenchmarks — the reference's criterion suite
(reference: benches/performance.rs:69-134): random single-voxel
insert/clear/get on a preloaded 64^3 tree, plus save/load round-trips and
the bulk-build rate.

Usage: python benches/tree_ops.py [--n 2000]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

from voxelhex_tpu.io import checkpoint
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.build import from_voxels


def bench(name, fn, n):
    t0 = time.time()
    fn()
    dt = time.time() - t0
    print(f"{name:24s} {dt*1e6/n:10.2f} us/op   ({n/dt:,.0f} ops/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--preload", type=int, default=50000)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    # preload a 64^3 tree with random voxels (the reference uses 5e7 random
    # inserts; the bulk builder gets the same density instantly)
    size = 64
    pts = rng.integers(0, size, (args.preload, 3))
    cols = np.zeros((args.preload, 4), dtype=np.uint8)
    cols[:, 0] = rng.integers(1, 255, args.preload)
    cols[:, 3] = 255
    t0 = time.time()
    tree = from_voxels(pts, cols, size=size, brick_dim=4, simplify=False)
    dt = time.time() - t0
    print(f"bulk build {args.preload} voxels: {dt:.2f}s "
          f"({args.preload/dt:,.0f} voxels/s)")

    n = args.n
    ins_pts = [tuple(int(v) for v in rng.integers(0, size, 3)) for _ in range(n)]
    red = Albedo.from_u32(0xFF0000FF)

    bench("insert", lambda: [tree.insert(p, red) for p in ins_pts], n)
    bench("get", lambda: [tree.get(p) for p in ins_pts], n)
    bench("clear", lambda: [tree.clear(p) for p in ins_pts], n)

    # batched edit queue (one descent per touched brick)
    from voxelhex_tpu.tree.build import insert_many

    em_pts = rng.integers(0, size, (n, 3))
    em_cols = np.zeros((n, 4), dtype=np.uint8)
    em_cols[:, 1] = 200
    em_cols[:, 3] = 255
    bench("insert_many (batched)", lambda: insert_many(tree, em_pts, em_cols), n)

    # native C++ edit engine on the same workload
    from voxelhex_tpu.tree import native_edit

    if native_edit.available():
        nat = native_edit.NativeEditTree(size, 4, auto_simplify=False)
        # preload through the same single-op path (no bulk import yet)
        t0 = time.time()
        for p, c in zip(pts[:10000], cols[:10000]):
            nat.insert(tuple(int(v) for v in p), Albedo(*(int(x) for x in c)))
        dt = time.time() - t0
        print(f"native preload 10000:   {dt*1e6/10000:10.2f} us/op")
        bench("native insert", lambda: [nat.insert(p, red) for p in ins_pts], n)
        bench("native get", lambda: [nat.get(p) for p in ins_pts], n)
        bench("native clear", lambda: [nat.clear(p) for p in ins_pts], n)
        bpts = np.array(ins_pts, dtype=np.int64)
        bcols = np.tile(np.array([[255, 0, 0, 255]], dtype=np.uint8), (n, 1))
        bench("native insert_batch", lambda: nat.insert_batch(bpts, bcols), n)
        bench("native get_batch", lambda: nat.get_packed_batch(bpts), n)
        bench("native clear_batch", lambda: nat.clear_batch(bpts), n)
    else:
        print("native edit engine unavailable (build failed?)")

    with tempfile.NamedTemporaryFile(suffix=".vhx") as f:
        t0 = time.time()
        checkpoint.save_tree(f.name, tree)
        print(f"{'save':24s} {(time.time()-t0)*1000:10.1f} ms")
        t0 = time.time()
        checkpoint.load_tree(f.name)
        print(f"{'load':24s} {(time.time()-t0)*1000:10.1f} ms")


if __name__ == "__main__":
    main()
