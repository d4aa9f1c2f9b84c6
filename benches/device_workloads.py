"""Device renderer on the reference benchmark workloads.

Two scenes at 1080p on the fastest device path:
 * the reference criterion raytrace scene — 512^3 tree, brick_dim 8,
   ~quarter-filled (reference: benches/performance.rs:29-66)
 * the gingerbread house (whisp's demo model) through the streaming window

Prints one line per workload.  Usage: python benches/device_workloads.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GINGER = "/root/reference/whisp/assets/models/gingerbread_house_by_kirra_luan.vox"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--res", type=int, nargs=2, default=(1920, 1080))
    args = ap.parse_args()

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    RES = tuple(args.res)
    rays = RES[0] * RES[1]

    from benches.cpu_raytrace import build_quarter_filled

    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    # --- workload 1: 512^3 quarter-filled (criterion raytrace scene)
    t0 = time.time()
    tree = build_quarter_filled(512, brick_dim=8)
    flat = flatten(tree)
    print(f"built 512^3 quarter-filled in {time.time()-t0:.1f}s", flush=True)
    r = BitGridRenderer(flat, fuse_plan=True)
    cam = orbit_camera(512.0, resolution=RES)
    np.asarray(r.render(cam, out_u8=True))  # warm
    best = float("inf")
    for _ in range(args.frames):
        t0 = time.time()
        np.asarray(r.render(cam, out_u8=True))
        best = min(best, time.time() - t0)
    print(f"512^3 quarter-filled: {best:.3f}s/frame  "
          f"{rays/best/1e6:.2f} Mrays/s", flush=True)

    # --- workload 2: gingerbread house via the streaming window
    if os.path.exists(GINGER):
        from dataclasses import replace

        from voxelhex_tpu.io.vox import load_vox_scene, load_vox_tree_cached
        from voxelhex_tpu.render.streaming import StreamingView

        t0 = time.time()
        gtree = load_vox_tree_cached(GINGER, brick_dim=4)
        print(f"loaded gingerbread in {time.time()-t0:.1f}s", flush=True)
        # frame the content like examples/render_vox.py
        pts, _cols = load_vox_scene(GINGER)
        lo, hi = pts.min(axis=0), pts.max(axis=0) + 1
        tall = pts[pts[:, 1] > (lo[1] + hi[1]) / 4] if hi[1] - lo[1] > 8 else pts
        center = np.median(tall if len(tall) else pts, axis=0)
        extent = float(min((hi - lo).max(), 256))
        view = StreamingView(gtree, view_size=256, regions_per_update=100000,
                             fuse_plan=True)
        cam2 = orbit_camera(extent, resolution=RES)
        shift = (center - extent / 2.0).astype(np.float32)
        cam2 = replace(cam2, origin=cam2.origin + shift, target=cam2.target + shift)
        np.asarray(view.render(cam2, out_u8=True))  # warm + page in
        best = float("inf")
        for _ in range(args.frames):
            t0 = time.time()
            np.asarray(view.render(cam2, out_u8=True))
            best = min(best, time.time() - t0)
        print(f"gingerbread streaming: {best:.3f}s/frame  "
              f"{rays/best/1e6:.2f} Mrays/s", flush=True)

        # pipelined: downloads overlap the next frame's rounds
        from voxelhex_tpu.render.pipeline import FramePipeline

        pipe = FramePipeline(view)
        N = max(args.frames, 3)
        t0 = time.time()
        futs = [pipe.render(cam2, out_u8=True) for _ in range(N)]
        for f in futs:
            f.result()
        per = (time.time() - t0) / N
        print(f"gingerbread streaming (pipelined): {per:.3f}s/frame  "
              f"{rays/per/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
