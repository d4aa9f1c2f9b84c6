"""End-to-end demo: load a MagicaVoxel scene and render it with the jitted
JAX renderer (the gpu_render example's workflow, reference:
examples/gpu_render.rs).

Usage:
    python examples/render_vox.py [path/to/model.vox] [--out out.png]
        [--res 1280x720] [--brick-dim 32] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vox", nargs="?", default="/root/reference/assets/models/navigate.vox")
    ap.add_argument("--out", default="render.png")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--brick-dim", type=int, default=32)
    ap.add_argument("--yaw", type=float, default=40.0)
    ap.add_argument("--pitch", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from voxelhex_tpu.io.vox import load_vox_tree
    from voxelhex_tpu.render import fastest_renderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten
    from voxelhex_tpu.utils.png import write_png

    w, h = (int(v) for v in args.res.split("x"))

    t0 = time.time()
    tree = load_vox_tree(args.vox, brick_dim=args.brick_dim)
    print(f"loaded {args.vox}: tree size {tree.size}, {tree.node_count} nodes, "
          f"{len(tree.color_palette)} colors in {time.time()-t0:.2f}s")

    if tree.size > 512:
        # vast scene: render through the streaming window instead of a dense
        # whole-world build, framing the CONTENT bounds (the model may sit
        # anywhere in the padded world cube)
        from dataclasses import replace

        import numpy as np

        from voxelhex_tpu.io.vox import load_vox_scene
        from voxelhex_tpu.render.streaming import StreamingView

        print(f"world {tree.size} > 512: using the streaming view window")
        pts, _cols = load_vox_scene(args.vox)
        lo, hi = pts.min(axis=0), pts.max(axis=0) + 1
        # frame the densest structure, not the (outlier-skewed) bbox: median
        # of the elevated voxels, falling back to all voxels for flat scenes
        tall = pts[pts[:, 1] > (lo[1] + hi[1]) / 4] if hi[1] - lo[1] > 8 else pts
        center = np.median(tall if len(tall) else pts, axis=0)
        view = 256
        extent = float(min((hi - lo).max(), view))
        renderer = StreamingView(tree, view_size=view, regions_per_update=100000)
        cam = orbit_camera(extent, yaw_deg=args.yaw, pitch_deg=args.pitch,
                           resolution=(w, h))
        shift = (center - extent / 2.0).astype(np.float32)
        cam = replace(cam, origin=cam.origin + shift, target=cam.target + shift)
    else:
        t0 = time.time()
        flat = flatten(tree)
        print(f"flattened: {flat.n_nodes} nodes, {flat.n_bricks} bricks "
              f"({flat.bricks.nbytes/1e6:.1f} MB brick pool) in {time.time()-t0:.2f}s")

        renderer = fastest_renderer(flat)
        cam = orbit_camera(flat.size, yaw_deg=args.yaw, pitch_deg=args.pitch,
                           resolution=(w, h))

    t0 = time.time()
    img = renderer.render(cam)
    print(f"first frame (incl. compile): {time.time()-t0:.2f}s")

    t0 = time.time()
    img = renderer.render(cam)
    dt = time.time() - t0
    rays = w * h
    print(f"steady frame: {dt*1000:.1f} ms -> {rays/dt/1e6:.2f} Mrays/s")

    write_png(args.out, img)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
