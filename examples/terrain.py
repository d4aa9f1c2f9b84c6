"""Large-terrain demo (BASELINE config #4): a vast procedural landscape
streamed through a camera-following view window and rendered at 1080p.

The terrain lives in a big sparse tree (default 1024^3); only the view
window around the camera is resident on device, paged with per-update
budgets — the reference's out-of-core streaming configuration.

Usage: python examples/terrain.py [--world 1024] [--view 256]
       [--res 1920x1080] [--frames 4] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_terrain(world: int, brick_dim: int = 4):
    """Procedural heightfield terrain with caves and color bands."""
    from voxelhex_tpu.tree.build import from_voxels

    n = world
    x, z = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    h = (
        n * 0.06
        + n * 0.04 * np.sin(x * 7.0 / n) * np.cos(z * 9.0 / n)
        + n * 0.02 * np.sin(x * 31.0 / n + 1.7) * np.sin(z * 27.0 / n)
    ).astype(np.int64)
    h = np.clip(h, 1, n // 4)

    # solid crust: a few voxels thick under the surface
    pts = []
    cols = []
    thick = 3
    for dy in range(thick):
        y = h - dy
        keep = y >= 0
        xs, zs = x[keep], z[keep]
        ys = y[keep]
        pts.append(np.stack([xs, ys, zs], axis=1))
        shade = (ys * 255 // max(int(h.max()), 1)).astype(np.uint8)
        c = np.stack(
            [50 + shade // 2, 90 + shade // 3, np.full_like(shade, 60),
             np.full_like(shade, 255)], axis=1
        ).astype(np.uint8)
        cols.append(c)
    pts = np.concatenate(pts)
    cols = np.concatenate(cols)
    print(f"terrain voxels: {len(pts):,}")
    t0 = time.time()
    tree = from_voxels(pts, cols, size=world, brick_dim=brick_dim, simplify=True)
    print(f"tree built in {time.time()-t0:.1f}s ({tree.node_count} nodes)")
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", type=int, default=1024)
    ap.add_argument("--view", type=int, default=256)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--async-uploads", action="store_true",
                    help="rasterize regions on a worker thread (smoother frames)")
    ap.add_argument("--async-far", action="store_true",
                    help="far-ring rebuilds off the render path (measured "
                         "win for moving cameras, PERF.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        import os

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from voxelhex_tpu.render.camera import Camera
    from voxelhex_tpu.render.streaming import StreamingView
    from voxelhex_tpu.utils.png import write_png

    w, h = (int(v) for v in args.res.split("x"))
    tree = build_terrain(args.world)
    view = StreamingView(tree, view_size=args.view,
                         regions_per_update=512 if args.async_uploads else 8192,
                         async_uploads=args.async_uploads,
                         async_far=args.async_far)

    for i in range(args.frames):
        # fly across the terrain
        t = i / max(args.frames - 1, 1)
        cx = args.world * (0.2 + 0.6 * t)
        cz = args.world * 0.4
        eye = np.array([cx - 80.0, args.world * 0.12, cz - 120.0])
        tgt = np.array([cx, args.world * 0.05, cz])
        cam = Camera(origin=eye, target=tgt, resolution=(w, h), fov_y_deg=55.0)
        t0 = time.time()
        img = view.render(cam)
        dt = time.time() - t0
        print(f"frame {i}: {dt*1000:.0f} ms ({w*h/dt/1e6:.2f} Mrays/s), "
              f"uploads so far {view.uploads}")
        write_png(f"terrain_{i:02d}.png", img)


if __name__ == "__main__":
    main()
