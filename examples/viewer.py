"""Viewer: the whisp desktop app's workflow as a headless tool.

Loads a MagicaVoxel model with the on-disk cache (version-gated, re-parsed on
mismatch — reference: whisp/src/loader.rs), renders a turntable orbit with
the fastest device renderer, writes frames and reports FPS statistics (the
whisp FPS overlay analog).

Usage:
    python examples/viewer.py model.vox [--frames 24] [--res 960x540]
        [--brick-dim 8] [--fov 50] [--out-dir frames/] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vox", nargs="?", default="/root/reference/assets/models/navigate.vox")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--res", default="960x540")
    ap.add_argument("--brick-dim", type=int, default=8)
    ap.add_argument("--fov", type=float, default=50.0)
    ap.add_argument("--pitch", type=float, default=25.0)
    ap.add_argument("--out-dir", default="frames")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cpu-check", action="store_true",
                    help="also render frame 0's viewport with the CPU oracle "
                         "at low res and report device/oracle agreement (the "
                         "gpu_render example's Tab parity check, reference: "
                         "examples/gpu_render.rs:196-257)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    from voxelhex_tpu.io.vox import load_vox_tree_cached
    from voxelhex_tpu.render import fastest_renderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.utils.png import write_png

    w, h = (int(v) for v in args.res.split("x"))
    os.makedirs(args.out_dir, exist_ok=True)

    t0 = time.time()
    tree = load_vox_tree_cached(args.vox, brick_dim=args.brick_dim)
    print(f"loaded {os.path.basename(args.vox)}: size {tree.size}, "
          f"{tree.node_count} nodes in {time.time()-t0:.2f}s")

    t0 = time.time()
    renderer = fastest_renderer(tree)
    print(f"renderer ready in {time.time()-t0:.2f}s")

    times = []
    for i in range(args.frames):
        yaw = 360.0 * i / args.frames
        cam = orbit_camera(
            float(tree.size), yaw_deg=yaw, pitch_deg=args.pitch,
            resolution=(w, h), fov_y_deg=args.fov,
        )
        t0 = time.time()
        img = renderer.render(cam)
        dt = time.time() - t0
        times.append(dt)
        write_png(os.path.join(args.out_dir, f"frame_{i:03d}.png"), img)
        print(f"frame {i:02d}: {dt*1000:7.1f} ms  ({w*h/dt/1e6:6.2f} Mrays/s)")

    if args.cpu_check:
        import numpy as np

        from voxelhex_tpu.render.oracle import get_by_ray
        from voxelhex_tpu.tree.flat import flatten

        flat = flatten(tree)
        cam = orbit_camera(float(tree.size), yaw_deg=0.0, pitch_deg=args.pitch,
                           resolution=(64, 36), fov_y_deg=args.fov)
        o, d = cam.rays()
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        dev_hit, _v, _hv, _p, _n = renderer.trace(o, d)
        dev_hit = np.asarray(dev_hit)
        cpu_hit = np.array([get_by_ray(flat, o[i], d[i]) is not None
                            for i in range(len(o))])
        agree = float((dev_hit == cpu_hit).mean())
        print(f"cpu-check: device/oracle hit agreement {agree:.4f} "
              f"({len(o)} probe rays)")

    steady = times[1:] or times
    avg = sum(steady) / len(steady)
    print(f"\navg (excl. first): {avg*1000:.1f} ms/frame = {1/avg:.2f} FPS "
          f"({w*h/avg/1e6:.2f} Mrays/s) -> {args.out_dir}/")


if __name__ == "__main__":
    main()
