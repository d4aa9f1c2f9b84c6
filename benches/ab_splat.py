"""Same-session A/B: voxel-splat depth prepass at 1080p.

The trace-based prepass lost because it cost extra trace sessions; the
splat prepass is dense VPU math + one scatter (~ms).  Measures render time
with and without, interleaved, and verifies the u8 frames are identical.

Usage: python benches/ab_splat.py [--frames 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, repo)
    from bench import RES, build_scene

    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    tree = build_scene()
    flat = flatten(tree)
    cam = orbit_camera(128.0, resolution=RES)
    r = BitGridRenderer(flat)

    frames = {}
    for name, splat in (("off", False), ("on", True)):
        t0 = time.time()
        frames[name] = np.asarray(r.render(cam, out_u8=True, splat_prepass=splat))
        stats = r.last_stats
        print(f"warm {name}: {time.time()-t0:.1f}s rounds "
              f"{[(x['iters'], x['n_active']) for x in stats['rounds']]}",
              flush=True)
    same = np.array_equal(frames["off"], frames["on"])
    print(f"frames identical: {same}")

    best = {"off": float("inf"), "on": float("inf")}
    for f in range(args.frames):
        for name, splat in (("off", False), ("on", True)):
            t0 = time.time()
            np.asarray(r.render(cam, out_u8=True, splat_prepass=splat))
            best[name] = min(best[name], time.time() - t0)
        print(f"frame {f}: off={best['off']:.3f}s on={best['on']:.3f}s", flush=True)

    rays = RES[0] * RES[1]
    for k, v in best.items():
        print(f"{k}: {v:.3f}s  {rays/v/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
