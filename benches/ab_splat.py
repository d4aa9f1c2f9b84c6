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

    # variants: off, and splat with a sweep of first-round lengths
    sweeps = [("off", False, None)] + [
        (f"on/fr{n}", True, n) for n in (14, 8, 6, 4)
    ]
    frames = {}
    for name, splat, fr in sweeps:
        if fr is not None:
            r.splat_first_iters = fr
        t0 = time.time()
        frames[name] = np.asarray(r.render(cam, out_u8=True, splat_prepass=splat))
        stats = r.last_stats
        print(f"warm {name}: {time.time()-t0:.1f}s rounds "
              f"{[(x['iters'], x['n_active']) for x in stats['rounds']]}",
              flush=True)
        if name != "off":
            same = np.array_equal(frames["off"], frames[name])
            if not same:
                diff = int((frames["off"] != frames[name]).any(axis=-1).sum())
                print(f"  MISMATCH vs off: {diff} pixels", flush=True)

    best = {name: float("inf") for name, _, _ in sweeps}
    for f in range(args.frames):
        for name, splat, fr in sweeps:
            if fr is not None:
                r.splat_first_iters = fr
            t0 = time.time()
            np.asarray(r.render(cam, out_u8=True, splat_prepass=splat))
            best[name] = min(best[name], time.time() - t0)
        print(f"frame {f}: " + " ".join(
            f"{k}={v:.3f}s" for k, v in best.items()), flush=True)

    rays = RES[0] * RES[1]
    for k, v in best.items():
        print(f"{k}: {v:.3f}s  {rays/v/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
