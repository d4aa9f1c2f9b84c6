"""Same-session A/B: parent_skip lateral elision at 1080p.

Renders the bench.py scene with parent_skip off/on (and a round-length
variant), interleaved, best-of-N — the only valid way to compare perf
through the tunnel's +-40% session variance (CLAUDE.md).

Usage: python benches/ab_parent_skip.py [--frames 4]
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

    variants = {
        "off_20": (BitGridRenderer(flat, parent_skip=False), 20),
        "on_20": (BitGridRenderer(flat, parent_skip=True), 20),
        "on_16": (BitGridRenderer(flat, parent_skip=True), 16),
        "on_12": (BitGridRenderer(flat, parent_skip=True), 12),
    }

    # warm all variants (compile)
    from voxelhex_tpu.render.camera import device_rays

    o, dv = device_rays(cam)
    import jax.numpy as jnp

    bgc = jnp.asarray((0.0, 0.0, 0.0), dtype=jnp.float32)
    for name, (r, ri) in variants.items():
        t0 = time.time()
        out = r.trace_compacted(o, dv, round_iters=ri, shade_bg=bgc)
        np.asarray(out[-1])
        print(f"warm {name}: {time.time()-t0:.1f}s "
              f"(rounds {[x['iters'] for x in r.last_stats['rounds']]})",
              flush=True)

    best = {k: float("inf") for k in variants}
    stats = {}
    for f in range(args.frames):
        for name, (r, ri) in variants.items():
            t0 = time.time()
            out = r.trace_compacted(o, dv, round_iters=ri, shade_bg=bgc)
            np.asarray(out[-1])
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            stats[name] = r.last_stats
        print(f"frame {f}: " + "  ".join(f"{k}={best[k]:.3f}s" for k in variants),
              flush=True)

    rays = RES[0] * RES[1]
    print()
    for k, v in best.items():
        rs = stats[k]["rounds"]
        acts = [x["n_active"] for x in rs]
        print(f"{k}: {v:.3f}s  {rays/v/1e6:.2f} Mrays/s  actives {acts}")


if __name__ == "__main__":
    main()
