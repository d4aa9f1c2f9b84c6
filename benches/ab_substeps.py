"""Same-session A/B: ADVANCE substep count (2/3/4) at 1080p.

Each iteration pays ONE row gather regardless; extra in-register substeps
are pure VPU work but let a ray cross more empty cells per iteration,
shortening rounds.  Sweeps the substep count and the first-round length.

Usage: python benches/ab_substeps.py [--frames 4]
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
    from voxelhex_tpu.render.camera import device_rays, orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    tree = build_scene()
    flat = flatten(tree)
    cam = orbit_camera(128.0, resolution=RES)

    variants = {
        "s2_20_sh4": (BitGridRenderer(flat, advance_substeps=2), 20, 4),
        "s4_14_sh4": (BitGridRenderer(flat, advance_substeps=4), 14, 4),
        "s4_14_sh2": (BitGridRenderer(flat, advance_substeps=4), 14, 2),
        "s4_10_sh2": (BitGridRenderer(flat, advance_substeps=4), 10, 2),
    }

    import jax.numpy as jnp

    o, dv = device_rays(cam)
    bgc = jnp.asarray((0.0, 0.0, 0.0), dtype=jnp.float32)
    for name, (r, ri, sh) in variants.items():
        t0 = time.time()
        out = r.trace_compacted(o, dv, round_iters=ri, shrink=sh, shade_bg=bgc)
        np.asarray(out[-1])
        print(f"warm {name}: {time.time()-t0:.1f}s "
              f"(rounds {[x['iters'] for x in r.last_stats['rounds']]})",
              flush=True)

    best = {k: float("inf") for k in variants}
    stats = {}
    for f in range(args.frames):
        for name, (r, ri, sh) in variants.items():
            t0 = time.time()
            out = r.trace_compacted(o, dv, round_iters=ri, shrink=sh, shade_bg=bgc)
            np.asarray(out[-1])
            best[name] = min(best[name], time.time() - t0)
            stats[name] = r.last_stats
        print(f"frame {f}: " + "  ".join(f"{k}={best[k]:.3f}s" for k in variants),
              flush=True)

    rays = RES[0] * RES[1]
    print()
    for k, v in best.items():
        acts = [x["n_active"] for x in stats[k]["rounds"]]
        print(f"{k}: {v:.3f}s  {rays/v/1e6:.2f} Mrays/s  actives {acts}")


if __name__ == "__main__":
    main()
