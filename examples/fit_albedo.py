"""Differentiable fit demo (BASELINE config #5): recover voxel colors from
rendered target images by gradient descent through the renderer.

Builds a small procedural scene, renders target views, re-initializes the
albedo to gray, and optimizes until the images match; optionally also carves
soft occupancy with the multi-hit compositing path.

Usage: python examples/fit_albedo.py [--steps 200] [--soft] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--soft", action="store_true",
                    help="also fit soft occupancy (multi-hit compositing)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from voxelhex_tpu.diff.fit import fit_albedo
    from voxelhex_tpu.diff.render import DiffRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.tree.flat import flatten

    # procedural scene: colored shells
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(0)
    c = np.array([16.0, 16.0, 16.0])
    for x in range(32):
        for y in range(32):
            for z in range(32):
                d = np.linalg.norm([x, y, z] - c)
                if 8 <= d <= 10:
                    tree.insert((x, y, z), Albedo(int(50 + x * 6), int(50 + y * 6),
                                                  int(50 + z * 6), 255))
    flat = flatten(tree)
    diff = DiffRenderer(flat)

    # multi-view target renders with the TRUE albedo
    views = []
    for yaw in (0, 90, 180, 270):
        cam = orbit_camera(40.0, yaw_deg=yaw, resolution=(48, 36))
        o, d = cam.rays()
        views.append((o.reshape(-1, 3), d.reshape(-1, 3)))
    origins = np.concatenate([v[0] for v in views])
    dirs = np.concatenate([v[1] for v in views])

    true_params = diff.init_params()
    target = np.asarray(
        jax.jit(diff.render)(true_params, jnp.asarray(origins), jnp.asarray(dirs))
    )
    print(f"target rendered: {origins.shape[0]} rays over {len(views)} views")

    # fit from a gray initialization
    init = jnp.full_like(true_params, 0.5)
    t0 = time.time()
    params, losses = fit_albedo(
        diff, origins, dirs, target, steps=args.steps, lr=0.1, params0=init
    )
    print(f"albedo fit: loss {losses[0]:.4f} -> {losses[-1]:.6f} "
          f"in {time.time()-t0:.1f}s ({args.steps} steps)")
    err = float(jnp.mean(jnp.abs(
        jax.jit(diff.render)(params, jnp.asarray(origins), jnp.asarray(dirs))
        - target)))
    print(f"mean image error after fit: {err:.4f}")

    if args.soft:
        from voxelhex_tpu.diff.soft import SoftRenderer, fit_soft

        soft = SoftRenderer(tree, max_hits=3)
        tgt = np.asarray(soft.render(soft.init_params(), origins, dirs))
        params2, losses2 = fit_soft(soft, origins, dirs, tgt, steps=args.steps)
        print(f"soft fit: loss {losses2[0]:.5f} -> {losses2[-1]:.6f}")


if __name__ == "__main__":
    main()
