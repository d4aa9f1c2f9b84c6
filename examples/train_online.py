"""Online training workflow: ONE-dispatch steps -> bake -> save -> render.

The round-4 training loop end-to-end:

1. build a scene tree and a target image set;
2. run ``SoftRenderer.train_step_fused`` steps — multi-hit march,
   hit-compacted backward, adam update and clamps as ONE jitted program
   per step, chained device-side (no per-step host round-trip);
3. bake the fitted (albedo, opacity) back into an editable BoxTree
   (``params_to_tree``), save it (versioned checkpoint + reference
   bencode wire), and re-render it with the production tracer.

Usage: python examples/train_online.py [--steps 40] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--res", default="192x144")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    res = tuple(int(v) for v in args.res.split("x"))

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from voxelhex_tpu.diff.soft import SoftRenderer, params_to_tree
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import device_rays, orbit_camera
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
    from voxelhex_tpu.tree.flat import flatten

    # scene: a shell with a voxel the target says should NOT be there
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(4, 12):
        for z in range(4, 12):
            tree.insert((x, 4, z), Albedo(60, 160, 60, 255))
    tree.insert((8, 8, 8), Albedo(220, 40, 40, 255))  # to be carved

    soft = SoftRenderer(tree, max_hits=3, max_iters=512)
    cam = orbit_camera(16.0, resolution=res)
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    # target: the same scene WITHOUT the red voxel (carve objective)
    params0 = soft.init_params()
    S = soft.size
    ax = 8 + 8 * S + 8 * S * S
    tparams = dict(params0, logits=params0["logits"].at[ax].set(-10.0))
    _c, voxels, _t = soft.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        soft.composite(tparams, jax.lax.stop_gradient(voxels))
    )

    opt = optax.adam(0.15)
    params, opt_state = params0, opt.init(params0)
    t0 = time.time()
    loss = None
    # fit_albedo=False: colors frozen so GEOMETRY must explain the
    # target (with albedo free, the fit can recolor an occluder
    # instead of carving it — the classic shape/appearance ambiguity).
    # Steps go CHAIN-per-dispatch (train_steps_fused scans the whole
    # step body; bit-identical to the per-step loop, and XLA hoists the
    # static-geometry march out of the scan — PERF.md round 5); the
    # first call records plans per-step, later calls ride the chain.
    CHAIN = 10
    for i in range(0, args.steps, CHAIN):
        n = min(CHAIN, args.steps - i)
        if n == CHAIN:
            params, opt_state, losses = soft.train_steps_fused(
                params, opt_state, opt, o, d, target, n, fit_albedo=False
            )
            loss = losses[-1]
        else:
            # tail < CHAIN: per-step loop (a different n_steps would
            # compile a SECOND chain program — minutes through the
            # tunnel for a few leftover steps)
            for _ in range(n):
                params, opt_state, loss = soft.train_step_fused(
                    params, opt_state, opt, o, d, target,
                    fit_albedo=False,
                )
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(f"{args.steps} one-dispatch steps in {dt:.2f}s "
          f"({dt/args.steps*1e3:.1f} ms/step), final loss {float(loss):.6f}")

    baked = params_to_tree(soft, params)
    carved = not baked.get((8, 8, 8)).is_some
    kept = baked.get((8, 4, 8)).is_some
    print(f"baked tree: red voxel carved={carved}, floor kept={kept}")

    from voxelhex_tpu.io.bencode import save as bencode_save
    from voxelhex_tpu.io.checkpoint import save_tree

    save_tree("/tmp/trained_tree.npz", baked)
    bencode_save(baked, "/tmp/trained_tree.vhx")
    print("saved /tmp/trained_tree.npz + /tmp/trained_tree.vhx")

    img = BitGridRenderer(flatten(baked), max_iters=512).render(cam)
    print(f"re-rendered baked tree: {img.shape}, finite={np.isfinite(img).all()}")


if __name__ == "__main__":
    main()
