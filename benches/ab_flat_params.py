"""A/B: end-to-end flat albedo layout (flat_params) vs row layout.

PERF.md "Flat BACKWARD scatter" left a priced residual: the flat-VJP
route still reshape-copies the ~200 MB [3N] albedo cotangent back to
[N, 3] to match the params shape (~60 ms/step priced).  With
``SoftRenderer(flat_params=True)`` the albedo lives as [S^3*3]
END-TO-END (composite gather via a free row-major reshape view; VJP,
adam update, clamps, checkpoint all flat), so the gradient never
reshapes.  This bench times the full ONE-dispatch training step
(train_step_fused: march + backward + update) for both layouts in one
session (CLAUDE.md: tunnel variance), plus the isolated grad program.

    python benches/ab_flat_params.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = (1920, 1080)
NSTEP = 4


def main():
    import jax
    import optax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import build_scene
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = build_scene()
    cam = orbit_camera(128.0, resolution=RES)

    r_row = SoftRenderer(tree, max_hits=2, max_iters=2048,
                         flat_params=False)
    r_flat = SoftRenderer(r_row.bitgrid, max_hits=2, max_iters=2048,
                          flat_params=True)
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    rays = RES[0] * RES[1]

    params_row = r_row.init_params()
    count, voxels, _t = r_row.trace_hits(o, d, compact=True)
    voxels = jax.lax.stop_gradient(voxels)
    target = jax.lax.stop_gradient(r_row.composite(params_row, voxels))

    results = {}
    grads_out = {}
    for name, r in (("row", r_row), ("flat", r_flat)):
        opt = optax.adam(0.05)
        params = r.init_params()
        opt_state = opt.init(params)
        # warm: recording step, then fused compile + validate
        for _ in range(2):
            _p, _s, _l = r.train_step_fused(params, opt_state, opt, o, d,
                                            target)
            jax.block_until_ready(_l)

        def batch():
            p, s = params, opt_state
            t0 = time.time()
            loss = None
            for _ in range(NSTEP):
                p, s, loss = r.train_step_fused(p, s, opt, o, d, target)
            jax.block_until_ready(loss)
            return (time.time() - t0) / NSTEP

        best = min(batch() for _ in range(5))
        results[name] = best
        print(f"{name}: {best*1e3:.1f} ms/step "
              f"({rays/best/1e6:.2f} Mrays/s)", file=sys.stderr)

        # grads for exactness check (isolated, not timed)
        c2, v2, _ = r.trace_hits(o, d, compact=True)
        _l2, g2 = r.grad_on_hits(r.init_params(), c2,
                                 jax.lax.stop_gradient(v2), target)
        ga = np.asarray(g2["albedo"])
        grads_out[name] = ga.ravel() if ga.ndim == 2 else ga

    exact = bool(np.array_equal(grads_out["row"], grads_out["flat"]))
    print(json.dumps({
        "row_s": round(results["row"], 4),
        "flat_s": round(results["flat"], 4),
        "speedup": round(results["row"] / results["flat"], 3),
        "grads_bit_identical": exact,
    }))


if __name__ == "__main__":
    main()
