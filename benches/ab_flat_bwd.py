"""A/B: albedo-gradient backward scatter layout (row vs flat).

The soft training step's grad program spends ~86 of its ~146 device-ms in
the albedo gradient's [N, 3] row scatter-add (PERF.md "soft backward
scatter layout").  ``SoftRenderer(flat_albedo_bwd=True)`` keeps the fast
forward row gather but reroutes ONLY the backward through a flat [N*3]
1-D scatter (custom_vjp) — the flat logits scatter moves 1/3 the data in
9.2 ms, so the flat route prices at ~28 ms + one reshape.

Run both variants in ONE session (CLAUDE.md: tunnel variance):

    python benches/ab_flat_bwd.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = (1920, 1080)


def main():
    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import build_scene
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = build_scene()
    cam = orbit_camera(128.0, resolution=RES)

    r_row = SoftRenderer(tree, max_hits=2, max_iters=2048,
                         flat_albedo_bwd=False, flat_params=False)
    r_flat = SoftRenderer(r_row.bitgrid, max_hits=2, max_iters=2048,
                          flat_albedo_bwd=True, flat_params=False)
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    rays = RES[0] * RES[1]

    params = r_row.init_params()
    count, voxels, _t = r_row.trace_hits(o, d, compact=True)
    voxels = jax.lax.stop_gradient(voxels)
    target = jax.lax.stop_gradient(r_row.composite(params, voxels))

    variants = [("row", r_row), ("flat", r_flat)]
    results = {}
    grads = {}
    for name, r in variants:
        # warm: adaptive pass records the plan, second call compiles+runs
        # the planned fn (the training steady state)
        _l, g = r.grad_on_hits(params, count, voxels, target)
        _l, g = r.grad_on_hits(params, count, voxels, target)
        jax.block_until_ready(g["logits"])
        grads[name] = g

    for sweep in range(5):
        for name, r in variants:
            t0 = time.time()
            _l, g = r.grad_on_hits(params, count, voxels, target)
            jax.block_until_ready(g["logits"])
            dt = time.time() - t0
            results.setdefault(name, []).append(dt)

    for name, times in results.items():
        best = min(times)
        print(json.dumps({
            "metric": f"grad_on_hits_1080p_{name}",
            "best_ms": round(best * 1e3, 1),
            "all_ms": [round(t * 1e3, 1) for t in times],
        }))
    if len(results) == 2:
        print(json.dumps({
            "metric": "flat_bwd_speedup",
            "value": round(min(results["row"]) / min(results["flat"]), 3),
            "unit": "x",
        }))
        da = float(np.max(np.abs(
            np.asarray(grads["row"]["albedo"]) - np.asarray(grads["flat"]["albedo"]))))
        dl = float(np.max(np.abs(
            np.asarray(grads["row"]["logits"]) - np.asarray(grads["flat"]["logits"]))))
        print(json.dumps({"metric": "grad_max_abs_diff",
                          "albedo": da, "logits": dl}))


if __name__ == "__main__":
    main()
