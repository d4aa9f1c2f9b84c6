"""Forward+backward benchmark: one differentiable training step at 1080p.

The BASELINE.json companion metric (PERF.md "Forward+backward"): multi-hit
march (K=2, soft-occupancy path) + jitted gradients of the transmittance-
composited loss w.r.t. dense albedo + opacity logits, on the bench.py scene.

Runs both the plain (K serial full-width marches) and the compacted
(misses drop out between segments) tracer in ONE session so the A/B is
meaningful despite the tunnel's run-to-run variance (CLAUDE.md).

    python benches/fwd_bwd.py            # both variants, best-of-3 each
    python benches/fwd_bwd.py --compact  # compacted only
    python benches/fwd_bwd.py --plain    # plain only
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = (1920, 1080)


def main():
    if "--compact" in sys.argv and "--plain" in sys.argv:
        sys.exit("--compact and --plain are mutually exclusive (omit both to run the A/B)")
    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import build_scene
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = build_scene()
    r = SoftRenderer(tree, max_hits=2, max_iters=2048)
    cam = orbit_camera(128.0, resolution=RES)
    o, d = device_rays(cam)  # rays never leave the device (PERF.md)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    rays = RES[0] * RES[1]

    params = r.init_params()

    import jax.numpy as jnp

    @jax.jit
    def grad_step(params, voxels, target):
        def loss_fn(p):
            return r.loss(p, voxels, target)

        return jax.value_and_grad(loss_fn)(params)

    variants = []
    if "--plain" not in sys.argv:
        variants.append(("compacted", True))
    if "--compact" not in sys.argv:
        variants.append(("plain", False))

    results = {}
    for name, compact in variants:
        # warm (compiles the trace rounds + the grad program)
        _c, voxels, _t = r.trace_hits(o, d, compact=compact)
        voxels = jax.lax.stop_gradient(voxels)
        target = jax.lax.stop_gradient(r.composite(params, voxels))
        loss, grads = grad_step(params, voxels, target)
        jax.block_until_ready(grads["logits"])

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _c, voxels, _t = r.trace_hits(o, d, compact=compact)
            voxels = jax.lax.stop_gradient(voxels)
            loss, grads = grad_step(params, voxels, target)
            jax.block_until_ready(grads["logits"])
            best = min(best, time.time() - t0)
        results[name] = best
        print(
            json.dumps(
                {
                    "metric": f"rays_per_sec_fwdbwd_1080p_{name}",
                    "value": round(rays / best, 1),
                    "unit": "rays/s",
                    "step_s": round(best, 3),
                }
            )
        )

    if len(results) == 2:
        print(
            json.dumps(
                {
                    "metric": "compacted_speedup_fwdbwd",
                    "value": round(results["plain"] / results["compacted"], 3),
                    "unit": "x",
                }
            )
        )

    # round-4 form: the ONE-dispatch chained TRAINING step (march +
    # backward + adam update in a single program, no per-step host sync —
    # what bench.py's headline measures)
    import optax

    opt = optax.adam(0.05)
    p, s = params, opt.init(params)
    _c, voxels, _t = r.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        r.composite(params, jax.lax.stop_gradient(voxels))
    )
    for _ in range(2):  # record plans + compile/validate the fused step
        _p, _s, _l = r.train_step_fused(p, s, opt, o, d, target)
        jax.block_until_ready(_l)
    NSTEP = 4
    best = float("inf")
    for _ in range(3):
        pp, ss = p, s
        t0 = time.time()
        loss = None
        for _ in range(NSTEP):
            pp, ss, loss = r.train_step_fused(pp, ss, opt, o, d, target)
        jax.block_until_ready(loss)
        best = min(best, (time.time() - t0) / NSTEP)
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwdbwd_1080p_fused_step",
                "value": round(rays / best, 1),
                "unit": "rays/s",
                "step_s": round(best, 3),
            }
        )
    )

    # ---- round-5 form: N steps SCANNED into one dispatch
    # (train_steps_fused) — bit-identical to the loop above; XLA hoists
    # the static-geometry march out of the scan (hit-record dedup) and
    # the dispatch residual amortizes N-fold ----
    CHAIN = 8
    _p, _s, _l = r.train_steps_fused(p, s, opt, o, d, target, CHAIN)
    jax.block_until_ready(_l)
    best_c = float("inf")
    for _ in range(3):
        t0 = time.time()
        _p, _s, losses = r.train_steps_fused(p, s, opt, o, d, target,
                                             CHAIN)
        jax.block_until_ready(losses)
        best_c = min(best_c, (time.time() - t0) / CHAIN)
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwdbwd_1080p_chain8",
                "value": round(rays / best_c, 1),
                "unit": "rays/s",
                "step_s": round(best_c, 3),
                "step_s_loop": round(best, 3),
            }
        )
    )

    # ---- ms/step vs K: the same fused step at max_hits=4 (the
    # SoftRenderer default signature, diff/soft.py) — prices the march
    # depth the bench headline (K=2) leaves out (VERDICT r4 weak #2) ----
    if "--no-k4" not in sys.argv:
        r4 = SoftRenderer(tree, max_hits=4, max_iters=2048)
        p4 = r4.init_params()
        s4 = opt.init(p4)
        _c, voxels4, _t = r4.trace_hits(o, d, compact=True)
        target4 = jax.lax.stop_gradient(
            r4.composite(p4, jax.lax.stop_gradient(voxels4))
        )
        for _ in range(2):
            _p, _s, _l = r4.train_step_fused(p4, s4, opt, o, d, target4)
            jax.block_until_ready(_l)
        best4 = float("inf")
        for _ in range(3):
            pp, ss = p4, s4
            t0 = time.time()
            loss = None
            for _ in range(NSTEP):
                pp, ss, loss = r4.train_step_fused(pp, ss, opt, o, d,
                                                   target4)
            jax.block_until_ready(loss)
            best4 = min(best4, (time.time() - t0) / NSTEP)
        print(
            json.dumps(
                {
                    "metric": "rays_per_sec_fwdbwd_1080p_fused_step_k4",
                    "value": round(rays / best4, 1),
                    "unit": "rays/s",
                    "step_s": round(best4, 3),
                    "step_s_k2": round(best, 3),
                }
            )
        )

    # ---- convergence at 1080p: does the chained one-dispatch step
    # actually TRAIN at full resolution?  Perturb the params away from the
    # scene, fit back toward the true composite for 50 chained steps, and
    # record the loss trajectory (VERDICT r4 weak #6: throughput was
    # proven, decreasing loss at 1080p was not) ----
    if "--no-convergence" not in sys.argv:
        target_true = jax.lax.stop_gradient(
            r.composite(params, jax.lax.stop_gradient(voxels))
        )
        p = {
            "albedo": jnp.clip(params["albedo"] + 0.3, 0.0, 1.0),
            "logits": params["logits"] * 0.7,
        }
        s = opt.init(p)  # same opt object: reuses the compiled step program
        for _ in range(2):  # plan + compile (param values don't matter)
            _p, _s, _l = r.train_step_fused(p, s, opt, o, d, target_true)
            jax.block_until_ready(_l)
        traj = []
        t0 = time.time()
        for block in range(5):  # 5 x 10 chained steps, one read per block
            loss = None
            for _ in range(10):
                p, s, loss = r.train_step_fused(p, s, opt, o, d,
                                                target_true)
            traj.append(float(loss))
        dt = time.time() - t0
        decreasing = all(b < a for a, b in zip(traj, traj[1:]))
        psnr = [round(-10.0 * np.log10(max(l, 1e-12)), 2) for l in traj]
        assert traj[-1] < traj[0] * 0.5, (
            f"1080p fused chain did not converge: {traj}"
        )
        print(
            json.dumps(
                {
                    "metric": "fused_chain_convergence_1080p",
                    "value": round(traj[-1], 6),
                    "unit": "mse@50steps",
                    "loss_per_10_steps": [round(l, 6) for l in traj],
                    "psnr_per_10_steps": psnr,
                    "monotonic_decreasing": decreasing,
                    "seconds_50_steps": round(dt, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
