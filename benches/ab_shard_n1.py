"""Same-session n=1 A/B: the mesh-sharded programs on the REAL chip.

Multi-chip hardware does not exist behind the axon tunnel, but a 1-device
``jax.sharding.Mesh`` runs the FULL shard_map programs (per-shard device
raygen, planned compacted march, pmean collectives degenerate to identity)
on real TPU — the only hardware evidence available for the scaling story
(VERDICT r5 #2), and it prices the shard_map/planned-march overhead
directly against the fused single-chip equivalents:

  render: fused one-dispatch frame  vs  sharded_render_planned_fn (n=1)
  train:  train_step_fused          vs  sharded_soft_train_step_e2e (n=1,
                                        planned)

Both sides block on device values only (no frame fetch) so the comparison
isolates program overhead, not transfer.  Target: sharded overhead <= ~5%
(the mesh program is the same math + shard bookkeeping).

    python benches/ab_shard_n1.py          # 1080p, both A/Bs
    python benches/ab_shard_n1.py --res 1280x720
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = (1920, 1080)


def main():
    global RES
    if "--res" in sys.argv:
        w, h = sys.argv[sys.argv.index("--res") + 1].split("x")
        RES = (int(w), int(h))
    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from bench import build_scene
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.bitgrid_sharded import (
        record_render_shard_plan,
        sharded_render_planned_fn,
    )
    from voxelhex_tpu.parallel.soft import (
        record_shard_plan,
        sharded_soft_train_step_e2e,
        validate_shard_counts,
    )
    from voxelhex_tpu.render import fastest_renderer
    from voxelhex_tpu.render.camera import (
        camera_params,
        device_rays,
        orbit_camera,
    )
    from voxelhex_tpu.tree.flat import flatten

    tree = build_scene()
    flat = flatten(tree)
    cam = orbit_camera(128.0, resolution=RES)
    rays = RES[0] * RES[1]
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("rays",))
    bg = jnp.zeros(3, dtype=jnp.float32)

    # ---------------- RENDER A/B ----------------
    r = fastest_renderer(flat, fuse_plan=True)
    for _ in range(3):  # record + stabilize + fuse
        np.asarray(r.render(cam, out_u8=True))

    def t_fused():
        out = r.render(cam, out_u8=True, out_device=True)
        jax.block_until_ready(out)

    def best_of(fn, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_fused()  # ensure pose-validated (no counts read in steady state)
    best_f = best_of(t_fused)

    plan = record_render_shard_plan(r, cam, mesh1)
    assert plan is not None, "shard plan did not record"
    fn = sharded_render_planned_fn(r, mesh1, RES, plan)
    cp = camera_params(cam)
    rgb, counts = fn(r.tree, *cp, bg)  # compile + validate once
    assert validate_shard_counts(counts, plan, 1), "n=1 plan overflowed"
    jax.block_until_ready(rgb)
    # parity while we're here: n=1 sharded frame == fused frame pixels
    # (compare in u8 so no second single-chip program has to compile:
    # identical f32 math implies identical quantization)
    ref_u8 = np.asarray(r.render(cam, out_u8=True)).reshape(-1, 3)
    got_u8 = np.clip(
        np.round(np.asarray(rgb).reshape(-1, 3) * 255.0), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(
        got_u8, ref_u8,
        err_msg="n=1 sharded planned frame diverged from the fused frame",
    )

    def t_shard():
        out, _c = fn(r.tree, *cp, bg)
        jax.block_until_ready(out)

    t_shard()
    best_s = best_of(t_shard)
    print(json.dumps({
        "metric": "shard_n1_render_overhead",
        "fused_ms": round(best_f * 1e3, 1),
        "sharded_ms": round(best_s * 1e3, 1),
        "overhead": round(best_s / best_f - 1.0, 4),
        "res": list(RES),
        "rays_per_sec_sharded": round(rays / best_s, 1),
    }))

    # ---------------- TRAIN-STEP A/B ----------------
    soft = SoftRenderer(tree, max_hits=2, max_iters=2048)
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    params = soft.init_params()
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    _c, voxels, _t = soft.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        soft.composite(params, jax.lax.stop_gradient(voxels))
    )
    for _ in range(2):  # record + compile/validate the fused step
        _p, _s, _l = soft.train_step_fused(params, opt_state, opt, o, d,
                                           target)
        jax.block_until_ready(_l)
    NSTEP = 4

    def t_step_fused():
        p, s = params, opt_state
        t0 = time.time()
        loss = None
        for _ in range(NSTEP):
            p, s, loss = soft.train_step_fused(p, s, opt, o, d, target)
        jax.block_until_ready(loss)
        return (time.time() - t0) / NSTEP

    best_tf = min(t_step_fused() for _ in range(3))

    splan = record_shard_plan(soft, cam, mesh1)
    assert splan is not None, "soft shard plan did not record"
    estep = sharded_soft_train_step_e2e(soft, mesh1, opt, RES, plan=splan)
    p, s, loss, counts = estep(soft.tree, params, opt_state, *cp, target)
    assert validate_shard_counts(counts, splan, 1), "n=1 soft plan overflow"
    jax.block_until_ready(loss)

    def t_step_shard():
        p, s = params, opt_state
        t0 = time.time()
        loss = None
        for _ in range(NSTEP):
            p, s, loss, _c2 = estep(soft.tree, p, s, *cp, target)
        jax.block_until_ready(loss)
        return (time.time() - t0) / NSTEP

    best_ts = min(t_step_shard() for _ in range(3))
    print(json.dumps({
        "metric": "shard_n1_train_step_overhead",
        "fused_ms": round(best_tf * 1e3, 1),
        "sharded_ms": round(best_ts * 1e3, 1),
        "overhead": round(best_ts / best_tf - 1.0, 4),
        "res": list(RES),
        "rays_per_sec_sharded": round(rays / best_ts, 1),
    }))


if __name__ == "__main__":
    main()
