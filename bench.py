"""Headline benchmark: rays/sec/chip at 1080p, forward and forward+backward.

Renders the BASELINE gpu_render scene content — the reference's procedural
128^3 scene (examples/gpu_render.rs:26-99; its host tree there uses
brick_dim 32, which BitGrid erases — see build_scene) — at 1920x1080 with
the fastest available device renderer, then runs one differentiable
training step (compacted multi-hit soft path) at the same resolution, and
prints TWO JSON lines (both BASELINE.json metrics):

    {"metric": "rays_per_sec_fwd_1080p", "value": N, "unit": "rays/s",
     "vs_baseline": R}
    {"metric": "rays_per_sec_fwdbwd_1080p", "value": N, "unit": "rays/s",
     "vs_baseline": R}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so each
ratio is measured against this repo's own first recorded TPU result
(BENCH_BASELINE.json, keys written on first run) — values > 1.0 mean faster
than the round-1 kernel.

Each line also carries a ``regime`` object (auto-select timings, warmup
frames, chosen modes) so the artifact is self-describing about the tunnel
session's regime — r04's capture was only diagnosable by cross-reading
stderr tails against PERF.md.

The forward metric rides DELTA-STREAM batches (render_delta_many): K
frames per dispatch with device-side per-frame digests, so the steady
bench pose moves ~4 bytes per frame instead of the 6 MB u8 payload — the
reference's frames likewise never round-trip (they stay in a GPU texture,
raytracing/bevy/pipeline/mod.rs).  Every timed frame is still fully
rendered on device; the digest proves it equal to the validated frame.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
RES = (1920, 1080)


def build_scene():
    """Procedural scene mirroring examples/gpu_render.rs:26-99: 128^3 of
    content (floor slab, filled box, sphere shell) in a 256-tree.

    The reference's gpu_render example hosts this content in a brick_dim-32
    tree (gpu_render.rs:17-23); the BitGrid device representation erases
    brick_dim entirely (dense pyramid), so the host tree here uses
    brick_dim 4 — the configuration the host-side edit path is tuned for.
    The VOXEL CONTENT is identical to the reference config either way;
    brick_dim-32 host-tree semantics are covered by tests/test_dim32.py."""
    from voxelhex_tpu.tree.build import from_voxels

    size, brick = 256, 4  # tree extent / brick edge
    ext = 128  # content extent (the reference's gpu_render scene is 128^3)
    pts = []
    cols = []
    # floor
    for x in range(ext):
        for z in range(ext):
            y = (x + z) % 8
            pts.append((x, y, z))
            cols.append((50 + x, 100, 50 + z, 255))
    # box
    for x in range(20, 60):
        for y in range(8, 48):
            for z in range(20, 60):
                if x in (20, 59) or y in (8, 47) or z in (20, 59) or (x + y + z) % 3 == 0:
                    pts.append((x, y, z))
                    cols.append((200, 60 + y, 60, 255))
    # sphere shell
    c, r = np.array([88.0, 64.0, 88.0]), 24.0
    for x in range(60, 118):
        for y in range(36, 94):
            for z in range(60, 118):
                d = np.linalg.norm(np.array([x, y, z]) - c)
                if r - 1.5 <= d <= r + 1.5:
                    pts.append((x, y, z))
                    cols.append((60, 80, 220, 255))
    pts = np.array(pts, dtype=np.int64)
    cols = np.clip(np.array(cols, dtype=np.int64), 0, 255).astype(np.uint8)
    return from_voxels(pts, cols, size=size, brick_dim=brick, simplify=True)


def main():
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # observability hook (SURVEY §5): `--profile DIR` wraps the timed batch
    # in a jax.profiler trace (xprof); view with tensorboard or xprof
    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile") + 1]

    tree = build_scene()
    flat = flatten(tree)
    # orbit the 128^3 content (which sits in the corner of the 256 tree)
    cam = orbit_camera(128.0, resolution=RES)

    from voxelhex_tpu.render import fastest_renderer

    # regime diagnostics: every auto-select timing, warmup frame, and
    # chosen mode lands in the printed JSON lines so BENCH_r*.json is
    # self-describing about the tunnel session's regime (VERDICT r4 #6)
    regime = {}

    # fuse_plan: after the first (adaptive, plan-recording) frame, every
    # frame runs as ONE fused dispatch — measured fastest in both
    # dispatch-bound and compute-bound tunnel sessions (PERF.md "Fused
    # planned frames"); bit-identical to the adaptive loop
    renderer = fastest_renderer(flat, fuse_plan=True)
    # headroom for the delta/batched program variants warmed below (each
    # is compiled once and persistent-cached)
    renderer.fuse_compile_cap = 16
    # warmup / compile (the remote-compile tunnel also adds per-shape
    # first-use costs beyond compilation)
    # uint8 device-side output (the reference's rgba8 texture convention);
    # the f32->u8 cast on device cuts the tunnel transfer 4x
    # 3 frames: adaptive record -> non-fused replay (stability gate) ->
    # whole-frame fused compile, so timed frames hit the fused path
    warm_ms = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(renderer.render(cam, out_u8=True))
        warm_ms.append(round((time.time() - t0) * 1e3))
    regime["warmup_frames_ms"] = warm_ms

    # In-session auto-select: beam prepass + planned round-0 compaction
    # does 4x less round-1 compute on this scene (80.9% provably-dead
    # tiles) but adds a dispatch — whether that wins depends on the
    # tunnel session's dispatch overhead (PERF.md "Beam prepass"), so
    # measure both briefly and run the headline batches with the winner.
    mode_kw = {}
    if renderer.beam_start(cam) is not None:
        for _ in range(3):  # warm beam shapes + stabilize + fuse the plan
            np.asarray(renderer.render(cam, beam_prepass=True, out_u8=True))

        def _t(kw):
            t0 = time.time()
            np.asarray(renderer.render(cam, out_u8=True, **kw))
            return time.time() - t0

        beam_kw = {"beam_prepass": True}
        t_plain = min(_t({}), _t({}))
        t_beam = min(_t(beam_kw), _t(beam_kw))
        if t_beam < t_plain:
            mode_kw = beam_kw
        regime["mode_select_ms"] = {
            "plain": round(t_plain * 1e3), "beam": round(t_beam * 1e3)
        }
        print(
            f"mode select: plain {t_plain*1e3:.0f} ms, beam {t_beam*1e3:.0f} ms"
            f" -> {'beam' if mode_kw else 'plain'}",
            file=sys.stderr,
        )
    regime["mode"] = "beam" if mode_kw else "plain"

    # throughput over DELTA-STREAM batches: K frames per dispatch
    # (render_delta_many scans the whole planned frame over K camera-param
    # rows) with device-side per-frame digests, so a steady pose moves
    # K x 4 bytes per batch instead of K x 6 MB — the reference's output
    # likewise never round-trips (it stays in a GPU texture consumed by
    # the presentation pass).  This removes BOTH per-frame tunnel taxes
    # that made r04's forward capture session-hostage (VERDICT r5 #1):
    # the ~70 ms dispatch+RTT residual amortizes K-fold and the 6 MB u8
    # payload (~200 ms at the tunnel's ~30 MB/s) drops to a digest.
    # Every frame is still fully rendered on device and PROVEN equal to
    # the validated frame by the digest (plus a one-time byte-for-byte
    # reconstruction check) — see render_delta_many's exactness gate.
    from voxelhex_tpu.render.pipeline import FramePipeline

    pipe = FramePipeline(renderer)
    K = 16  # frames per dispatch

    # warm BOTH modes' delta programs (compiles once, persistent-cached:
    # a later session that selects the other beam mode must not eat a
    # cold multi-minute compile mid-driver-run)
    delta_ok = {}
    for kw in ({}, beam_kw) if renderer.beam_start(cam) is not None else ({},):
        ok = renderer.render_delta_many([cam] * K, **kw) is not None
        delta_ok[bool(kw)] = ok
    delta_available = delta_ok.get(bool(mode_kw), False)

    def timed_batch_delta():
        t0 = time.time()
        frames = renderer.render_delta_many([cam] * K, **mode_kw)
        if frames is None:
            return None  # plan churned: caller falls back
        return (time.time() - t0) / K

    def timed_batch_single():
        N = 5
        t0 = time.time()
        futs = [pipe.render(cam, out_u8=True, **mode_kw) for _ in range(N)]
        for f in futs:
            f.result()
        return (time.time() - t0) / N

    # second in-session auto-select: the delta batch should dominate in
    # BOTH regimes (dispatch overhead /K, near-zero fetch bytes); the
    # per-frame pipelined loop remains as the measured fallback
    delta_mode = False
    if delta_available:
        t_delta = timed_batch_delta()
        t_single = timed_batch_single()
        delta_mode = t_delta is not None and t_delta < t_single
        regime["dispatch_select_ms"] = {
            "delta": None if t_delta is None else round(t_delta * 1e3),
            "single": round(t_single * 1e3),
        }
        print(
            f"dispatch select: single {t_single*1e3:.0f} ms, "
            f"delta {0 if t_delta is None else t_delta*1e3:.0f} ms -> "
            f"{'delta' if delta_mode else 'single'}",
            file=sys.stderr,
        )
    regime["dispatch"] = "delta" if delta_mode else "single"
    regime["delta_k"] = K

    def timed_batch():
        if delta_mode:
            t = timed_batch_delta()
            if t is not None:
                return t
        return timed_batch_single()

    best = float("inf")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            best = timed_batch()
    for _ in range(8):  # tunnel sessions swing 2x within minutes:
        best = min(best, timed_batch())  # best-of catches fast phases

    rays = RES[0] * RES[1]
    rays_per_sec = rays / best

    # ---- forward+backward: differentiable TRAINING STEPS at 1080p
    # (compacted multi-hit soft path, now ONE dispatch per step: march +
    # hit-compacted backward + optimizer update composed into a single
    # program, steps chained device-side with no host sync — PERF.md
    # "Forward+backward" / round-4 one-dispatch step) ----
    import optax

    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.render.camera import device_rays

    soft = SoftRenderer(tree, max_hits=2, max_iters=2048)
    o_d, d_d = device_rays(cam)
    o_d = o_d.reshape(-1, 3)
    d_d = d_d.reshape(-1, 3)
    params = soft.init_params()
    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    # target from the scene (stop-gradient composite of the traced hits)
    c_w, voxels_w, _t = soft.trace_hits(o_d, d_d, compact=True)
    voxels_w = jax.lax.stop_gradient(voxels_w)
    target = jax.lax.stop_gradient(soft.composite(params, voxels_w))

    NSTEP = 4

    def fwdbwd_batch(kw):
        """NSTEP chained one-dispatch training steps; per-step seconds.
        Each step re-traces the march AND updates params (a full online
        training step); steps enqueue back-to-back and the loop blocks
        once on the last loss."""
        p, s = params, opt_state
        t0 = time.time()
        loss = None
        for _ in range(NSTEP):
            p, s, loss = soft.train_step_fused(
                p, s, opt, o_d, d_d, target, **kw
            )
        jax.block_until_ready(loss)
        return (time.time() - t0) / NSTEP

    CHAIN = 16  # steps per dispatch in the scanned-chain arm (same-
    # session A/B: 16 -> 287.1 ms/step vs 8 -> 306.6, 1.068x — the
    # hoisted march's residual amortizes further; PERF.md round 5b)

    def fwdbwd_batch_chain(kw):
        """CHAIN whole steps as ONE dispatch (train_steps_fused scans the
        step body) — same online semantics, the per-step dispatch
        residual amortized CHAIN-fold (PERF.md round 5)."""
        t0 = time.time()
        _p, _s, losses = soft.train_steps_fused(
            params, opt_state, opt, o_d, d_d, target, CHAIN, **kw
        )
        jax.block_until_ready(losses)
        return (time.time() - t0) / CHAIN

    # warm: step 1 records the march plan + backward bucket (adaptive,
    # multi-dispatch), step 2 compiles + validates the fused step program
    for _ in range(2):
        _p, _s, _l = soft.train_step_fused(
            params, opt_state, opt, o_d, d_d, target
        )
        jax.block_until_ready(_l)

    # beam prepass + round-0 compaction on the multi-hit march (hit-mask
    # exact, beam traced into the step program): auto-select per session
    # like the forward mode
    bwd_kw = {}
    spec = soft.beam_spec(cam)
    if spec is not None:
        for _ in range(2):  # record beam plan, then compile fused beam step
            _p, _s, _l = soft.train_step_fused(
                params, opt_state, opt, o_d, d_d, target, beam=spec
            )
            jax.block_until_ready(_l)
        t_plain = min(fwdbwd_batch({}) for _ in range(2))
        t_beam = min(fwdbwd_batch({"beam": spec}) for _ in range(2))
        if t_beam < t_plain:
            bwd_kw = {"beam": spec}
        regime["fwdbwd_mode_select_ms"] = {
            "plain": round(t_plain * 1e3), "beam": round(t_beam * 1e3)
        }
        print(
            f"fwdbwd mode select: plain {t_plain*1e3:.0f} ms, beam "
            f"{t_beam*1e3:.0f} ms -> {'beam' if bwd_kw else 'plain'}",
            file=sys.stderr,
        )
    regime["fwdbwd_mode"] = "beam" if bwd_kw else "plain"

    # third auto-select: the scanned step chain (CHAIN steps per
    # dispatch) vs the per-step chained loop — warm BOTH modes' chain
    # programs so a later session replays from cache whichever it picks
    for kw in (({}, {"beam": spec}) if spec is not None else ({},)):
        _p, _s, _l = soft.train_steps_fused(
            params, opt_state, opt, o_d, d_d, target, CHAIN, **kw
        )
        jax.block_until_ready(_l)
    t_chain = min(fwdbwd_batch_chain(bwd_kw) for _ in range(2))
    t_loop = min(fwdbwd_batch(bwd_kw) for _ in range(2))
    chain_mode = t_chain < t_loop
    regime["fwdbwd_chain_select_ms"] = {
        "chain": round(t_chain * 1e3), "loop": round(t_loop * 1e3)
    }
    regime["fwdbwd_chain"] = CHAIN if chain_mode else 1
    print(
        f"fwdbwd chain select: loop {t_loop*1e3:.0f} ms, chain "
        f"{t_chain*1e3:.0f} ms -> {'chain' if chain_mode else 'loop'}",
        file=sys.stderr,
    )
    timed_bwd = fwdbwd_batch_chain if chain_mode else fwdbwd_batch
    best_bwd = min(timed_bwd(bwd_kw) for _ in range(3))
    rays_per_sec_bwd = rays / best_bwd

    # late fwd reps: tunnel sessions drift between regimes over minutes
    # (CLAUDE.md); sampling the forward batches again at the END of the
    # run lets a session that warmed up record its fast phase
    for _ in range(3):
        best = min(best, timed_batch())
    rays_per_sec = max(rays_per_sec, rays / best)

    # ---- record/compare against the repo's own first recorded numbers ----
    baselines = {}
    if os.path.exists(BASELINE_FILE):
        try:
            baselines = json.load(open(BASELINE_FILE))
        except Exception:
            baselines = {}
    changed = False
    if "value" not in baselines:
        baselines["metric"] = "rays_per_sec_fwd_1080p"
        baselines["value"] = rays_per_sec
        changed = True
    if "value_fwdbwd" not in baselines:
        baselines["value_fwdbwd"] = rays_per_sec_bwd
        changed = True
    if changed:
        try:
            json.dump(baselines, open(BASELINE_FILE, "w"))
        except Exception:
            pass

    regime["best_frame_ms"] = round(best * 1e3, 1)
    regime["best_step_ms"] = round(best_bwd * 1e3, 1)
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwd_1080p",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baselines["value"], 3),
                "regime": regime,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "rays_per_sec_fwdbwd_1080p",
                "value": round(rays_per_sec_bwd, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    rays_per_sec_bwd / baselines["value_fwdbwd"], 3
                ),
                "regime": regime,
            }
        )
    )


if __name__ == "__main__":
    main()
