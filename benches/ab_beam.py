"""Same-session A/B: beam prepass at 1080p on the bench scene.

One conservative beam per 8x8 tile over the dilated coarse grid gives every
ray a head start and kills sky tiles before round 1.  Measures interleaved
frame times with/without (and with a shortened first round, which the splat
prepass couldn't afford because sky rays still needed the full march) and
verifies voxel-exactness (identical hit mask + hit voxels) with a ppm-scale
budget for edge-pixel shading divergence (see the parity gate below).

Usage: python benches/ab_beam.py [--frames 4] [--first-iters 8]
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
    ap.add_argument("--first-iters", type=int, default=8)
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

    flat = flatten(build_scene())
    cam = orbit_camera(128.0, resolution=RES)
    r = BitGridRenderer(flat)

    # warm every mode (compiles + first-touch)
    base = np.asarray(r.render(cam, out_u8=True))
    beam = np.asarray(r.render(cam, beam_prepass=True, out_u8=True))
    r.beam_first_iters = args.first_iters
    beam_s = np.asarray(r.render(cam, beam_prepass=True, out_u8=True))
    start_d = r.beam_start(cam)
    if start_d is None:
        print("beam bound unsatisfiable for this camera/scene "
              "(no pyramid level keeps the tile bound valid); nothing to A/B")
        return
    start = np.asarray(start_d)

    # Parity gate: the beam must be VOXEL-exact — identical hit mask and
    # hit voxel for every ray.  The shaded frame is allowed a ppm-scale
    # divergence budget: re-seeding a ray at start_t puts it on a different
    # f32 DDA path, and on edge-grazing pixels the impact point's dominant
    # axis (the normal heuristic, reference cube_impact_normal) can flip in
    # the float low bits — measured 7 / 2.07M pixels at 1080p, all
    # same-voxel shading-only diffs.  The reference marks the same edge
    # cases flaky in its own suite (raytracing/tests.rs:87); SURVEY §7.3
    # prescribes image-level tolerance for exactly this.
    from voxelhex_tpu.render.camera import device_rays
    import jax.numpy as jnp

    o, dv = device_rays(cam)
    bgc = jnp.zeros(3, dtype=jnp.float32)
    h0, _v0, hv0 = r.trace_compacted(o, dv, shade_bg=bgc)[:3]
    hb, _vb, hvb = r.trace_compacted(
        o, dv, start_t=start_d, first_round_iters=args.first_iters,
        shade_bg=bgc)[:3]
    h0, hv0, hb, hvb = (np.asarray(x) for x in (h0, hv0, hb, hvb))
    assert np.array_equal(h0, hb), "beam changed the hit mask"
    vdiff = h0 & np.any(hv0 != hvb, axis=-1)
    vppm = float(vdiff.mean()) * 1e6
    assert vppm <= 10.0, f"{vppm:.1f} ppm hit-voxel divergence"
    if vdiff.any():
        cheb = np.abs(hv0[vdiff].astype(np.int64)
                      - hvb[vdiff].astype(np.int64)).max()
        assert cheb <= 2, f"non-adjacent voxel diff (cheb={cheb})"
    print(f"hit mask exact; {int(vdiff.sum())} edge-grazing rays "
          f"({vppm:.2f} ppm) resolved to an adjacent voxel", flush=True)
    for name, img in (("beam", beam), ("beam8", beam_s)):
        ppm = float(np.any(base != img, axis=-1).mean()) * 1e6
        assert ppm <= 20.0, f"{name}: {ppm:.1f} ppm frame divergence"
        print(f"{name}: frame divergence {ppm:.2f} ppm", flush=True)
    print(f"dead tiles: {(start >= 1e8).mean():.1%}  "
          f"median start: {np.median(start[start < 1e8]):.1f}", flush=True)

    # beamP: beam + planned schedules (auto_plan) — the round-0 compaction
    # bucket rides the plan, so a planned beam frame has ZERO blocking host
    # reads before the schedule's one batched count fetch.  Separate
    # renderer instance (plans are per-instance); warm twice: the first
    # frame records the plan, the second replays it.
    rp = BitGridRenderer(flat, auto_plan=True)
    beam_p = np.asarray(rp.render(cam, beam_prepass=True, out_u8=True))
    ppm = float(np.any(base != beam_p, axis=-1).mean()) * 1e6
    assert ppm <= 20.0, f"beamP: {ppm:.1f} ppm frame divergence"
    beam_p2 = np.asarray(rp.render(cam, beam_prepass=True, out_u8=True))
    assert np.array_equal(beam_p, beam_p2), "planned beam differs from adaptive beam"
    print(f"beamP: frame divergence {ppm:.2f} ppm; planned == adaptive",
          flush=True)

    # offF/beamF: fused planned frames — the whole schedule (init, round-0
    # compaction, rounds, compactions, shade) as ONE dispatch
    rf = BitGridRenderer(flat, fuse_plan=True)
    off_f = np.asarray(rf.render(cam, out_u8=True))       # records plan
    off_f2 = np.asarray(rf.render(cam, out_u8=True))      # fused replay
    assert np.array_equal(off_f, base) and np.array_equal(off_f2, base), \
        "fused plain frame differs"
    assert rf.last_stats.get("fused")
    beam_f = np.asarray(rf.render(cam, beam_prepass=True, out_u8=True))
    beam_f2 = np.asarray(rf.render(cam, beam_prepass=True, out_u8=True))
    assert np.array_equal(beam_f, beam_p) and np.array_equal(beam_f2, beam_p), \
        "fused beam frame differs from planned beam"
    assert rf.last_stats.get("fused") and rf.last_stats["pre"] is not None
    print("offF/beamF fused frames bit-identical to their planned frames",
          flush=True)

    def frame(mode):
        t0 = time.time()
        if mode == "off":
            r.beam_first_iters = None
            np.asarray(r.render(cam, out_u8=True))
        elif mode == "beam":
            r.beam_first_iters = None
            np.asarray(r.render(cam, beam_prepass=True, out_u8=True))
        elif mode == "beamP":
            np.asarray(rp.render(cam, beam_prepass=True, out_u8=True))
        elif mode == "offF":
            np.asarray(rf.render(cam, out_u8=True))
        elif mode == "beamF":
            np.asarray(rf.render(cam, beam_prepass=True, out_u8=True))
        else:
            r.beam_first_iters = args.first_iters
            np.asarray(r.render(cam, beam_prepass=True, out_u8=True))
        dt = time.time() - t0
        stats = {"beamP": rp.last_stats, "offF": rf.last_stats,
                 "beamF": rf.last_stats}.get(mode, r.last_stats)
        rounds = [(rd["bucket"], rd["iters"], rd["n_active"]) for rd in stats["rounds"]]
        pre = stats.get("pre")
        ptxt = (f" pre={pre['n_alive']}→{pre['bucket']}" if pre else "")
        print(f"{mode:6s}: {dt*1000:7.1f} ms {ptxt} rounds={rounds}", flush=True)
        return dt

    modes = ("off", "beam", "beamP", "offF", "beamF")
    results = {m: [] for m in modes}
    for _ in range(args.frames):
        for mode in modes:
            results[mode].append(frame(mode))
    for mode, ts in results.items():
        print(f"{mode:6s}: best {min(ts)*1000:7.1f} ms  "
              f"avg {np.mean(ts)*1000:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
