"""Same-session A/B: terrain fly-over frame cost (VERDICT r1 next #7).

A camera flying over a 1024^3 terrain pages a slab of regions every frame;
round 1 measured 4.32 s/frame at 720p with paging dominating ~8x over the
stationary frame cost.  This bench A/Bs the round-2 levers in ONE session:

* ``sync``      — round-1 configuration (synchronous rasterization,
                  no far field): the baseline to beat
* ``async``     — worker-thread region rasterization overlapped with the
                  render (round 4: chunked one-native-call rasterize+pack
                  jobs — the round-3 per-region form measured 2.2x WORSE
                  than sync from GIL/numpy contention)
* ``far``       — far-field LOD rings on top (adds coarse ring traces;
                  not bit-comparable — it renders MORE content)
* ``far+afar``  — far rings with the refresh OFF the render path
                  (async_far: worker builds, render-thread swap)

Steady-state equivalence: after draining all paging at the final camera,
sync and async must produce identical frames.

Run: python benches/ab_flyover.py [--frames 8] [--res 1280x720] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WORLD = 1024
VIEW = 256


def flight_cam(i, frames, res):
    from voxelhex_tpu.render.camera import Camera

    t = i / max(frames - 1, 1)
    cx = WORLD * (0.2 + 0.6 * t)
    cz = WORLD * 0.4
    eye = np.array([cx - 80.0, WORLD * 0.12, cz - 120.0])
    tgt = np.array([cx, WORLD * 0.05, cz])
    return Camera(origin=eye, target=tgt, resolution=res, fov_y_deg=55.0)


def fly(tree, res, frames, *, async_uploads, far_field, fuse_plan=False,
        async_far=False):
    from voxelhex_tpu.render.streaming import StreamingView

    view = StreamingView(
        tree, view_size=VIEW, regions_per_update=8192,
        async_uploads=async_uploads, far_field=far_field,
        fuse_plan=fuse_plan, async_far=async_far,
    )
    times = []
    for i in range(frames):
        cam = flight_cam(i, frames, res)
        t0 = time.time()
        view.render(cam, out_u8=True)
        times.append(time.time() - t0)
    # steady-state frame: drain all paging at the final camera, then render
    cam = flight_cam(frames - 1, frames, res)
    for _ in range(200):
        if view.update(np.asarray(cam.target, dtype=np.float64),
                       camera=cam) == 0 and not view._inflight:
            break
    if view.far is not None and view.async_far:
        # drain the async ring build so the steady frame is current
        for _ in range(50):
            view.render(cam, out_u8=True)
            job = view.far._job
            if job is None:
                break
            job[0].result()
    final = np.asarray(view.render(cam, out_u8=True))
    view.close()
    return times, final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    res = tuple(int(v) for v in args.res.split("x"))

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from examples.terrain import build_terrain

    tree = build_terrain(WORLD)

    variants = [
        ("sync", dict(async_uploads=False, far_field=False)),
        ("async", dict(async_uploads=True, far_field=False)),
        ("far", dict(async_uploads=False, far_field=True)),
        ("far+afar", dict(async_uploads=False, far_field=True,
                          async_far=True)),
    ]
    # warm every variant (compiles, first-window rebuild)
    for _name, kw in variants:
        fly(tree, res, 2, **kw)

    finals = {}
    # interleave two passes per variant for session-variance robustness
    sums = {name: [] for name, _ in variants}
    for _rep in range(2):
        for name, kw in variants:
            times, final = fly(tree, res, args.frames, **kw)
            steady = times[1:]
            per = sum(steady) / len(steady)
            sums[name].append(per)
            finals[name] = final
            print(f"{name:10s}: {per*1000:7.0f} ms/frame  "
                  f"[{' '.join(f'{t*1000:.0f}' for t in times)}]", flush=True)

    np.testing.assert_array_equal(finals["sync"], finals["async"])
    print("steady-state sync == async: bit-exact OK")
    np.testing.assert_array_equal(finals["far"], finals["far+afar"])
    print("steady-state far == far+afar (drained): bit-exact OK")
    for name, vals in sums.items():
        print(f"{name:10s}: avg {np.mean(vals)*1000:.0f} ms/frame")


if __name__ == "__main__":
    main()
