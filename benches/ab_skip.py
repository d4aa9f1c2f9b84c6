"""Same-session A/B: stack automaton vs fused-hierarchy skip tracer.

The skip tracer (bitgrid.make_skip_tracer) widens the per-iteration row
fetch to carry ALL ancestor occupancy words (width is flat-cost to 32 u32,
PERF.md), collapsing the automaton's DESCEND/ASCEND fetch chains into one
fetch per move — rays finish in far fewer fetch-iterations (CPU probe:
stragglers after round 1 drop 8058 -> 1610 on the bench scene).  Sweeps
skip_substeps and the first-round length.

Run: python benches/ab_skip.py [--frames 4] [--res 1920x1080] [--cpu]
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
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    res = tuple(int(v) for v in args.res.split("x"))

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_scene
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    flat = flatten(build_scene())
    cam = orbit_camera(128.0, resolution=res)

    variants = [
        ("stack", dict()),
        ("skip-s2", dict(tracer="skip", skip_substeps=2)),
        ("skip-s3", dict(tracer="skip", skip_substeps=3)),
        ("skip-s4", dict(tracer="skip", skip_substeps=4)),
    ]
    renderers = {}
    base = None
    for name, kw in variants:
        r = BitGridRenderer(flat, **kw)
        renderers[name] = r
        f = np.asarray(r.render(cam, out_u8=True))  # warm + parity
        if base is None:
            base = f
        else:
            assert np.array_equal(base, f), f"{name} not bit-exact"
    print("all variants bit-exact", flush=True)

    def frame(r, **kw):
        t0 = time.time()
        np.asarray(r.render(cam, out_u8=True, **kw))
        return time.time() - t0

    sums = {name: 0.0 for name, _ in variants}
    for i in range(args.frames):
        for name, _ in variants:
            dt = frame(renderers[name])
            sums[name] += dt
            st = renderers[name].last_stats
            print(f"[{i}] {name:8s}: {dt*1000:6.0f} ms  "
                  f"rounds={[(rd['bucket'], rd['iters'], rd['n_active']) for rd in st['rounds']]}",
                  flush=True)
    print()
    for name, _ in variants:
        print(f"{name:8s}: {sums[name]/args.frames*1000:7.1f} ms/frame "
              f"({res[0]*res[1]/(sums[name]/args.frames)/1e6:.2f} Mrays/s)")

    # first-round-length sweep on the best skip variant
    best = min((s for n, s in sums.items() if n.startswith("skip")), default=None)
    name = [n for n, s in sums.items() if s == best][0]
    r = renderers[name]
    from voxelhex_tpu.render.camera import device_rays

    o, d = device_rays(cam)
    import jax.numpy as jnp

    bgc = jnp.zeros(3, dtype=jnp.float32)
    for fr in (6, 8, 10, 14):
        np.asarray(r.trace_compacted(o, d, shade_bg=bgc, round_iters=fr)[5])  # warm
        t0 = time.time()
        for _ in range(2):
            np.asarray(r.trace_compacted(o, d, shade_bg=bgc, round_iters=fr)[5])
        print(f"{name} round_iters={fr:2d}: {(time.time()-t0)/2*1000:7.1f} ms/trace")


if __name__ == "__main__":
    main()
