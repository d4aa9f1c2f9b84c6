"""Same-session A/B: adaptive per-round host syncs vs planned schedules.

The adaptive compaction loop blocks on each round's straggler count to size
the next bucket — one relay round-trip (~30-50 ms through the axon tunnel)
per round.  auto_plan replays the previous frame's (iters, bucket) schedule
with ONE batched count fetch per frame instead.  Results are bit-exact
(checked here too).

Run: python benches/ab_planned.py  (TPU; ~minutes after warm cache)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

RES = (1920, 1080)
FRAMES = 6


def main():
    from bench import build_scene
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    flat = flatten(build_scene())
    cam = orbit_camera(128.0, resolution=RES)
    r = BitGridRenderer(flat)

    import jax.numpy as jnp

    def frames(auto_plan, n=FRAMES):
        r.auto_plan = auto_plan
        if not auto_plan:
            r._plans.clear()
        times = []
        img = None
        for _ in range(n):
            t0 = time.time()
            img = r.render(cam, out_u8=True)
            times.append(time.time() - t0)
        return times, img

    # warm all shapes (adaptive walks the ladder; planned reuses it)
    frames(False, n=2)
    frames(True, n=2)

    results = {}
    imgs = {}
    for label, flag in (("adaptive", False), ("planned", True),
                        ("adaptive2", False), ("planned2", True)):
        times, img = frames(flag)
        steady = times[1:]
        results[label] = sum(steady) / len(steady)
        imgs[label] = np.asarray(img)
        print(f"{label:10s}: {results[label]*1000:7.1f} ms/frame "
              f"({RES[0]*RES[1]/results[label]/1e6:.2f} Mrays/s)  "
              f"[{' '.join(f'{t*1000:.0f}' for t in times)}]")

    np.testing.assert_array_equal(imgs["adaptive"], imgs["planned"])
    print("bit-exact: OK")
    a = (results["adaptive"] + results["adaptive2"]) / 2
    p = (results["planned"] + results["planned2"]) / 2
    print(f"planned vs adaptive: {a/p:.3f}x  ({a*1000:.1f} -> {p*1000:.1f} ms)")


if __name__ == "__main__":
    main()
