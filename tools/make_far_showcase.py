"""Render the far-field LOD-ladder showcase image (VERDICT r3 next #5).

A low camera at the streaming-window edge looks across a 1024^3 terrain
with mid-field structure: the window renders full-res, the F=4 MIDFIELD
ring carries the terrain just past the window at the reference's 4x
falloff, and coarser rings carry the horizon — the 4x-per-level ladder
is visible as progressively chunkier (but present) relief instead of
the old 16x jump at the window edge.

    python tools/make_far_showcase.py [--res 1280x720] [--cpu]
      [--out docs/images/far_rings_midfield.png]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WORLD = 2048  # W/S=8: window -> F4 midfield ring -> F16 world ladder
VIEW = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--out", default="docs/images/far_rings_midfield.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    res = tuple(int(v) for v in args.res.split("x"))

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from examples.terrain import build_terrain
    from voxelhex_tpu.render.camera import Camera
    from voxelhex_tpu.render.streaming import StreamingView
    from voxelhex_tpu.utils.png import write_png

    print("building terrain...", file=sys.stderr)
    tree = build_terrain(WORLD, brick_dim=8)  # 2048 = 8 * 4^4
    view = StreamingView(tree, view_size=VIEW, regions_per_update=8192)

    # low camera over the terrain, gazing across the window edge toward
    # the horizon — mid-field relief fills the F=4 ring's band.  The
    # target sits CLOSE to the eye (the pager centers the window on the
    # look-at point), so near ground is full-res and the ladder starts
    # at the window edge.
    eye = np.array([WORLD * 0.25, WORLD * 0.085, WORLD * 0.25])
    aim = np.array([WORLD * 0.55, WORLD * 0.045, WORLD * 0.55])
    d = (aim - eye) / np.linalg.norm(aim - eye)
    tgt = eye + d * 40.0
    cam = Camera(origin=eye, target=tgt, resolution=res, fov_y_deg=60.0)

    # drain paging so the window is fully resident
    for _ in range(50):
        if view.update(np.asarray(cam.target, dtype=np.float64),
                       camera=cam) == 0:
            break
    t0 = time.time()
    frame = np.asarray(view.render(cam, out_u8=True))
    print(f"frame {time.time()-t0:.2f}s; rings: "
          f"{[t.factor for t in view.far.tiers] if view.far else None}",
          file=sys.stderr)
    os.makedirs(os.path.dirname(os.path.join(repo, args.out)), exist_ok=True)
    write_png(os.path.join(repo, args.out), frame)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
