"""Mixed-resolution rendering demo (BASELINE config #3).

Builds a detailed scene, enables tree MIPs with a per-level strategy
(reference: src/boxtree/mipmap.rs), and renders it three ways:

  * full resolution (every ray descends to voxels),
  * distance-based LOD (`render_lod`): rays stop at a pyramid level whose
    cells subtend ~1/lod_scale of their distance and shade from per-level
    MIP color grids — far geometry renders from coarse averaged colors
    exactly like the reference's MIP-brick probes,
  * streaming placeholder LOD: a paged view whose not-yet-resident regions
    render as coarse MIP-colored blocks (`probe_MIP` parity,
    viewport_render.wgsl:328-364).

Usage: python examples/mixed_lod.py [--cpu] [--res 960x540]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scene(size=256, brick=4):
    """Checkered towers marching into the distance + a striped floor."""
    from voxelhex_tpu.tree.build import from_voxels

    pts, cols = [], []
    for x in range(size):
        for z in range(size):
            if (x // 8 + z // 8) % 2 == 0:
                pts.append((x, 0, z))
                cols.append((60 + (x * 195) // size, 120, 60 + (z * 195) // size, 255))
    rng = np.random.default_rng(7)
    for i in range(24):
        tx = int(rng.integers(8, size - 16))
        tz = int(rng.integers(8, size - 16))
        h = int(rng.integers(12, 48))
        base = rng.integers(80, 255, 3)
        for y in range(1, h):
            for dx in range(6):
                for dz in range(6):
                    if (dx + dz + y) % 2 == 0:
                        pts.append((tx + dx, y, tz + dz))
                        c = (base * (0.6 + 0.4 * y / h)).astype(int)
                        cols.append((c[0], c[1], c[2], 255))
    pts = np.array(pts, dtype=np.int64)
    cols = np.array(cols, dtype=np.uint8)
    print(f"scene voxels: {len(pts):,}")
    return from_voxels(pts, cols, size=size, brick_dim=brick, simplify=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--res", default="960x540")
    ap.add_argument("--lod-scale", type=float, default=0.25)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from voxelhex_tpu.render.bitgrid import BitGridRenderer, build_mip_colors
    from voxelhex_tpu.render.camera import Camera
    from voxelhex_tpu.render.streaming import StreamingView
    from voxelhex_tpu.tree.mipmap import POSTERIZE, MIPStrategy, enable_mips
    from voxelhex_tpu.utils.png import write_png

    w, h = (int(v) for v in args.res.split("x"))
    tree = build_scene()

    # tree-side MIPs with a per-level strategy (the reference default:
    # Posterize at level 1, BoxFilter above, mipmap.rs:350-363)
    strat = MIPStrategy(enabled=True).set_method(1, POSTERIZE, 0.05)
    t0 = time.time()
    enable_mips(tree, strat)
    print(f"tree MIPs built in {time.time()-t0:.1f}s "
          f"(root mip present: {tree.node(tree.ROOT).mip is not None})")

    cam = Camera(origin=(-40.0, 60.0, -40.0), target=(128.0, 8.0, 128.0),
                 resolution=(w, h), fov_y_deg=55.0)

    r = BitGridRenderer(tree)
    build_mip_colors(r.bitgrid)
    for label, fn in (
        ("full", lambda: r.render(cam)),
        ("lod", lambda: r.render_lod(cam, lod_scale=args.lod_scale)),
    ):
        fn()  # warm/compile
        t0 = time.time()
        img = fn()
        dt = time.time() - t0
        write_png(f"mixed_{label}.png", img)
        print(f"{label:5s}: {dt*1000:7.1f} ms  ({w*h/dt/1e6:.2f} Mrays/s)"
              f"  -> mixed_{label}.png")

    # streaming placeholder LOD: a budget too small to page everything in
    # one update leaves pending regions rendering as coarse MIP blocks
    view = StreamingView(tree, view_size=256, regions_per_update=48)
    img = view.render(cam)
    write_png("mixed_streaming_placeholder.png", img)
    print(f"streaming placeholder shot: {len(view._placeholder)} regions "
          f"still coarse -> mixed_streaming_placeholder.png")


if __name__ == "__main__":
    main()
