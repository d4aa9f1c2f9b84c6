"""Same-session A/B: streaming region upload wire format.

Old wire: host-built int64 address arrays + payload (~41 KB/region — the
indices are 4x the payload).  New wire: 12-byte region corner + payload
(~8.7 KB/region); addresses and the coarse pyramid levels are derived ON
DEVICE.  A camera flying over a large terrain pages a slab of regions every
frame, so the format shows up directly in frame time through the ~30 MB/s
host link.

Run: python benches/ab_region_wire.py  (TPU; ~minutes after warm cache)
"""

import os
import sys
import time
from types import MethodType

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

WORLD = 1024
VIEW = 256
RES = (1280, 720)
FRAMES = 8


def legacy_update_device_partial(self, regions):
    """The pre-corner-wire delta path: ships host-built index arrays and
    the coarse pyramid words (kept here for the A/B)."""
    import jax.numpy as jnp

    from voxelhex_tpu.render.bitgrid import _pack_bits

    S = self.view_size
    bg = self.renderer.bitgrid
    tree_dev = self.renderer.tree
    nb = S // 4
    from voxelhex_tpu.render.streaming import REGION

    target = 1
    while target < len(regions):
        target *= 2
    regions = list(regions) + [regions[0]] * (target - len(regions))

    col_idx, col_val, blk_idx, blk_val = [], [], [], []
    for region in regions:
        x0, y0, z0 = (int(c) * REGION for c in region)
        sub_occ = self._occ[x0:x0 + REGION, y0:y0 + REGION, z0:z0 + REGION]
        sub_col = self._col[x0:x0 + REGION, y0:y0 + REGION, z0:z0 + REGION]
        xs = np.arange(x0, x0 + REGION)
        ys = np.arange(y0, y0 + REGION)
        zs = np.arange(z0, z0 + REGION)
        ax = xs[:, None, None] + ys[None, :, None] * S + zs[None, None, :] * S * S
        col_idx.append(ax.ravel())
        col_val.append(sub_col.ravel())
        lo, hi, _ = _pack_bits(sub_occ)
        n = REGION // 4
        bx = np.arange(x0 // 4, x0 // 4 + n)
        by = np.arange(y0 // 4, y0 // 4 + n)
        bz = np.arange(z0 // 4, z0 // 4 + n)
        ab = bx[:, None, None] + by[None, :, None] * nb + bz[None, None, :] * nb * nb
        blk_idx.append(ab.transpose(2, 1, 0).ravel())
        blk_val.append(np.stack([lo, hi], axis=1))
        bg.occ_lo[ab.transpose(2, 1, 0).ravel()] = lo
        bg.occ_hi[ab.transpose(2, 1, 0).ravel()] = hi

    col_idx = np.concatenate(col_idx)
    col_val = np.concatenate(col_val)
    blk_idx = np.concatenate(blk_idx)
    blk_val = np.concatenate(blk_val)
    bg.colors[col_idx] = col_val

    n0 = nb
    coarse0 = ((bg.occ_lo[:n0**3] | bg.occ_hi[:n0**3]) != 0).reshape(
        n0, n0, n0).transpose(2, 1, 0)
    levels_lo = [bg.occ_lo[:n0**3]]
    levels_hi = [bg.occ_hi[:n0**3]]
    grid = coarse0
    while grid.shape[0] > 1:
        lo, hi, coarse = _pack_bits(grid)
        levels_lo.append(lo)
        levels_hi.append(hi)
        grid = coarse
    bg.occ_lo = np.concatenate(levels_lo)
    bg.occ_hi = np.concatenate(levels_hi)

    n_colors = len(self.tree.color_palette)
    if n_colors > bg.palette.shape[0]:
        self._rebuild_device()
        return
    if n_colors != getattr(self, "_dev_palette_count", -1):
        for i, c in enumerate(self.tree.color_palette):
            bg.palette[i] = [c.r / 255.0, c.g / 255.0, c.b / 255.0, c.a / 255.0]
        tree_dev["palette"] = jnp.asarray(bg.palette)
        self._dev_palette_count = n_colors

    occ_pairs = tree_dev["occ_pairs"]
    occ_pairs = occ_pairs.at[jnp.asarray(blk_idx)].set(
        jnp.asarray(blk_val.astype(np.uint32)))
    base1 = n0**3
    coarse_pairs = np.stack(
        [bg.occ_lo[base1:], bg.occ_hi[base1:]], axis=1).astype(np.uint32)
    occ_pairs = occ_pairs.at[base1:].set(jnp.asarray(coarse_pairs))
    tree_dev["occ_pairs"] = occ_pairs
    self._refresh_quads(tree_dev)
    tree_dev["colors"] = tree_dev["colors"].at[jnp.asarray(col_idx)].set(
        jnp.asarray(col_val))


def fly(tree, legacy: bool):
    from voxelhex_tpu.render.camera import Camera
    from voxelhex_tpu.render.streaming import StreamingView

    view = StreamingView(tree, view_size=VIEW, regions_per_update=8192)
    if legacy:
        view._update_device_partial = MethodType(
            legacy_update_device_partial, view)
    times = []
    img = None
    for i in range(FRAMES):
        t = i / max(FRAMES - 1, 1)
        cx = WORLD * (0.2 + 0.6 * t)
        cz = WORLD * 0.4
        eye = np.array([cx - 80.0, WORLD * 0.12, cz - 120.0])
        tgt = np.array([cx, WORLD * 0.05, cz])
        cam = Camera(origin=eye, target=tgt, resolution=RES, fov_y_deg=55.0)
        t0 = time.time()
        img = np.asarray(view.render(cam, out_u8=True))
        times.append(time.time() - t0)
    return times, img


def main():
    from examples.terrain import build_terrain

    tree = build_terrain(WORLD)

    # warm both paths (compiles + first-window rebuild)
    fly(tree, legacy=True)
    fly(tree, legacy=False)

    results = {}
    imgs = {}
    for label, legacy in (("legacy", True), ("corner-wire", False),
                          ("legacy2", True), ("corner-wire2", False)):
        times, img = fly(tree, legacy)
        steady = times[1:]  # frame 0 is the full-window rebuild
        results[label] = sum(steady) / len(steady)
        imgs[label] = img
        print(f"{label:12s}: {results[label]*1000:7.1f} ms/frame  "
              f"[{' '.join(f'{t*1000:.0f}' for t in times)}]")

    np.testing.assert_array_equal(imgs["legacy"], imgs["corner-wire"])
    print("bit-exact: OK")
    a = (results["legacy"] + results["legacy2"]) / 2
    b = (results["corner-wire"] + results["corner-wire2"]) / 2
    print(f"corner-wire vs legacy: {a/b:.3f}x  ({a*1000:.0f} -> {b*1000:.0f} ms)")


if __name__ == "__main__":
    main()
