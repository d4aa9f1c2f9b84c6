"""Property-based bound on beam-prepass divergence (VERDICT r4 weak #4).

The beam prepass is hit-mask exact by construction (the dilated-grid
start is a provable lower bound on every tile ray's first hit), but f32
edge-grazing rays re-seeded at the beam start can resolve to an ADJACENT
voxel — measured at 2.4-11 ppm on curated scenes (PERF.md "Beam
prepass").  The fixed-seed parity tests pin exactness on those seeds;
nothing stopped a dilation-rule regression from growing the divergence
silently while the seeds stayed green.  This file fuzzes the bound:

- randomized scenes x cameras (dense-ish and sparse): total beam-vs-plain
  pixel divergence across all trials stays under the documented
  ppm scale, and EVERY divergent pixel lies in the edge zone (its 3x3
  plain-frame neighborhood is non-uniform — an occlusion/voxel boundary);
  pixels in flat regions must agree exactly.
- the streaming-window variant under the same bound.
- the dilation rule itself is pinned against an independent numpy
  reconstruction (any weakening of the 3^3 dilation or the border ring
  breaks conservativeness — the source of exactness).
"""

import numpy as np
import pytest

from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.camera import orbit_camera
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

# documented divergence is ppm-scale (2.4-11 ppm measured); bound the fuzz
# at 64 ppm of all compared pixels — loose enough for f32 luck across
# random scenes, tight enough that a dilation regression (which flips
# whole tiles) fails immediately
PPM_BOUND = 64


def _random_scene(rng, size=64):
    tree = BoxTree(size, 4, auto_simplify=False)
    kind = rng.integers(0, 3)
    if kind == 0:  # scattered random voxels
        n = int(rng.integers(size, size * size))
        for _ in range(n):
            p = tuple(int(v) for v in rng.integers(0, size, 3))
            c = Albedo(int(rng.integers(30, 255)), int(rng.integers(30, 255)),
                       int(rng.integers(30, 255)), 255)
            tree.insert(p, c)
    elif kind == 1:  # solid blobs in a mostly-empty world (sky-heavy)
        for _ in range(int(rng.integers(1, 4))):
            base = rng.integers(0, size - 12, 3)
            ext = int(rng.integers(4, 12))
            tree.insert_at_lod(tuple(int(v) for v in base), ext,
                               Albedo(int(rng.integers(60, 255)), 80, 120,
                                      255))
    else:  # terrain-ish heightfield
        hmax = int(rng.integers(4, size // 2))
        for x in range(0, size, 1):
            for z in range(0, size, 1):
                y = int((np.sin(x * 0.3) + np.cos(z * 0.2)) * hmax / 4
                        + hmax / 2)
                tree.insert((x, max(y, 0), z),
                            Albedo(50 + 3 * (x % 50), 150, 50 + 3 * (z % 50),
                                   255))
    return tree


def _random_camera(rng, size, res=(160, 120)):
    return orbit_camera(
        float(size),
        yaw_deg=float(rng.uniform(0, 360)),
        pitch_deg=float(rng.uniform(5, 60)),
        distance_factor=float(rng.uniform(0.8, 2.5)),
        resolution=res,
    )


def _edge_zone_ok(plain, divergent_yx):
    """Every divergent pixel must sit where the plain frame has local
    structure: a 3x3 neighborhood with more than one distinct color.
    A divergence in a FLAT region (sky interior, face interior) is a real
    correctness bug, not f32 edge grazing."""
    h, w, _ = plain.shape
    for y, x in divergent_yx:
        y0, y1 = max(y - 1, 0), min(y + 2, h)
        x0, x1 = max(x - 1, 0), min(x + 2, w)
        patch = plain[y0:y1, x0:x1].reshape(-1, 3)
        if np.unique(patch, axis=0).shape[0] <= 1:
            return False, (y, x)
    return True, None


def test_beam_divergence_fuzz_bounded():
    rng = np.random.default_rng(2026)
    total_px = 0
    total_div = 0
    trials = 10
    done = 0
    for trial in range(trials * 3):  # allow beam-declined trials to skip
        if done >= trials:
            break
        tree = _random_scene(rng)
        r = BitGridRenderer(tree)
        cam = _random_camera(rng, 64)
        if r.beam_start(cam) is None:
            continue
        plain = r.render(cam, out_u8=True)
        beam = r.render(cam, beam_prepass=True, out_u8=True)
        diff = np.any(plain != beam, axis=-1)
        total_px += diff.size
        total_div += int(diff.sum())
        ok, where = _edge_zone_ok(plain, np.argwhere(diff))
        assert ok, (
            f"trial {trial}: beam diverged in a FLAT region at {where} "
            f"(not f32 edge grazing — dilation/start-bound regression?)"
        )
        done += 1
    assert done >= trials // 2, "too few beam-eligible trials"
    ppm = total_div / max(total_px, 1) * 1e6
    assert ppm <= PPM_BOUND, (
        f"beam divergence {ppm:.1f} ppm over {total_px} px exceeds the "
        f"documented ppm-scale bound ({PPM_BOUND})"
    )


def test_beam_divergence_fuzz_streaming_window():
    """Same bound through StreamingView(beam_prepass=True): the windowed
    beam grid re-derives per content change and must stay within the
    edge-zone ppm budget on randomized windows/cameras."""
    from voxelhex_tpu.render.camera import Camera
    from voxelhex_tpu.render.streaming import StreamingView

    rng = np.random.default_rng(7)
    total_px = 0
    total_div = 0
    for trial in range(3):
        size = 256
        tree = BoxTree(size, 4, auto_simplify=False)
        for _ in range(3):
            base = rng.integers(20, size - 40, 3)
            tree.insert_at_lod(tuple(int(v) for v in base),
                               int(rng.integers(8, 24)),
                               Albedo(int(rng.integers(60, 255)),
                                      int(rng.integers(60, 255)), 120, 255))
        center = np.array([float(base[0]), float(base[1]), float(base[2])])
        v1 = StreamingView(tree, view_size=64, regions_per_update=4096,
                           far_field=False)
        v2 = StreamingView(tree, view_size=64, regions_per_update=4096,
                           far_field=False, beam_prepass=True)
        cam = Camera(
            origin=(center + np.array([30.0, 25.0, 30.0])).astype(np.float32),
            target=center.astype(np.float32),
            up=np.array([0.0, 1.0, 0.0], dtype=np.float32),
            fov_y_deg=55.0,
            resolution=(96, 72),
        )
        plain = np.asarray(v1.render(cam, out_u8=True))
        beam = np.asarray(v2.render(cam, out_u8=True))
        diff = np.any(plain != beam, axis=-1)
        total_px += diff.size
        total_div += int(diff.sum())
        ok, where = _edge_zone_ok(plain, np.argwhere(diff))
        assert ok, f"streaming trial {trial}: flat-region divergence at {where}"
    ppm = total_div / max(total_px, 1) * 1e6
    assert ppm <= PPM_BOUND, f"streaming beam divergence {ppm:.1f} ppm"


def test_beam_dilation_rule_pinned():
    """The beam grid must be EXACTLY the 3^3 dilation of the level-0
    occupancy blocks with a 1-cell border ring (independent numpy
    reconstruction).  The dilation is what makes the per-tile start a
    conservative lower bound — any weakening (smaller stencil, missing
    border) silently turns ppm edge effects into wrong hit masks."""
    rng = np.random.default_rng(11)
    S = 64
    # explicit voxel list: occupancy known exactly, independent of any
    # tree/bitgrid bookkeeping
    pts = np.unique(rng.integers(0, S, (800, 3)), axis=0)
    tree = BoxTree(S, 4, auto_simplify=False)
    occ = np.zeros((S, S, S), dtype=bool)
    for x, y, z in pts:
        tree.insert((int(x), int(y), int(z)), Albedo(200, 60, 60, 255))
        occ[x, y, z] = True
    r = BitGridRenderer(tree)
    L = 1  # 4^1-cell beam grid
    tree_b, _tracer = r._beam_setup(L)
    c = 4**L
    m = S // c
    cells = occ.reshape(m, c, m, c, m, c).any(axis=(1, 3, 5))
    g = np.zeros((m + 4, m + 4, m + 4), dtype=bool)
    g[2:m + 2, 2:m + 2, 2:m + 2] = cells
    want = np.zeros((m + 2, m + 2, m + 2), dtype=bool)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                want |= g[dx:dx + m + 2, dy:dy + m + 2, dz:dz + m + 2]

    # the ACTUAL device beam grid's occupancy words must equal the words
    # of the independently reconstructed dilation, level for level
    from voxelhex_tpu.render.bitgrid import bitgrid_from_occupancy

    ref = bitgrid_from_occupancy(want)
    ref_pairs = np.stack([ref.occ_lo, ref.occ_hi], axis=1)
    got_pairs = np.asarray(tree_b["occ_pairs"])
    np.testing.assert_array_equal(
        got_pairs, ref_pairs,
        err_msg="beam grid words != independent 3^3 dilation + border ring",
    )
