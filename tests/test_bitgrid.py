"""BitGrid (dense hierarchical bitmap) renderer tests."""

import numpy as np
import pytest

from voxelhex_tpu.render.bitgrid import (
    BitGridRenderer,
    _reach_mask_v,
    build_bitgrid,
)
from voxelhex_tpu.render.camera import orbit_camera
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


def make_scene(size, dim, seed=9):
    tree = BoxTree(size, dim, auto_simplify=False)
    rng = np.random.default_rng(seed)
    for _ in range(size * size):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    if size >= 16:
        tree.insert_at_lod((8, 8, 8), 4, GREEN)
    return tree


def test_reach_mask_matches_lut():
    import jax.numpy as jnp

    from voxelhex_tpu.spatial.luts import ray_occupancy_masks_u32

    LO, HI = ray_occupancy_masks_u32()
    s = jnp.asarray(np.repeat(np.arange(64), 8), dtype=jnp.int32)
    o = jnp.asarray(np.tile(np.arange(8), 64), dtype=jnp.int32)
    ml, mh = _reach_mask_v(s, o)
    np.testing.assert_array_equal(np.asarray(ml), LO[np.asarray(s), np.asarray(o)])
    np.testing.assert_array_equal(np.asarray(mh), HI[np.asarray(s), np.asarray(o)])


def test_bitgrid_pyramid_consistency():
    tree = make_scene(64, 4)
    bg = build_bitgrid(tree)
    S = 64
    # level-0 bits match the tree contents
    n = S // 4
    for _ in range(200):
        rng = np.random.default_rng(_)
        x, y, z = (int(v) for v in rng.integers(0, S, 3))
        b = (x // 4) + (y // 4) * n + (z // 4) * n * n
        s = (x % 4) + (y % 4) * 4 + (z % 4) * 16
        w = int(bg.occ_lo[b]) | (int(bg.occ_hi[b]) << 32)
        bit = (w >> s) & 1
        assert bit == (1 if tree.get((x, y, z)).is_some else 0), (x, y, z)


@pytest.mark.parametrize("size,dim", [(16, 4), (64, 4), (32, 8)])
def test_bitgrid_matches_oracle(size, dim):
    tree = make_scene(size, dim)
    flat = flatten(tree)
    r = BitGridRenderer(tree)
    rng = np.random.default_rng(31)
    n = 150
    targets = rng.random((n, 3)) * size
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 3 * size).astype(np.float32)
    dirs = dirs.astype(np.float32)
    hit, voxel, hvox, hpoint, hnormal = r.trace(origins, dirs)
    hit, voxel = np.asarray(hit), np.asarray(voxel)
    checked = 0
    for i in range(n):
        frac = np.abs(targets[i] - np.round(targets[i]))
        if np.any(frac < 0.05):
            continue
        expected = get_by_ray(flat, origins[i], dirs[i])
        checked += 1
        assert (expected is not None) == bool(hit[i]), i
        if expected is not None:
            assert expected.voxel == int(voxel[i]), i
    assert checked > 80


def test_compacted_trace_matches_plain():
    tree = make_scene(64, 4)
    r = BitGridRenderer(tree)
    rng = np.random.default_rng(3)
    n = 3000
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 200).astype(np.float32)
    dirs = dirs.astype(np.float32)
    h1, v1, _, _, n1 = r.trace(origins, dirs)
    h2, v2, _, _, n2 = r.trace_compacted(origins, dirs, min_bucket=256)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)


def test_parent_skip_bit_exact():
    """parent_skip (empty lateral targets ascend immediately via the fetched
    parent words) must not change any hit, voxel, point, or normal."""
    tree = make_scene(64, 4)
    r_on = BitGridRenderer(tree, parent_skip=True)
    r_off = BitGridRenderer(tree, parent_skip=False)
    rng = np.random.default_rng(17)
    n = 4000
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 200).astype(np.float32)
    dirs = dirs.astype(np.float32)
    h1, v1, hv1, p1, n1 = r_on.trace(origins, dirs)
    h2, v2, hv2, p2, n2 = r_off.trace(origins, dirs)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(hv1), np.asarray(hv2))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)


def test_render_paths_agree():
    tree = make_scene(64, 4)
    cam = orbit_camera(64.0, resolution=(64, 48))
    r0 = BitGridRenderer(tree, prepass=False)
    a = r0.render(cam, compact=False)
    b = r0.render(cam, compact=True)
    assert (np.abs(a - b) < 1e-5).all()


def test_prepass_exact_on_solid_surfaces():
    """The depth prepass (like the reference's half-res prepass) may skip
    features smaller than a prepass pixel; on solid surfaces it is exact."""
    tree = BoxTree(64, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 32, RED)  # a big solid block
    cam = orbit_camera(64.0, resolution=(64, 48))
    a = BitGridRenderer(tree, prepass=False).render(cam)
    c = BitGridRenderer(tree, prepass=True, prepass_levels=2).render(cam)
    assert (np.abs(a - c) < 1e-5).all(axis=-1).mean() > 0.995

    # sparse single voxels: most pixels still agree, artifacts bounded
    tree2 = make_scene(64, 4)
    a2 = BitGridRenderer(tree2, prepass=False).render(cam)
    c2 = BitGridRenderer(tree2, prepass=True, prepass_levels=2).render(cam)
    assert (np.abs(a2 - c2) < 1e-5).all(axis=-1).mean() > 0.85


def test_lod_rendering():
    """Distance-based LOD: identical at lod_scale=0, plausible and
    energy-preserving at coarse scales."""
    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(16, 48):
        for y in range(16, 48):
            for z in range(16, 48):
                tree.insert((x, y, z), RED if (x // 8 + y // 8) % 2 == 0 else GREEN)
    r = BitGridRenderer(tree)
    cam = orbit_camera(64.0, resolution=(48, 36))
    full = r.render(cam)
    same = r.render_lod(cam, lod_scale=0.0)
    np.testing.assert_allclose(full, same, atol=1e-5)

    coarse = r.render_lod(cam, lod_scale=0.3)
    # coarse silhouettes can only grow; mean brightness stays in range
    assert (coarse.sum(-1) > 0).mean() >= (full.sum(-1) > 0).mean() - 0.01
    assert abs(coarse.mean() - full.mean()) < 0.05
    assert np.isfinite(coarse).all()


def test_resolve_entries_returns_user_data():
    """Device hits resolve to full entries (color + user data) via the host
    tree — the get_by_ray entry parity path."""
    from voxelhex_tpu.tree.boxtree import Entry

    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((2, 3, 4), Entry(albedo=RED, data=42))
    tree.insert((5, 3, 4), Entry(data=7))  # colorless data voxel
    r = BitGridRenderer(tree)
    o = np.array([[2.5, 3.5, -3.0], [5.5, 3.5, -3.0]], dtype=np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (2, 1))
    hit, voxel, hvox, _, _ = r.trace(o, d)
    entries = r.resolve_entries(tree, hit, hvox)
    assert entries[0].albedo == RED and entries[0].data == 42
    assert entries[1].albedo is None and entries[1].data == 7


def test_render_out_u8_matches_quantized_f32():
    """The device-side uint8 output path equals quantizing the f32 frame
    (the reference renders into an rgba8 texture; out_u8 mirrors that and
    cuts host transfer 4x)."""
    from voxelhex_tpu.render.camera import orbit_camera

    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(5)
    for _ in range(120):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        tree.insert(p, Albedo(rng.integers(30, 255), 90, 120, 255))
    r = BitGridRenderer(tree)
    cam = orbit_camera(16.0, resolution=(48, 32))
    for compact in (False, True):
        f = r.render(cam, bg=(0.1, 0.2, 0.3), compact=compact)
        u = r.render(cam, bg=(0.1, 0.2, 0.3), compact=compact, out_u8=True)
        assert u.dtype == np.uint8 and u.shape == f.shape
        np.testing.assert_array_equal(
            u, np.clip(np.round(f * 255.0), 0, 255).astype(np.uint8)
        )


def test_trace_stats_profiling_hook():
    """trace_compacted records per-round host-side stats (bucket sizes,
    iteration counts, actives) for profiling."""
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((8, 8, 8), Albedo.from_u32(0xFF0000FF))
    r = BitGridRenderer(tree)
    from voxelhex_tpu.render.camera import orbit_camera

    cam = orbit_camera(16.0, resolution=(64, 32))
    r.render(cam)
    stats = r.last_stats
    assert stats["rays"] == 64 * 32
    assert stats["rounds"] and stats["rounds"][0]["bucket"] == 64 * 32
    assert stats["total_iters"] == sum(rd["iters"] for rd in stats["rounds"])
    assert stats["rounds"][-1]["n_active"] == 0 or (
        stats["total_iters"] >= r._max_iters
    )


def test_splat_prepass_exact():
    """The voxel-splat depth prepass must not change the rendered image —
    starts are conservative (3x3 half-res neighborhood min, margin, and
    splat-free texels march from the world entry)."""
    tree = make_scene(64, 4)
    r = BitGridRenderer(tree)
    cam = orbit_camera(64.0, resolution=(64, 48))
    a = r.render(cam, compact=True)
    b = r.render(cam, compact=True, splat_prepass=True)
    np.testing.assert_array_equal(a, b)
    # close-up camera: voxels subtend multiple pixels
    cam2 = orbit_camera(64.0, distance_factor=0.5, resolution=(64, 48))
    a2 = r.render(cam2, compact=True)
    b2 = r.render(cam2, compact=True, splat_prepass=True)
    np.testing.assert_array_equal(a2, b2)
    # cameras inside the scene at random orientations
    from voxelhex_tpu.render.camera import Camera

    rng = np.random.default_rng(5)
    for k in range(4):
        origin = rng.random(3) * 64.0
        target = rng.random(3) * 64.0
        if np.allclose(origin, target):
            continue
        cam3 = Camera(origin=origin, target=target, resolution=(64, 48))
        a3 = r.render(cam3, compact=True)
        b3 = r.render(cam3, compact=True, splat_prepass=True)
        np.testing.assert_array_equal(a3, b3), k


def test_planned_schedule_matches_adaptive():
    """Frame 2+ replays frame 1's compaction schedule with no mid-frame
    host syncs (auto_plan); results are bit-exact vs the adaptive loop."""
    tree = make_scene(64, 4)
    r = BitGridRenderer(tree, auto_plan=True)
    r_ref = BitGridRenderer(tree)
    cam = orbit_camera(64.0, resolution=(64, 48))
    ref = r_ref.render(cam)
    first = r.render(cam)  # adaptive (no plan recorded yet)
    assert not r.last_stats["planned"]
    second = r.render(cam)  # replays the recorded plan
    assert r.last_stats["planned"]
    assert any(rd.get("planned") for rd in r.last_stats["rounds"])
    np.testing.assert_array_equal(first, ref)
    np.testing.assert_array_equal(second, ref)


def test_planned_schedule_overflow_falls_back():
    """A plan whose bucket is too small for this frame's stragglers would
    drop rays — the overflow is detected and the frame re-traced
    adaptively."""
    tree = make_scene(64, 4)
    r = BitGridRenderer(tree)
    rng = np.random.default_rng(3)
    n = 3000
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 200).astype(np.float32)
    dirs = dirs.astype(np.float32)
    ref = r.trace_compacted(origins, dirs, min_bucket=256)
    # sabotage: a plan that compacts everything into a 4-ray bucket after
    # a single iteration — guaranteed overflow
    bad_plan = [(1, 4), (56, None)]
    out = r.trace_compacted(origins, dirs, min_bucket=256, plan=bad_plan)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert not r.last_stats["planned"]  # the retrace was adaptive


def test_plan_from_rounds_shapes():
    from voxelhex_tpu.render.bitgrid import plan_from_rounds

    rounds = [
        {"bucket": 4096, "iters": 14, "n_active": 900},
        {"bucket": 1024, "iters": 56, "n_active": 0},
    ]
    # default: replay the adaptive ladder (900 actives -> 1024 bucket)
    plan = plan_from_rounds(rounds, shrink=4, min_bucket=256)
    assert plan == [(14, 1024), (56, None)]
    # margin > 1: a 88%-full bucket gets one ladder step of headroom
    plan_m = plan_from_rounds(rounds, shrink=4, min_bucket=256, margin=1.15)
    assert plan_m == [(14, None), (56, None)]
    # fewer actives than min_bucket: still clamps at min_bucket's step
    rounds2 = [
        {"bucket": 4096, "iters": 14, "n_active": 100},
        {"bucket": 256, "iters": 56, "n_active": 0},
    ]
    plan2 = plan_from_rounds(rounds2, shrink=4, min_bucket=256)
    assert plan2 == [(14, 256), (56, None)]


def test_plan_from_rounds_incomplete_marked():
    """A recorded frame that ended at max_iters with live actives yields an
    INCOMPLETE plan (dict, complete=False): the fused path cannot extend a
    schedule, so replaying such a plan fused would pay a full fused trace
    plus a full adaptive retrace every frame."""
    from voxelhex_tpu.render.bitgrid import plan_from_rounds

    rounds = [
        {"bucket": 4096, "iters": 14, "n_active": 900},
        {"bucket": 1024, "iters": 56, "n_active": 37},  # still live at end
    ]
    plan = plan_from_rounds(rounds, shrink=4, min_bucket=256)
    assert isinstance(plan, dict) and plan["complete"] is False
    # the trailing bucket is the compaction the adaptive continuation
    # starts from — kept so the replay-then-adapt path shrinks stragglers
    assert plan["rounds"] == [(14, 1024), (56, 256)]


def test_incomplete_plan_routes_nonfused():
    """An incomplete plan on a fuse_plan renderer must take the NON-fused
    replay+adapt path (which can extend the schedule), not the fused
    program, and still match the plain render exactly."""
    tree = make_scene(64, 4, seed=3)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    from voxelhex_tpu.render.camera import device_rays

    o, d = device_rays(cam)
    import jax.numpy as jnp

    bgc = jnp.zeros(3, dtype=jnp.float32)
    ref = r.trace_compacted(o, d, shade_bg=bgc)
    incomplete = {"pre": None, "rounds": [(14, None)], "complete": False}
    out = rf.trace_compacted(o, d, shade_bg=bgc, plan=incomplete)
    assert rf.last_stats["planned"] and not rf.last_stats.get("fused")
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_color_u8_grid_bit_exact():
    """The u8 device color grid (palette <= 254: halved color HBM) renders
    bit-for-bit like the u16 grid; oversized palettes silently keep u16."""
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(9)
    for _ in range(300):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, Albedo(int(rng.integers(30, 250)), 90, 120, 255))
    from voxelhex_tpu.tree.boxtree import Entry

    tree.insert((1, 1, 1), Entry(data=5))  # colorless voxel -> 254 sentinel
    r16 = BitGridRenderer(tree)
    r8 = BitGridRenderer(tree, color_u8=True)
    assert np.asarray(r8.tree["colors"]).dtype == np.uint8
    assert np.asarray(r16.tree["colors"]).dtype == np.uint16
    cam = orbit_camera(64.0, resolution=(48, 32))
    np.testing.assert_array_equal(r8.render(cam), r16.render(cam))
    # colorless + user-data resolution still works through the u8 grid
    o = np.array([[1.5, 1.5, -3.0]], dtype=np.float32)
    d = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    hit, voxel, hvox, _, _ = r8.trace(o, d)
    assert bool(np.asarray(hit)[0]) and int(np.asarray(voxel)[0]) == 0x3FFFFFFE

    # >254 palette entries: falls back to u16
    big = BoxTree(64, 4, auto_simplify=False)
    for r in range(16):
        for g in range(17):
            big.insert((r, g, 1), Albedo(50 + r * 10 % 200, 30 + g * 9 % 200,
                                         (r * 17 + g) % 255, 255))
    rbig = BitGridRenderer(big, color_u8=True)
    assert np.asarray(rbig.tree["colors"]).dtype == np.uint16


# --- Beam prepass: conservative per-tile starts must be bit-exact ---------


@pytest.mark.parametrize("seed", [1, 7])
def test_beam_prepass_bit_exact(seed):
    """render(beam_prepass=True) must equal the plain render EXACTLY: the
    beam start is a provable lower bound on every tile ray's first hit, and
    dead tiles (beam exits the dilated grid cleanly) contain only misses."""
    tree = make_scene(64, 4, seed=seed)
    r = BitGridRenderer(tree)
    for df in (2.2, 0.9):  # outside orbit + camera near/inside the scene
        cam = orbit_camera(
            64.0, distance_factor=df, resolution=(160, 120), pitch_deg=20.0
        )
        plain = r.render(cam, out_u8=True)
        beam = r.render(cam, beam_prepass=True, out_u8=True)
        np.testing.assert_array_equal(beam, plain)


def test_beam_prepass_sparse_scene_kills_sky():
    """A tiny model in a big world: most tiles are dead (start >= 1e8) and
    hit tiles carry a positive conservative head start."""
    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(28, 36):
        for y in range(28, 36):
            for z in range(28, 36):
                tree.insert((x, y, z), RED)
    r = BitGridRenderer(tree)
    cam = orbit_camera(64.0, resolution=(160, 120))
    start = np.asarray(r.beam_start(cam))
    assert start is not None and start.shape == (160 * 120,)
    assert (start >= 1e8).mean() > 0.3  # plenty of provably-dead sky
    assert (start > 0.0).any()
    np.testing.assert_array_equal(
        r.render(cam, beam_prepass=True, out_u8=True), r.render(cam, out_u8=True)
    )


def test_beam_planned_pre_compaction_replay():
    """beam + auto_plan: frame 1 records a dict plan carrying the round-0
    compaction bucket ({pre, rounds}); frame 2 replays it with no blocking
    pre-count read.  Frames must match the plain render exactly, and the
    replayed frame must be planned with the pre bucket applied."""
    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(28, 36):
        for y in range(28, 36):
            for z in range(28, 36):
                tree.insert((x, y, z), RED)
    r = BitGridRenderer(tree, auto_plan=True)
    # resolution large enough that the survivors fit a smaller ladder
    # bucket (render() uses the default min_bucket=8192); the far orbit
    # makes ~84% of tiles provably dead
    cam = orbit_camera(64.0, distance_factor=3.0, resolution=(320, 240))
    plain = r.render(cam, out_u8=True)
    f1 = r.render(cam, beam_prepass=True, out_u8=True)  # records the plan
    assert r.last_stats["pre"] is not None
    assert r.last_stats["pre"]["bucket"] < 320 * 240  # sky actually dropped
    f2 = r.render(cam, beam_prepass=True, out_u8=True)  # replays it
    assert r.last_stats["planned"]
    assert r.last_stats["pre"]["planned"]
    assert r.last_stats["pre"]["n_alive"] is not None  # batched-fetch filled
    np.testing.assert_array_equal(f1, plain)
    np.testing.assert_array_equal(f2, plain)


def test_fused_plan_single_dispatch_frames():
    """fuse_plan: once a plan exists, the whole frame (init, round-0
    compaction, rounds, compactions, shade) runs as ONE jitted program.
    Frames must equal the adaptive render exactly, with and without the
    beam prepass; a changed scene viewpoint (fresh plan) still works."""
    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(28, 36):
        for y in range(28, 36):
            for z in range(28, 36):
                tree.insert((x, y, z), RED)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, distance_factor=3.0, resolution=(320, 240))
    plain = r.render(cam, out_u8=True)
    f1 = rf.render(cam, out_u8=True)  # adaptive (no plan yet) — records
    f2 = rf.render(cam, out_u8=True)  # non-fused replay (stability gate)
    assert rf.last_stats["planned"] and not rf.last_stats.get("fused")
    f3 = rf.render(cam, out_u8=True)  # plan stable -> fused
    assert rf.last_stats.get("fused")
    # the steady-state frame was ONE dispatch including raygen + u8
    assert rf.last_stats.get("frame_fused")
    np.testing.assert_array_equal(f1, plain)
    np.testing.assert_array_equal(f2, plain)
    np.testing.assert_array_equal(f3, plain)
    b1 = rf.render(cam, beam_prepass=True, out_u8=True)  # records beam plan
    b2 = rf.render(cam, beam_prepass=True, out_u8=True)  # replay, streak 1
    b3 = rf.render(cam, beam_prepass=True, out_u8=True)  # fused, with pre
    assert rf.last_stats.get("fused")
    # the beam prepass was traced INTO the one-dispatch frame program —
    # not run as a separate beam_start dispatch (VERDICT r2 next #1)
    assert rf.last_stats.get("beam_fused")
    assert rf.last_stats["pre"] is not None
    np.testing.assert_array_equal(b1, plain)
    np.testing.assert_array_equal(b2, plain)
    np.testing.assert_array_equal(b3, plain)
    # a different camera invalidates nothing structurally — the fused
    # program either replays fine or overflow-retraces adaptively
    cam2 = orbit_camera(64.0, distance_factor=2.0, resolution=(320, 240))
    np.testing.assert_array_equal(
        rf.render(cam2, out_u8=True), r.render(cam2, out_u8=True)
    )
    np.testing.assert_array_equal(
        rf.render(cam2, out_u8=True), r.render(cam2, out_u8=True)
    )


def test_fuse_compile_cap_blocks_new_programs():
    """fuse_compile_cap=0: stable plans must stay on the non-fused planned
    replay (no fused programs compiled — the plan-churn protection), with
    results identical to plain rendering."""
    tree = make_scene(64, 4, seed=3)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    rf.fuse_compile_cap = 0
    cam = orbit_camera(64.0, resolution=(160, 120))
    plain = r.render(cam, out_u8=True)
    for _ in range(3):
        np.testing.assert_array_equal(rf.render(cam, out_u8=True), plain)
    assert not rf._fused_fns  # budget 0: nothing compiled
    assert rf.last_stats["planned"] and not rf.last_stats.get("fused")


def test_pipeline_deferred_validation_exact():
    """FramePipeline defers the fused path's counts read to its fetch
    worker; delivered frames must equal the direct render exactly — and
    when a plan overflows, resolve() must re-render before delivery."""
    from voxelhex_tpu.render.pipeline import FramePipeline

    tree = make_scene(64, 4, seed=5)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    plain = r.render(cam, out_u8=True)
    pipe = FramePipeline(rf)
    futs = [pipe.render(cam, out_u8=True) for _ in range(4)]
    frames = [f.result() for f in futs]
    pipe.drain()
    for f in frames:
        np.testing.assert_array_equal(f, plain)
    pipe.close()

    # explicit deferred mode (opt-in — the pipeline default stays
    # blocking, PERF.md "Deferred counts"): resolve() validates before
    # delivery and stays exact
    d = rf.render(cam, out_u8=True, out_device=True, defer_validation=True)
    assert isinstance(d, rf.DeferredFrame) and rf.last_stats.get("deferred")
    np.testing.assert_array_equal(d.resolve(fetch=True), plain)

    # overflow: poison the recorded plan with an impossible bucket — the
    # deferred resolve must detect it and deliver a re-rendered frame
    R = 160 * 120
    key = (R, False, 14, None)
    assert key in rf._plans
    good = rf._plans[key]
    rounds = good["rounds"] if isinstance(good, dict) else list(good)
    bad_rounds = [(rounds[0][0], 8)] + [(56, None)]
    poison = {"pre": None, "rounds": bad_rounds, "complete": True}
    rf._plans[key] = poison
    rf._plan_streak[key] = 5
    d = rf.render(cam, out_u8=True, out_device=True, defer_validation=True)
    assert isinstance(d, rf.DeferredFrame)
    np.testing.assert_array_equal(d.resolve(fetch=True), plain)
    assert rf._plans.get(key) != poison  # poisoned plan dropped by resolve


def test_beam_planned_pre_overflow_retraces():
    """A planned pre bucket too small for the frame's live rays must be
    detected by the batched count read and retraced adaptively."""
    tree = make_scene(64, 4, seed=1)
    r = BitGridRenderer(tree)
    cam = orbit_camera(64.0, resolution=(160, 120))
    start = r.beam_start(cam)
    o, d = __import__("voxelhex_tpu.render.camera", fromlist=["device_rays"]).device_rays(cam)
    ref = r.trace_compacted(o, d, start_t=start, min_bucket=256)
    bad = {"pre": 8, "rounds": [(14, None), (56, None)]}  # 8-ray pre bucket
    out = r.trace_compacted(o, d, start_t=start, min_bucket=256, plan=bad)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert not r.last_stats["planned"]  # fell back to the adaptive trace


def test_beam_prepass_falls_back_gracefully():
    """Indivisible resolutions or unsatisfiable bounds return None and the
    render path silently uses the plain compacted trace."""
    tree = make_scene(16, 4)
    r = BitGridRenderer(tree)
    cam = orbit_camera(16.0, resolution=(100, 75))  # not tile-divisible
    assert r.beam_start(cam) is None
    np.testing.assert_array_equal(
        r.render(cam, beam_prepass=True, out_u8=True), r.render(cam, out_u8=True)
    )


def test_skip_tracer_matches_stack():
    """The fused-hierarchy skip tracer must agree with the stack automaton
    on every hit, voxel, point and normal (both are oracle-anchored)."""
    tree = make_scene(64, 4)
    r_stack = BitGridRenderer(tree)
    r_skip = BitGridRenderer(tree, tracer="skip")
    rng = np.random.default_rng(23)
    n = 3000
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 200).astype(np.float32)
    dirs = dirs.astype(np.float32)
    h1, v1, hv1, _p1, n1 = (np.asarray(x) for x in r_stack.trace(origins, dirs))
    h2, v2, hv2, _p2, n2 = (np.asarray(x) for x in r_skip.trace(origins, dirs))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(v1[h1], v2[h1])
    np.testing.assert_array_equal(hv1[h1], hv2[h1])
    np.testing.assert_allclose(n1[h1], n2[h1], atol=1e-5)


@pytest.mark.parametrize("substeps", [1, 3])
def test_skip_tracer_compacted_frame_bit_exact(substeps):
    """Full compacted frames (the production path) are bit-exact between
    the tracers, including rays started mid-flight (start_t)."""
    tree = make_scene(64, 4)
    r_stack = BitGridRenderer(tree)
    r_skip = BitGridRenderer(tree, tracer="skip", skip_substeps=substeps)
    from voxelhex_tpu.render.camera import orbit_camera

    cam = orbit_camera(64.0, resolution=(96, 64))
    f1 = np.asarray(r_stack.render(cam, out_u8=True))
    f2 = np.asarray(r_skip.render(cam, out_u8=True))
    np.testing.assert_array_equal(f1, f2)
    # start_t path (beam/splat prepasses feed this)
    f3 = np.asarray(r_skip.render(cam, out_u8=True, splat_prepass=True))
    np.testing.assert_array_equal(f1, f3)


def test_skip_rows_structure():
    """Every skip row must equal the per-level word pair of the block's
    ancestor chain."""
    from voxelhex_tpu.render.bitgrid import build_bitgrid, build_skip_rows

    tree = make_scene(64, 4)
    bg = build_bitgrid(flatten(tree))
    rows = build_skip_rows(bg)
    n0 = bg.size // 4
    rng = np.random.default_rng(3)
    dims, c = [], bg.size
    for _ in range(bg.n_levels):
        dims.append(max((c + 3) // 4, 1))
        c = dims[-1]
    for _ in range(50):
        bx, by, bz = (int(v) for v in rng.integers(0, n0, 3))
        a = bx + by * n0 + bz * n0 * n0
        for k in range(bg.n_levels):
            kx, ky, kz = bx >> (2 * k), by >> (2 * k), bz >> (2 * k)
            idx = int(bg.level_bases[k]) + kx + ky * dims[k] + kz * dims[k] ** 2
            assert rows[a, 2 * k] == bg.occ_lo[idx]
            assert rows[a, 2 * k + 1] == bg.occ_hi[idx]


def test_render_many_batched_frames_match_per_frame():
    """render_many: K same-resolution frames as ONE dispatch (scan over
    camera params) must equal per-frame renders exactly — plain and with
    the beam prepass traced in — and fall back to None before a stable
    plan exists."""
    tree = make_scene(64, 4, seed=7)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cams = [
        orbit_camera(64.0, yaw_deg=y, resolution=(160, 120))
        for y in (20.0, 22.0, 24.0)
    ]
    # no plan yet: the batch path declines
    assert rf.render_many(cams, out_u8=True) is None
    singles = [r.render(c, out_u8=True) for c in cams]
    for _ in range(3):  # record + stabilize + fuse on the first camera
        rf.render(cams[0], out_u8=True)
    batch = rf.render_many(cams, out_u8=True)
    assert batch is not None and batch.shape == (3, 120, 160, 3)
    assert rf.last_stats.get("batched_frames") == 3
    for got, want in zip(batch, singles):
        np.testing.assert_array_equal(got, want)

    # beam variant: the beam prepass runs inside the scanned program
    for _ in range(3):
        rf.render(cams[0], beam_prepass=True, out_u8=True)
    batch_b = rf.render_many(cams, beam_prepass=True, out_u8=True)
    if batch_b is not None:  # beam spec can decline on tiny scenes
        assert rf.last_stats.get("beam_fused")
        for got, want in zip(batch_b, singles):
            np.testing.assert_array_equal(got, want)


def test_render_many_overflow_falls_back_to_none():
    """A camera whose frame outgrows the recorded plan makes render_many
    return None (plan dropped) instead of delivering dropped-ray frames;
    the per-frame path then re-records and the batch works again."""
    tree = make_scene(64, 4, seed=9)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    far = orbit_camera(64.0, distance_factor=6.0, resolution=(160, 120))
    near = orbit_camera(64.0, distance_factor=1.1, resolution=(160, 120))
    for _ in range(3):  # plan for the easy (far) viewpoint
        rf.render(far, out_u8=True)
    out = rf.render_many([far, near], out_u8=True)
    if out is None:
        # overflow detected: plan dropped; per-frame path still exact
        np.testing.assert_array_equal(
            rf.render(near, out_u8=True), r.render(near, out_u8=True)
        )
    else:
        # the near frame happened to fit the plan: must be exact
        np.testing.assert_array_equal(out[1], r.render(near, out_u8=True))


def test_fused_pose_validation_skips_counts_read():
    """Validate-once-per-pose: after a pose's counts validate against the
    plan, re-rendering the SAME pose skips the blocking read
    (pose_validated stat) with identical pixels; a new pose re-validates,
    and invalidate_beam (the content-change hook) voids the token."""
    tree = make_scene(64, 4, seed=3)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    plain = r.render(cam, out_u8=True)
    for _ in range(3):  # record + stabilize + fuse (validates the pose)
        rf.render(cam, out_u8=True)
    assert rf.last_stats.get("frame_fused")
    assert rf._frame_validated is not None
    f4 = rf.render(cam, out_u8=True)  # same pose: no blocking read
    assert rf.last_stats.get("pose_validated")
    np.testing.assert_array_equal(f4, plain)

    # a new pose re-validates (full stats with rounds), still exact
    cam2 = orbit_camera(64.0, yaw_deg=55.0, resolution=(160, 120))
    f5 = rf.render(cam2, out_u8=True)
    np.testing.assert_array_equal(f5, r.render(cam2, out_u8=True))

    # content-change hook voids the token: same pose re-validates once
    rf.render(cam, out_u8=True)  # re-validate (cam2 took the slot)
    rf.render(cam, out_u8=True)
    assert rf.last_stats.get("pose_validated")
    rf.invalidate_beam()
    rf.render(cam, out_u8=True)
    assert not rf.last_stats.get("pose_validated")
    rf.render(cam, out_u8=True)
    assert rf.last_stats.get("pose_validated")


def test_render_many_pose_validation_skip():
    """render_many's second identical batch skips the counts read
    (pose_validated) and stays bit-identical."""
    tree = make_scene(64, 4, seed=7)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cams = [
        orbit_camera(64.0, yaw_deg=y, resolution=(160, 120))
        for y in (20.0, 22.0)
    ]
    for _ in range(3):
        rf.render(cams[0], out_u8=True)
    b1 = rf.render_many(cams, out_u8=True)
    assert b1 is not None and not rf.last_stats.get("pose_validated")
    b2 = rf.render_many(cams, out_u8=True)
    assert rf.last_stats.get("pose_validated")
    np.testing.assert_array_equal(b1, b2)


def test_render_delta_many_static_pose_shares_frames():
    """render_delta_many: a steady pose fetches the frame ONCE (the
    self-priming batch), then every later frame arrives as an 8-byte
    digest and the host reuses the same ndarray — pixels bit-identical to
    the plain per-frame render throughout."""
    tree = make_scene(64, 4, seed=7)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    # no plan yet: the delta path declines
    assert rf.render_delta_many([cam, cam]) is None
    plain = r.render(cam, out_u8=True)
    for _ in range(3):  # record + stabilize + fuse
        rf.render(cam, out_u8=True)
    f1 = rf.render_delta_many([cam, cam, cam])
    assert f1 is not None and len(f1) == 3
    assert rf.last_stats.get("delta") and rf.last_stats["delta_fetched"] == 1
    assert f1[1] is f1[0] and f1[2] is f1[0]  # digest-only frames share
    np.testing.assert_array_equal(f1[0], plain)
    # second batch: pose-validated, NOTHING fetched, same baseline array
    f2 = rf.render_delta_many([cam, cam, cam])
    assert rf.last_stats.get("pose_validated")
    assert rf.last_stats["delta_fetched"] == 0
    assert f2[0] is f1[0]
    # the content-change hook voids the VALIDATED-POSE token (counts
    # re-read) but the delta baseline survives as a pure diff base: the
    # unchanged content re-serves digest-only
    rf.invalidate_beam()
    f3 = rf.render_delta_many([cam, cam])
    assert rf.last_stats["delta_fetched"] == 0
    assert not rf.last_stats.get("pose_validated")
    np.testing.assert_array_equal(f3[0], plain)


def test_render_delta_many_mixed_poses_exact():
    """A mixed-pose batch fetches exactly the frames whose pixels moved
    and every delivered frame equals the per-frame render bit-for-bit."""
    tree = make_scene(64, 4, seed=7)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    a = orbit_camera(64.0, yaw_deg=20.0, resolution=(160, 120))
    b = orbit_camera(64.0, yaw_deg=24.0, resolution=(160, 120))
    want_a = r.render(a, out_u8=True)
    want_b = r.render(b, out_u8=True)
    for _ in range(3):
        rf.render(a, out_u8=True)
    frames = rf.render_delta_many([a, a, b, b])
    assert frames is not None
    # frame 0 primes, frame 2 changes pose; 1 and 3 ride the digests
    assert rf.last_stats["delta_fetched"] == 2
    np.testing.assert_array_equal(frames[0], want_a)
    assert frames[1] is frames[0]
    np.testing.assert_array_equal(frames[2], want_b)
    assert frames[3] is frames[2]
    # next batch deltas against the LAST frame (pose b): a moved, b not
    frames2 = rf.render_delta_many([b, a])
    assert frames2 is not None and rf.last_stats["delta_fetched"] == 1
    np.testing.assert_array_equal(frames2[0], want_b)
    np.testing.assert_array_equal(frames2[1], want_a)


def test_render_delta_many_beam_variant():
    """Beam-fused delta batches stay bit-identical to plain renders."""
    tree = make_scene(64, 4, seed=7)
    r = BitGridRenderer(tree)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    for _ in range(3):
        rf.render(cam, beam_prepass=True, out_u8=True)
    frames = rf.render_delta_many([cam, cam], beam_prepass=True)
    if frames is None:  # beam spec can decline on tiny scenes
        pytest.skip("beam spec declined")
    assert rf.last_stats.get("beam_fused")
    np.testing.assert_array_equal(frames[0], r.render(cam, out_u8=True))
    assert frames[1] is frames[0]


def test_render_delta_many_edit_fetches_row_band():
    """An in-place content edit (the serve dense-edit pattern: swap
    renderer.tree + invalidate_beam) costs only its changed ROW BAND:
    the delta baseline survives as a diff base, the program diffs the
    freshly rendered frame against it on device, and the host patches
    the fetched band into a copy of the baseline — bit-identical to a
    full re-render."""
    from voxelhex_tpu.render.bitgrid import device_bitgrid
    from voxelhex_tpu.tree.flat import flatten as _flatten

    tree = make_scene(64, 4, seed=7)
    rf = BitGridRenderer(tree, fuse_plan=True)
    cam = orbit_camera(64.0, resolution=(160, 120))
    for _ in range(3):
        rf.render(cam, out_u8=True)
    f0 = rf.render_delta_many([cam])
    assert f0 is not None and rf.last_stats["delta_fetched"] == 1

    # edit: a small solid block -> only a local screen region changes
    tree.insert_at_lod((24, 24, 24), 8, Albedo(30, 30, 240, 255))
    from voxelhex_tpu.render.bitgrid import build_bitgrid
    bg = build_bitgrid(tree)
    rf.bitgrid = bg
    rf.tree = device_bitgrid(bg)
    rf.invalidate_beam()

    f1 = rf.render_delta_many([cam])
    if f1 is None:  # plan overflowed on the new content: re-record
        for _ in range(3):
            rf.render(cam, out_u8=True)
        f1 = rf.render_delta_many([cam])
    st = rf.last_stats
    assert st["delta_fetched"] == 1
    # the edit is local: a strict subset of rows moved
    assert 0 < st["delta_rows_fetched"] < 120
    r2 = BitGridRenderer(tree)
    np.testing.assert_array_equal(f1[0], r2.render(cam, out_u8=True))
    # unchanged content after the edit: digest-only again
    f2 = rf.render_delta_many([cam])
    assert rf.last_stats["delta_fetched"] == 0
    assert f2[0] is f1[0]
