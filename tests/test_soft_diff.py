"""Soft-occupancy differentiable rendering tests (multi-hit + carving)."""

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.diff.soft import SoftRenderer, fit_soft
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


def test_multihit_records_layers():
    # two walls behind each other; a straight ray must record both
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(4, 8):
        for y in range(4, 8):
            tree.insert((x, y, 4), RED)
            tree.insert((x, y, 10), GREEN)
    r = SoftRenderer(tree, max_hits=3)
    o = np.array([[5.5, 5.5, -3.0]], dtype=np.float32)
    d = np.array([[0, 0, 1.0]], dtype=np.float32)
    count, voxels, dists = r.trace_hits(o, d)
    count = int(np.asarray(count)[0])
    voxels = np.asarray(voxels)[0]
    assert count == 2
    assert tuple(voxels[0]) == (5, 5, 4)
    assert tuple(voxels[1]) == (5, 5, 10)
    assert np.asarray(dists)[0, 0] < np.asarray(dists)[0, 1]


def test_composite_opaque_front_wins():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((5, 5, 4), RED)
    tree.insert((5, 5, 10), GREEN)
    r = SoftRenderer(tree, max_hits=2)
    params = r.init_params(init_opacity=0.999)
    o = np.array([[5.5, 5.5, -3.0]], dtype=np.float32)
    d = np.array([[0, 0, 1.0]], dtype=np.float32)
    rgb = np.asarray(r.render(params, o, d))
    assert rgb[0, 0] > 0.9 and rgb[0, 1] < 0.05  # front red dominates


def test_occupancy_gradient_carves_voxel():
    """Fitting against a target image without the front voxel drives its
    opacity toward zero, revealing the voxel behind."""
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(3, 9):
        for y in range(3, 9):
            tree.insert((x, y, 10), GREEN)  # back wall
    tree.insert((5, 5, 4), RED)  # the voxel to carve

    r = SoftRenderer(tree, max_hits=3)
    # rays covering the front voxel and the wall
    xs, ys = np.meshgrid(np.linspace(3.2, 8.8, 12), np.linspace(3.2, 8.8, 12))
    origins = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, -3.0)], axis=1
    ).astype(np.float32)
    dirs = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (xs.size, 1))

    # target: the wall only (green everywhere)
    green = np.tile(np.array([[0.0, 1.0, 0.0]], dtype=np.float32), (xs.size, 1))

    params, losses = fit_soft(
        r, origins, dirs, green, steps=250, lr=0.1, fit_albedo=False
    )
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])

    # the carved voxel's opacity collapsed
    S = r.size
    addr = 5 + 5 * S + 4 * S * S
    alpha = float(jax.nn.sigmoid(params["logits"][addr]))
    assert alpha < 0.1, alpha
    # the wall's opacity survived
    addr_wall = 5 + 5 * S + 10 * S * S
    alpha_wall = float(jax.nn.sigmoid(params["logits"][addr_wall]))
    assert alpha_wall > 0.5, alpha_wall


def test_albedo_gradients_flow_through_composite():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((5, 5, 4), RED)
    r = SoftRenderer(tree, max_hits=2)
    params = r.init_params()
    o = np.array([[5.5, 5.5, -3.0]], dtype=np.float32)
    d = np.array([[0, 0, 1.0]], dtype=np.float32)
    _c, voxels, _ = r.trace_hits(o, d)

    def loss(p):
        rgb = r.composite(p, voxels)
        return jnp.sum((rgb - jnp.array([[0.0, 0.0, 1.0]])) ** 2)

    grads = jax.grad(loss)(params)
    S = r.size
    addr = 5 + 5 * S + 4 * S * S
    galb = np.asarray(grads["albedo"]).reshape(-1, 3)  # flat or row layout
    assert np.abs(galb[addr]).sum() > 0
    assert abs(float(grads["logits"][addr])) >= 0  # finite


def test_occupancy_gradient_finite_difference_parity():
    """AD gradients of the soft loss w.r.t. opacity LOGITS match central
    finite differences (completes the FD coverage: albedo FD parity lives in
    test_diff_and_parallel.py)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((5, 5, 4), RED)
    tree.insert((5, 5, 10), GREEN)

    r = SoftRenderer(tree, max_hits=3)
    params = r.init_params(init_opacity=0.7)
    origins = np.array([[5.5, 5.5, -3.0]], dtype=np.float32)
    dirs = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    _count, voxels, _t = r.trace_hits(origins, dirs)
    target = jnp.zeros((1, 3), jnp.float32)

    grads = jax.grad(lambda p: r.loss(p, voxels, target))(params)

    S = r.size
    eps = 1e-3
    for addr in (5 + 5 * S + 4 * S * S, 5 + 5 * S + 10 * S * S):
        base = params["logits"][addr]

        def loss_at(v):
            p = dict(params)
            p["logits"] = params["logits"].at[addr].set(v)
            return float(r.loss(p, voxels, target))

        fd = (loss_at(base + eps) - loss_at(base - eps)) / (2 * eps)
        ad = float(grads["logits"][addr])
        assert abs(fd) > 1e-6  # the voxel genuinely affects the loss
        assert abs(fd - ad) <= 1e-3 * max(1.0, abs(fd)), (fd, ad)


def test_multihit_compacted_matches_plain():
    """The compacted multi-hit tracer returns identical counts/voxels/dists
    to the plain K-serial-march tracer."""
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(11)
    for _ in range(600):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)

    r = SoftRenderer(tree, max_hits=3)
    n = 3000
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    keep = (np.abs(targets - np.round(targets)) >= 0.05).all(axis=1)
    targets, dirs = targets[keep], dirs[keep]
    origins = (targets - dirs * 100).astype(np.float32)
    dirs = dirs.astype(np.float32)

    c1, v1, d1 = r.trace_hits(origins, dirs, compact=False)
    # min_bucket small enough that compaction actually fires mid-segment:
    # the round-1 default (8192 > ray count) never compacted, hiding a
    # dropped-hit-rays bug this test now guards against
    c2, v2, d2 = r.trace_hits_compacted(origins, dirs, min_bucket=256)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6, atol=1e-5)

    # second call replays the recorded schedule as ONE fused program —
    # must be identical to the adaptive pass (and hence the plain tracer)
    assert r._soft_plans  # the adaptive pass recorded a schedule
    c2f, v2f, d2f = r.trace_hits_compacted(origins, dirs, min_bucket=256)
    assert r._fused_hits_fns  # ...and the replay actually fused
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c2f))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v2f))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2f), rtol=1e-6, atol=1e-5)

    # the skip-tracer variant must agree too (its own continue-state path);
    # voxels/counts exactly, distances to float-path tolerance (the two
    # formulations advance the impact point through different float chains)
    r_skip = SoftRenderer(tree, max_hits=3, tracer="skip")
    c3, v3, d3 = r_skip.trace_hits_compacted(origins, dirs, min_bucket=256)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c3))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v3))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), atol=1e-2)


def test_multihit_beam_start_matches_plain():
    """Beam prepass + round-0 compaction preserve the multi-hit record
    exactly (the beam proves no occupied voxel before each tile's start,
    so the first K hits are unchanged), including on the fused replay
    where the beam is traced into the one-dispatch program."""
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(28, 36):
        for y in range(28, 36):
            for z in range(28, 36):
                tree.insert((x, y, z), RED)
    r = SoftRenderer(tree, max_hits=2)
    cam = orbit_camera(64.0, distance_factor=3.0, resolution=(160, 120))
    o, d = device_rays(cam)
    o = jnp.reshape(o, (-1, 3))
    d = jnp.reshape(d, (-1, 3))
    c0, v0, d0 = r.trace_hits_compacted(o, d, min_bucket=256)
    spec = r.beam_spec(cam)
    assert spec is not None
    cb, vb, db = r.trace_hits_compacted(o, d, min_bucket=256, beam=spec)
    # the round-0 compaction actually fired on this sky-dominated camera
    plan = r._soft_plans.get((o.shape[0], True))
    assert plan and plan["pre"] is not None and plan["pre"] < o.shape[0]
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(vb))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(db), rtol=1e-6, atol=1e-5
    )
    # fused replay (beam traced in) — identical again
    cf, vf, df = r.trace_hits_compacted(o, d, min_bucket=256, beam=spec)
    assert any(k[4] is not None for k in r._fused_hits_fns)  # beam fused
    np.testing.assert_array_equal(np.asarray(cb), np.asarray(cf))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(vf))
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(df), rtol=1e-6, atol=1e-5
    )


def test_multihit_beam_respects_dilated_candidates():
    """The beam derives occupancy from the traversal PYRAMID, not colors:
    a with_candidates renderer occupies colorless dilated voxels, and the
    beam must not prove tiles dead that contain only candidates."""
    from voxelhex_tpu.diff.soft import with_candidates
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = BoxTree(64, 4, auto_simplify=False)
    for x in range(28, 36):
        for y in range(28, 36):
            for z in range(28, 36):
                tree.insert((x, y, z), RED)
    r, params, cand = with_candidates(tree, radius=1, max_hits=3)
    cam = orbit_camera(64.0, distance_factor=3.0, resolution=(160, 120))
    o, d = device_rays(cam)
    o = jnp.reshape(o, (-1, 3))
    d = jnp.reshape(d, (-1, 3))
    c0, v0, _ = r.trace_hits_compacted(o, d, min_bucket=256)
    spec = r.beam_spec(cam)
    assert spec is not None
    cb, vb, _ = r.trace_hits_compacted(o, d, min_bucket=256, beam=spec)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(vb))


def test_grad_on_hits_matches_full_loss():
    """Hit-compacted backward: identical loss value and gradients to
    value_and_grad of the full-frame loss — no-hit rays carry zero grad
    and a params-free constant, both preserved by the compaction."""
    import jax

    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(5)
    for _ in range(400):
        p = tuple(int(v) for v in rng.integers(20, 44, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    r = SoftRenderer(tree, max_hits=2)
    n = 4096  # plenty of sky rays: most directions miss the content blob
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 150).astype(np.float32)
    dirs = dirs.astype(np.float32)

    count, voxels, _d = r.trace_hits(origins, dirs, compact=False)
    assert 0 < int(np.asarray(count > 0).sum()) < n // 4  # sky-dominated
    params = r.init_params()
    target = np.asarray(rng.random((n, 3)), dtype=np.float32)

    l_full, g_full = jax.value_and_grad(
        lambda p: r.loss(p, jax.lax.stop_gradient(voxels), target)
    )(params)
    l_c, g_c = r.grad_on_hits(params, count, voxels, target, min_bucket=64)
    assert int(np.asarray(count > 0).sum()) <= 1024 < n  # bucket < R
    np.testing.assert_allclose(float(l_c), float(l_full), rtol=1e-5)
    for k in g_full:
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_full[k]), rtol=1e-4, atol=1e-7
        )


def test_grad_on_hits_planned_bucket_parity():
    """The PLANNED backward (bucket reused from the last step, hit count
    validated in-program) must return identical loss/grads to the
    adaptive first call — and a poisoned (too-small) plan must fall back
    exactly."""
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(8)
    for _ in range(400):
        p = tuple(int(v) for v in rng.integers(20, 44, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    r = SoftRenderer(tree, max_hits=2)
    n = 4096
    targets = rng.random((n, 3)) * 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (targets - dirs * 150).astype(np.float32)
    count, voxels, _d = r.trace_hits(origins, dirs.astype(np.float32),
                                     compact=False)
    params = r.init_params()
    target = np.asarray(rng.random((n, 3)), dtype=np.float32)

    l1, g1 = r.grad_on_hits(params, count, voxels, target, min_bucket=64)
    assert r._grad_plans.get(n) is not None  # plan recorded
    l2, g2 = r.grad_on_hits(params, count, voxels, target, min_bucket=64)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for k in g1:
        np.testing.assert_array_equal(np.asarray(g2[k]), np.asarray(g1[k]))

    # poisoned plan: fewer slots than hits -> in-program count detects the
    # overflow and the adaptive path recomputes, identical results
    r._grad_plans[n] = 2
    l3, g3 = r.grad_on_hits(params, count, voxels, target, min_bucket=64)
    np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g3[k]), np.asarray(g1[k]), atol=1e-7
        )
    assert r._grad_plans[n] != 2  # re-planned after the overflow


def test_candidate_dilation_grows_missing_voxel():
    """with_candidates lets gradients ADD geometry: fitting against a target
    that contains a voxel missing from the scene raises that voxel's opacity
    (the plain soft path cannot — absent voxels are never recorded)."""
    from voxelhex_tpu.diff.soft import with_candidates

    # complete wall (the target scene) and the same wall with a hole
    def make(missing):
        t = BoxTree(16, 4, auto_simplify=False)
        for x in range(4, 10):
            for y in range(4, 10):
                if missing and (x, y) == (6, 6):
                    continue
                t.insert((x, y, 8), RED)
        return t

    full, holed = make(False), make(True)

    # target image: the full wall rendered opaque
    r_full = SoftRenderer(full, max_hits=2)
    p_full = r_full.init_params(init_opacity=0.999)
    xs, ys = np.meshgrid(np.linspace(4.2, 9.8, 14), np.linspace(4.2, 9.8, 14))
    origins = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, -2.0)], axis=1
    ).astype(np.float32)
    dirs = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (xs.size, 1))
    target = np.asarray(r_full.render(p_full, origins, dirs))

    r, params, cand = with_candidates(holed, radius=1, max_hits=3)
    assert cand.sum() > 0
    from voxelhex_tpu.diff.soft import fit_soft

    params2, losses = fit_soft(
        r, origins, dirs, target, steps=300, lr=0.1, params0=params
    )
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    S = r.size
    addr = 6 + 6 * S + 8 * S * S  # the missing voxel
    import jax

    alpha = float(jax.nn.sigmoid(params2["logits"][addr]))
    assert alpha > 0.5, alpha


def test_fit_checkpoint_resume_identical(tmp_path):
    """An interrupted fit resumed from its checkpoint produces exactly the
    same parameters as an uninterrupted run (checkpoint/resume subsystem)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(3, 9):
        for y in range(3, 9):
            tree.insert((x, y, 10), GREEN)
    tree.insert((5, 5, 4), RED)

    r = SoftRenderer(tree, max_hits=3)
    xs, ys = np.meshgrid(np.linspace(3.2, 8.8, 8), np.linspace(3.2, 8.8, 8))
    origins = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, -3.0)], axis=1
    ).astype(np.float32)
    dirs = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (xs.size, 1))
    targets = np.tile(np.array([[0.0, 0.8, 0.0]], dtype=np.float32),
                      (xs.size, 1))

    ref, _ = fit_soft(r, origins, dirs, targets, steps=12, lr=0.1)

    ck = str(tmp_path / "fit.ckpt")
    # "interrupted" run: stops after 6 steps, checkpointing every 3
    fit_soft(r, origins, dirs, targets, steps=6, lr=0.1,
             checkpoint_path=ck, checkpoint_every=3)
    # resumed run continues from step 6 to 12
    resumed, losses = fit_soft(r, origins, dirs, targets, steps=12, lr=0.1,
                               checkpoint_path=ck)
    assert len(losses) == 6  # only the remaining steps ran
    np.testing.assert_array_equal(np.asarray(resumed["albedo"]),
                                  np.asarray(ref["albedo"]))
    np.testing.assert_array_equal(np.asarray(resumed["logits"]),
                                  np.asarray(ref["logits"]))

    # a fresh call with a COMPLETE checkpoint is a no-op resume
    again, losses2 = fit_soft(r, origins, dirs, targets, steps=12, lr=0.1,
                              checkpoint_path=ck)
    assert losses2 == []
    np.testing.assert_array_equal(np.asarray(again["albedo"]),
                                  np.asarray(ref["albedo"]))


def test_train_state_roundtrip_and_validation(tmp_path):
    import optax
    import pytest

    from voxelhex_tpu.io.checkpoint import load_train_state, save_train_state

    params = {"albedo": jnp.ones((5, 3)), "logits": jnp.zeros(5)}
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    p = str(tmp_path / "state.ckpt")
    save_train_state(p, 7, params, opt_state)
    step, params2, opt_state2 = load_train_state(p, params, opt_state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # mismatched template structure is rejected
    with pytest.raises(ValueError):
        load_train_state(p, {"albedo": jnp.ones((5, 3))}, opt_state)
    # mismatched leaf shape is rejected
    with pytest.raises(ValueError):
        load_train_state(p, {"albedo": jnp.ones((4, 3)), "logits": jnp.zeros(5)},
                         opt_state)


def test_flat_albedo_bwd_grad_parity():
    """flat_albedo_bwd reroutes only the albedo gather's BACKWARD through a
    flat 1-D scatter; loss and every gradient must be identical to the
    default row-scatter VJP (it is the same math on a different layout)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    for x in range(3, 9):
        for y in range(3, 9):
            tree.insert((x, y, 10), GREEN)
    tree.insert((5, 5, 4), RED)

    r_row = SoftRenderer(tree, max_hits=3, flat_albedo_bwd=False)
    r_flat = SoftRenderer(tree, max_hits=3, flat_albedo_bwd=True)
    params = r_row.init_params(init_opacity=0.7)

    xs, ys = np.meshgrid(np.linspace(3.2, 8.8, 8), np.linspace(3.2, 8.8, 8))
    o = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, -3.0)], axis=1
    ).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], dtype=np.float32), (xs.size, 1))

    count, voxels, _ = r_row.trace_hits(o, d)
    voxels = jax.lax.stop_gradient(voxels)
    target = jnp.zeros((o.shape[0], 3), dtype=jnp.float32)

    def grads_of(r):
        def loss_fn(p):
            return r.loss(p, voxels, target)

        return jax.value_and_grad(loss_fn)(params)

    loss_row, g_row = grads_of(r_row)
    loss_flat, g_flat = grads_of(r_flat)
    assert np.allclose(float(loss_row), float(loss_flat), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(g_row["albedo"]), np.asarray(g_flat["albedo"]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_row["logits"]), np.asarray(g_flat["logits"]),
        rtol=0, atol=0,
    )

    # grad_on_hits (the bench/training entry point) must agree too
    l1, gh_row = r_row.grad_on_hits(params, count, voxels, target)
    l2, gh_flat = r_flat.grad_on_hits(params, count, voxels, target)
    assert np.allclose(float(l1), float(l2), rtol=1e-7, atol=0)
    np.testing.assert_allclose(
        np.asarray(gh_row["albedo"]), np.asarray(gh_flat["albedo"]),
        rtol=1e-6, atol=1e-7,
    )


def _step_scene():
    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(11)
    for _ in range(60):
        p = tuple(int(v) for v in rng.integers(2, 14, 3))
        tree.insert(p, RED if rng.integers(2) else GREEN)
    return tree


def test_train_step_fused_matches_recording_path():
    """The ONE-dispatch training step (march + backward + L1 + optimizer
    update + clamps in a single program) must match the multi-dispatch
    recording path step-for-step over a short fit, including opacity_l1
    and fit_albedo=False variants."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    for kwargs in ({}, {"opacity_l1": 0.02}, {"fit_albedo": False}):
        ra = SoftRenderer(tree, max_hits=2, max_iters=256)
        rb = SoftRenderer(tree, max_hits=2, max_iters=256)
        params_a = ra.init_params()
        params_b = rb.init_params()
        _c, voxels, _t = ra.trace_hits(o, d, compact=True)
        target = jax.lax.stop_gradient(
            ra.composite(params_a, jax.lax.stop_gradient(voxels))
        )
        opt = optax.adam(0.05)
        sa = opt.init(params_a)
        sb = opt.init(params_b)
        losses_a, losses_b = [], []
        for i in range(4):
            # renderer A: always the recording (multi-dispatch) path
            params_a, sa, la = ra._train_step_recording(
                params_a, sa, opt, o, d, target, None,
                kwargs.get("opacity_l1", 0.0),
                kwargs.get("fit_albedo", True),
            )
            # renderer B: train_step_fused (records on step 1, fused after)
            params_b, sb, lb = rb.train_step_fused(
                params_b, sb, opt, o, d, target, **kwargs
            )
            losses_a.append(float(la))
            losses_b.append(float(lb))
        assert rb._step_validated is not None  # the fused program ran
        np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(params_a["logits"]), np.asarray(params_b["logits"]),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(params_a["albedo"]), np.asarray(params_b["albedo"]),
            rtol=1e-6, atol=1e-7,
        )


def test_train_step_fused_with_beam():
    """train_step_fused with the beam prepass traced in matches the plain
    fused step's losses/params (the beam is hit-mask exact)."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(64, 48))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    r1 = SoftRenderer(tree, max_hits=2, max_iters=256)
    r2 = SoftRenderer(tree, max_hits=2, max_iters=256)
    spec = r2.beam_spec(cam)
    if spec is None:
        return  # geometry can't satisfy the beam bound; nothing to test
    params = r1.init_params()
    _c, voxels, _t = r1.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        r1.composite(params, jax.lax.stop_gradient(voxels))
    )
    opt = optax.adam(0.05)
    p1, s1 = params, opt.init(params)
    p2, s2 = params, opt.init(params)
    for _ in range(3):
        p1, s1, l1 = r1.train_step_fused(p1, s1, opt, o, d, target)
        p2, s2, l2 = r2.train_step_fused(p2, s2, opt, o, d, target,
                                         beam=spec)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["logits"]), np.asarray(p2["logits"]),
        rtol=1e-6, atol=1e-7,
    )


def test_flat_params_layout_matches_row_layout():
    """flat_params=True (end-to-end [S^3*3] albedo: composite, VJP,
    optimizer, clamps) must produce bit-identical losses and gradients to
    the row layout — grads related by ravel() — across grad_on_hits AND
    a short train_step_fused fit."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    r_row = SoftRenderer(tree, max_hits=2, max_iters=256)
    r_flat = SoftRenderer(tree, max_hits=2, max_iters=256, flat_params=True)
    p_row = r_row.init_params()
    p_flat = r_flat.init_params()
    np.testing.assert_array_equal(
        np.asarray(p_row["albedo"]).ravel(), np.asarray(p_flat["albedo"])
    )

    c, voxels, _t = r_row.trace_hits(o, d, compact=True)
    voxels = jax.lax.stop_gradient(voxels)
    target = jax.lax.stop_gradient(r_row.composite(p_row, voxels))

    # composite parity
    np.testing.assert_array_equal(
        np.asarray(r_row.composite(p_row, voxels)),
        np.asarray(r_flat.composite(p_flat, voxels)),
    )
    # grads: flat == row.ravel(), bit-exact
    l1, g1 = r_row.grad_on_hits(p_row, c, voxels, target)
    c2, voxels2, _t2 = r_flat.trace_hits(o, d, compact=True)
    l2, g2 = r_flat.grad_on_hits(p_flat, c2, voxels2, target)
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(
        np.asarray(g1["albedo"]).ravel(), np.asarray(g2["albedo"])
    )
    np.testing.assert_array_equal(
        np.asarray(g1["logits"]), np.asarray(g2["logits"])
    )

    # short fused-step fit: losses and params stay identical
    opt = optax.adam(0.05)
    s_row, s_flat = opt.init(p_row), opt.init(p_flat)
    for _ in range(3):
        p_row, s_row, lr_ = r_row.train_step_fused(
            p_row, s_row, opt, o, d, target, opacity_l1=0.01
        )
        p_flat, s_flat, lf_ = r_flat.train_step_fused(
            p_flat, s_flat, opt, o, d, target, opacity_l1=0.01
        )
        np.testing.assert_allclose(float(lr_), float(lf_), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(p_row["albedo"]).ravel(), np.asarray(p_flat["albedo"]),
        rtol=1e-6, atol=1e-7,
    )


def test_train_step_fused_revalidates_on_new_rays():
    """Swapping the ray batch re-validates the plan (new rays token); a
    harder view that overflows the recorded schedule falls back to the
    adaptive path and still returns exact results."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    easy = orbit_camera(16.0, distance_factor=6.0, resolution=(32, 24))
    hard = orbit_camera(16.0, distance_factor=1.05, resolution=(32, 24))
    oe, de = (a.reshape(-1, 3) for a in device_rays(easy))
    oh, dh = (a.reshape(-1, 3) for a in device_rays(hard))
    params = r.init_params()
    opt = optax.adam(0.05)
    s = opt.init(params)
    tgt = jnp.zeros((oe.shape[0], 3), dtype=jnp.float32)
    for _ in range(2):  # record + fused-validate on the easy view
        p2, s2, l2 = r.train_step_fused(params, s, opt, oe, de, tgt)
    assert r._step_validated is not None
    # now the hard view, same R: token differs -> re-validation; whatever
    # path runs, the result must equal the recording path's
    ra = SoftRenderer(tree, max_hits=2, max_iters=256)
    pa, sa, la = ra._train_step_recording(
        params, s, opt, oh, dh, tgt, None, 0.0, True
    )
    pb, sb, lb = r.train_step_fused(params, s, opt, oh, dh, tgt)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pa["logits"]), np.asarray(pb["logits"]),
        rtol=1e-6, atol=1e-7,
    )


def test_params_to_tree_round_trip_and_carve():
    """params_to_tree closes the fit loop: an identity bake reproduces
    the source scene's voxels + colors exactly; carving a voxel's logit
    removes it; a grown candidate (with_candidates) appears with its
    learned color.  The baked tree renders through the production
    tracer."""
    from voxelhex_tpu.diff.soft import params_to_tree, with_candidates
    from voxelhex_tpu.tree.flat import flatten

    tree = _step_scene()
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params = r.init_params()

    baked = params_to_tree(r, params)
    for x in range(16):
        for y in range(16):
            for z in range(16):
                a = tree.get((x, y, z))
                b = baked.get((x, y, z))
                assert a.is_some == b.is_some, (x, y, z)
                if a.is_some:
                    assert (a.albedo.r, a.albedo.g, a.albedo.b) == (
                        b.albedo.r, b.albedo.g, b.albedo.b), (x, y, z)

    # carve: drive one occupied voxel's opacity to zero
    occ_addr = None
    for x in range(16):
        for y in range(16):
            for z in range(16):
                if tree.get((x, y, z)).is_some:
                    occ_addr = (x, y, z)
                    break
            if occ_addr:
                break
        if occ_addr:
            break
    ax = occ_addr[0] + occ_addr[1] * 16 + occ_addr[2] * 256
    params2 = dict(params, logits=params["logits"].at[ax].set(-8.0))
    carved = params_to_tree(r, params2)
    assert not carved.get(occ_addr).is_some
    # everything else survives
    n_before = sum(
        1 for x in range(16) for y in range(16) for z in range(16)
        if baked.get((x, y, z)).is_some
    )
    n_after = sum(
        1 for x in range(16) for y in range(16) for z in range(16)
        if carved.get((x, y, z)).is_some
    )
    assert n_after == n_before - 1

    # grow: a candidate voxel raised above threshold appears, colored
    r2, p2, cand = with_candidates(flatten(tree), radius=1, max_hits=3,
                                   max_iters=256)
    cidx = int(np.flatnonzero(cand)[0])
    S = r2.size
    p2 = dict(p2, logits=p2["logits"].at[cidx].set(8.0))
    alb = p2["albedo"].reshape(-1, 3).at[cidx].set(
        jnp.array([1.0, 0.0, 0.0])
    )
    p2 = dict(p2, albedo=alb.reshape(-1) if r2.flat_params else alb)
    grown = params_to_tree(r2, p2, threshold=0.6)
    gx, gy, gz = cidx % S, (cidx // S) % S, cidx // (S * S)
    e = grown.get((gx, gy, gz))
    assert e.is_some and e.albedo.r == 255 and e.albedo.g == 0

    # the baked tree renders through the production path
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera

    img = BitGridRenderer(flatten(baked), max_iters=256).render(
        orbit_camera(16.0, resolution=(24, 16))
    )
    assert np.isfinite(img).all()


def test_step_validate_token_robust_to_aliasing():
    """The fused step's validate-once token must not trust raw id():
    a NUMPY ray buffer refilled in place, or a fresh array recycling a
    dead array's id, has to force a fresh counts validation (advisor
    finding: silent plan-overflow skips corrupt gradients)."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o_dev, d_dev = device_rays(cam)
    o_np = np.asarray(o_dev).reshape(-1, 3).copy()
    d_np = np.asarray(d_dev).reshape(-1, 3).copy()

    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params = r.init_params()
    _c, voxels, _t = r.trace_hits(o_np, d_np, compact=True)
    target = jax.lax.stop_gradient(
        r.composite(params, jax.lax.stop_gradient(voxels))
    )
    opt = optax.adam(0.05)
    s = opt.init(params)
    for _ in range(3):  # record, then fuse + validate
        params, s, _l = r.train_step_fused(params, s, opt, o_np, d_np,
                                           target)
    assert r._step_validated is not None
    vkey = r._step_validated[0]
    # same live objects, same content: the blocking read is skipped
    assert r._step_token_matches(vkey, o_np, d_np)
    # in-place refill of the SAME buffer: token must fail (content moved)
    o_np[0, 0] += 1.0
    assert not r._step_token_matches(vkey, o_np, d_np)
    o_np[0, 0] -= 1.0
    assert r._step_token_matches(vkey, o_np, d_np)
    # a DIFFERENT object (even equal content) fails the weakref identity
    assert not r._step_token_matches(vkey, o_np.copy(), d_np)
    # dead-object id recycling: once the validated arrays die, the token
    # must not match anything (the weakref clears)
    o2, d2 = o_np.copy(), d_np.copy()
    del o_np, d_np
    assert not r._step_token_matches(vkey, o2, d2)


def test_train_step_fused_chained_convergence():
    """Chained one-dispatch training steps must actually TRAIN: starting
    from perturbed params and fitting toward the true composite, the loss
    over 30 device-chained steps decreases and ends well below where it
    started (the CI-visible anchor for the 1080p convergence recording in
    benches/fwd_bwd.py)."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params_true = r.init_params()
    _c, voxels, _t = r.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        r.composite(params_true, jax.lax.stop_gradient(voxels))
    )
    p = {
        "albedo": jnp.clip(params_true["albedo"] + 0.3, 0.0, 1.0),
        "logits": params_true["logits"] * 0.7,
    }
    opt = optax.adam(0.05)
    s = opt.init(p)
    losses = []
    for block in range(3):  # 3 x 10 chained steps, one read per block
        loss = None
        for _ in range(10):
            p, s, loss = r.train_step_fused(p, s, opt, o, d, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def test_train_steps_fused_chain_matches_sequential():
    """train_steps_fused (N steps scanned into ONE program) must equal N
    sequential train_step_fused calls bit-for-bit — params, opt state and
    every per-step loss — plain and with the beam prepass traced in."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    ra = SoftRenderer(tree, max_hits=2, max_iters=256)
    rb = SoftRenderer(tree, max_hits=2, max_iters=256)
    params = ra.init_params()
    _c, voxels, _t = ra.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        ra.composite(params, jax.lax.stop_gradient(voxels))
    )
    opt = optax.adam(0.05)

    for beam_wanted in (False, True):
        beam_a = ra.beam_spec(cam) if beam_wanted else None
        beam_b = rb.beam_spec(cam) if beam_wanted else None
        if beam_wanted and (beam_a is None or beam_b is None):
            continue  # beam can decline on tiny scenes
        pa = jax.tree.map(jnp.array, params)
        sa = opt.init(pa)
        pb = jax.tree.map(jnp.array, params)
        sb = opt.init(pb)
        # record plans on both renderers (2 warm steps each)
        for _ in range(2):
            pa0, sa0, _ = ra.train_step_fused(pa, sa, opt, o, d, target,
                                              beam=beam_a)
            pb0, sb0, _ = rb.train_step_fused(pb, sb, opt, o, d, target,
                                              beam=beam_b)
        losses_a = []
        for _ in range(3):
            pa, sa, la = ra.train_step_fused(pa, sa, opt, o, d, target,
                                             beam=beam_a)
            losses_a.append(np.asarray(la))
        pb, sb, losses_b = rb.train_steps_fused(pb, sb, opt, o, d, target,
                                                3, beam=beam_b)
        assert losses_b.shape == (3,)
        np.testing.assert_array_equal(np.asarray(losses_b),
                                      np.stack(losses_a))
        for k in pa:
            np.testing.assert_array_equal(np.asarray(pa[k]),
                                          np.asarray(pb[k]))


def test_train_steps_fused_records_then_chains():
    """From a cold renderer, train_steps_fused falls back to per-step
    recording, then later calls ride the scanned chain program."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params = r.init_params()
    _c, voxels, _t = r.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        r.composite(params, jax.lax.stop_gradient(voxels))
    )
    opt = optax.adam(0.05)
    s = opt.init(params)
    p, s, l1 = r.train_steps_fused(params, s, opt, o, d, target, 2)
    assert l1.shape == (2,)
    key_chain = [k for k in r._step_fns if k[-1] == "chain"]
    p, s, l2 = r.train_steps_fused(p, s, opt, o, d, target, 2)
    assert [k for k in r._step_fns if k[-1] == "chain"]
    assert np.all(np.isfinite(np.asarray(l2)))


def test_step_validate_token_tracks_tree_content():
    """The validate-once token must also fail when the SCENE changes:
    a tree swap / in-place device refresh replaces the occupancy array,
    and the next step has to re-validate its plan against the new
    content (review finding: the ray-only token skipped that)."""
    import optax

    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(32, 24))
    o, d = device_rays(cam)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params = r.init_params()
    _c, voxels, _t = r.trace_hits(o, d, compact=True)
    target = jax.lax.stop_gradient(
        r.composite(params, jax.lax.stop_gradient(voxels))
    )
    opt = optax.adam(0.05)
    s = opt.init(params)
    for _ in range(3):
        params, s, _l = r.train_step_fused(params, s, opt, o, d, target)
    vkey = r._step_validated[0]
    assert r._step_token_matches(vkey, o, d)
    # simulate a content refresh: the device tree's occupancy array is
    # replaced (every edit/swap path does this)
    t2 = dict(r._compact_renderer.tree)
    t2["occ_pairs"] = t2["occ_pairs"] + 0
    r._compact_renderer.tree = t2
    assert not r._step_token_matches(vkey, o, d)


def test_fit_soft_chain_matches_per_step():
    """fit_soft's scanned grad-step blocks must reproduce the per-step
    loop bit-for-bit: same loss history, same final params — including
    around checkpoint boundaries that force remainder blocks."""
    from voxelhex_tpu.diff.soft import fit_soft
    from voxelhex_tpu.render.camera import device_rays, orbit_camera

    tree = _step_scene()
    cam = orbit_camera(16.0, resolution=(24, 18))
    o, d = device_rays(cam)
    r = SoftRenderer(tree, max_hits=2, max_iters=256)
    params_true = r.init_params()
    _c, v, _t = r.trace_hits(o.reshape(-1, 3), d.reshape(-1, 3))
    target = np.asarray(
        r.composite(params_true, jax.lax.stop_gradient(v))
    )
    p0 = {
        "albedo": jnp.clip(params_true["albedo"] + 0.2, 0.0, 1.0),
        "logits": params_true["logits"] * 0.5,
    }
    pa, la = fit_soft(r, o, d, target, steps=11, params0=p0, chain=1)
    pb, lb = fit_soft(r, o, d, target, steps=11, params0=p0, chain=4)
    assert len(la) == len(lb) == 11
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for k in pa:
        np.testing.assert_array_equal(np.asarray(pa[k]),
                                      np.asarray(pb[k]))
