"""Differentiable rendering + multi-device sharding tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voxelhex_tpu.diff.fit import fit_albedo
from voxelhex_tpu.diff.render import DiffRenderer
from voxelhex_tpu.parallel.render import (
    make_ray_mesh,
    shard_rays,
    sharded_render_fn,
    sharded_train_step,
)
from voxelhex_tpu.render.camera import orbit_camera
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


@pytest.fixture(scope="module")
def small_scene():
    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(13)
    for _ in range(60):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    tree.insert_at_lod((4, 4, 4), 4, GREEN)  # a solid node to exercise densify
    return flatten(tree)


@pytest.fixture(scope="module")
def rays(small_scene):
    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    o, d = cam.rays()
    return o.reshape(-1, 3), d.reshape(-1, 3)


def test_densify_removes_solids(small_scene):
    diff = DiffRenderer(small_scene)
    from voxelhex_tpu.tree.flat import EMPTY_DESC, SOLID_FLAG

    ch = diff.flat.node_children
    meta = diff.flat.node_meta
    leaf_rows = (meta & 1) != 0
    descs = ch[leaf_rows].reshape(-1)
    solid = (descs != EMPTY_DESC) & ((descs & SOLID_FLAG) != 0)
    assert not solid.any()


def test_gradients_flow_to_hit_voxels(small_scene, rays):
    origins, dirs = rays
    diff = DiffRenderer(small_scene)
    params = diff.init_params()
    target = jnp.zeros((origins.shape[0], 3))

    loss, grads = jax.value_and_grad(diff.loss)(
        params, jnp.asarray(origins), jnp.asarray(dirs), target
    )
    g = np.asarray(grads)
    assert float(loss) > 0
    assert np.abs(g).sum() > 0
    # gradients only land on voxels, not everywhere
    assert (np.abs(g).sum(axis=-1) > 0).mean() < 0.9


def test_fit_recovers_albedo(small_scene, rays):
    origins, dirs = rays
    diff = DiffRenderer(small_scene)
    true_params = diff.init_params()
    target = diff.render(true_params, jnp.asarray(origins), jnp.asarray(dirs))

    # start from a gray init and recover
    init = jnp.full_like(true_params, 0.5)
    params, losses = fit_albedo(
        diff, origins, dirs, np.asarray(target), steps=150, lr=0.1, params0=init
    )
    assert losses[-1] < losses[0] * 0.02, (losses[0], losses[-1])

    # rendered image with fitted params matches the target closely
    out = diff.render(params, jnp.asarray(origins), jnp.asarray(dirs))
    err = float(jnp.mean(jnp.abs(out - target)))
    assert err < 0.02, err


def test_sharded_render_matches_single_device(small_scene, rays):
    origins, dirs = rays
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    diff = DiffRenderer(small_scene)
    params = diff.init_params()

    mesh = make_ray_mesh()
    render = sharded_render_fn(diff, mesh)
    (o_sh, d_sh), n = shard_rays(mesh, origins, dirs)
    rgb_sharded = np.asarray(render(params, o_sh, d_sh))[:n]

    rgb_single = np.asarray(
        jax.jit(diff.render)(params, jnp.asarray(origins), jnp.asarray(dirs))
    )
    np.testing.assert_allclose(rgb_sharded, rgb_single, atol=1e-5)


def test_sharded_train_step_matches_single_device(small_scene, rays):
    origins, dirs = rays
    diff = DiffRenderer(small_scene)
    params = diff.init_params()
    target = np.asarray(
        jax.jit(diff.render)(params, jnp.asarray(origins), jnp.asarray(dirs))
    )
    init = jnp.full_like(params, 0.5)

    opt = optax.sgd(0.1)

    # single-device step
    def loss_fn(p):
        rgb = diff.render(p, jnp.asarray(origins), jnp.asarray(dirs))
        return jnp.mean((rgb - target) ** 2)

    loss1, grads1 = jax.value_and_grad(loss_fn)(init)
    updates1, _ = opt.update(grads1, opt.init(init))
    ref_params = jnp.clip(init + updates1, 0.0, 1.0)

    # sharded step: ray count must divide the mesh for exact mean parity
    mesh = make_ray_mesh()
    n_keep = (origins.shape[0] // 8) * 8
    o, d, t = origins[:n_keep], dirs[:n_keep], target[:n_keep]
    (o_sh, d_sh, t_sh), _ = shard_rays(mesh, o, d, t)
    step = sharded_train_step(diff, mesh, opt)
    params2, _state, loss2 = step(init, opt.init(init), o_sh, d_sh, t_sh)

    # compare against a single-device step on the same truncated batch
    def loss_fn_trunc(p):
        rgb = diff.render(p, jnp.asarray(o), jnp.asarray(d))
        return jnp.mean((rgb - t) ** 2)

    loss1t, grads1t = jax.value_and_grad(loss_fn_trunc)(init)
    updates1t, _ = opt.update(grads1t, opt.init(init))
    ref_params_t = jnp.clip(init + updates1t, 0.0, 1.0)

    assert float(loss2) == pytest.approx(float(loss1t), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(params2), np.asarray(ref_params_t), atol=1e-5
    )


def test_albedo_gradient_matches_finite_differences(small_scene, rays):
    """Autodiff pixel-gradients w.r.t. albedo match central finite
    differences (the BASELINE gradient-parity gate)."""
    origins, dirs = rays
    # a small ray subset keeps the FD loop cheap
    o = jnp.asarray(origins[:200])
    d = jnp.asarray(dirs[:200])
    diff = DiffRenderer(small_scene)
    params = diff.init_params()
    target = jnp.zeros((200, 3))

    loss = lambda p: diff.loss(p, o, d, target)
    g = np.asarray(jax.grad(loss)(params))

    # check the 5 largest-gradient voxels with central differences
    flat_idx = np.argsort(-np.abs(g).sum(axis=-1).ravel())[:5]
    eps = 1e-3
    base = np.asarray(params)
    for fi in flat_idx:
        b, c, ch = np.unravel_index(fi, g.shape)
        p_plus = base.copy()
        p_plus[b, c, ch] += eps
        p_minus = base.copy()
        p_minus[b, c, ch] -= eps
        fd = (float(loss(jnp.asarray(p_plus))) - float(loss(jnp.asarray(p_minus)))) / (
            2 * eps
        )
        assert abs(fd - g[b, c, ch]) < 1e-3 + 0.05 * abs(fd), (
            fd,
            g[b, c, ch],
        )


def test_sharded_soft_train_step_matches_fit_soft(small_scene, rays):
    """BASELINE config 5 on a mesh: the sharded soft-occupancy step
    (albedo + opacity grads pmean'd across 8 devices) must equal the
    single-device fit_soft step exactly — and the pipelined-psum variant
    must match the plain sharded step."""
    from voxelhex_tpu.diff.soft import SoftRenderer, fit_soft
    from voxelhex_tpu.parallel.soft import (
        fit_soft_sharded,
        sharded_soft_train_step,
        sharded_soft_train_step_pipelined,
    )
    from voxelhex_tpu.parallel.render import shard_rays

    origins, dirs = rays
    n_keep = (origins.shape[0] // 16) * 16  # divides devices*microbatches
    o, d = origins[:n_keep], dirs[:n_keep]
    soft = SoftRenderer(small_scene, max_hits=2, max_iters=256)
    params0 = soft.init_params()
    _c, voxels, _t = soft.trace_hits(o, d)
    voxels = jax.lax.stop_gradient(voxels)
    target = np.asarray(soft.composite(params0, voxels))
    # fit from a perturbed start so gradients are non-trivial
    init = {
        "albedo": jnp.clip(params0["albedo"] + 0.25, 0.0, 1.0),
        "logits": params0["logits"] * 0.5,
    }

    # single-device reference: 3 fit_soft steps (adam, l1, clip — the
    # exact step the sharded path must reproduce)
    ref_params, ref_losses = fit_soft(
        soft, o, d, target, steps=3, lr=0.05,
        params0=jax.tree.map(jnp.array, init), opacity_l1=0.01,
    )

    mesh = make_ray_mesh()
    import optax

    opt = optax.adam(0.05)
    step = sharded_soft_train_step(soft, mesh, opt, opacity_l1=0.01)
    (v_sh, t_sh), _ = shard_rays(mesh, np.asarray(voxels), target)
    p = jax.tree.map(jnp.array, init)
    s = opt.init(p)
    losses = []
    for _ in range(3):
        p, s, loss = step(p, s, v_sh, t_sh)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)
    for k in ref_params:
        np.testing.assert_allclose(
            np.asarray(p[k]), np.asarray(ref_params[k]), atol=1e-5
        )

    # pipelined psum variant: numerically identical to the plain step
    piped = sharded_soft_train_step_pipelined(
        soft, mesh, opt, microbatches=2, opacity_l1=0.01
    )
    p2 = jax.tree.map(jnp.array, init)
    s2 = opt.init(p2)
    p2, s2, l2 = piped(p2, s2, v_sh, t_sh)
    assert float(l2) == pytest.approx(losses[0], rel=1e-5)

    # the one-call wrapper drives the same machinery
    pw, lw = fit_soft_sharded(
        soft, mesh, o, d, target, steps=2, lr=0.05,
        params0=jax.tree.map(jnp.array, init), opacity_l1=0.01,
    )
    np.testing.assert_allclose(lw, ref_losses[:2], rtol=1e-5)


def test_pipelined_train_step_matches_plain(small_scene, rays):
    """Per-microbatch psum (collective/compute overlap) must be numerically
    equivalent to the single-all-reduce step (psum is linear)."""
    from voxelhex_tpu.parallel.render import sharded_train_step_pipelined

    origins, dirs = rays
    diff = DiffRenderer(small_scene)
    params = diff.init_params()
    target = np.asarray(
        jax.jit(diff.render)(params, jnp.asarray(origins), jnp.asarray(dirs))
    )
    init = jnp.full_like(params, 0.5)
    opt = optax.sgd(0.1)
    mesh = make_ray_mesh()
    # ray count divisible by devices * microbatches
    K = 4
    n_keep = (origins.shape[0] // (8 * K)) * 8 * K
    o, d, t = origins[:n_keep], dirs[:n_keep], target[:n_keep]
    (o_sh, d_sh, t_sh), _ = shard_rays(mesh, o, d, t)

    plain = sharded_train_step(diff, mesh, opt)
    p1, _s1, l1 = plain(init, opt.init(init), o_sh, d_sh, t_sh)
    piped = sharded_train_step_pipelined(diff, mesh, opt, microbatches=K)
    p2, _s2, l2 = piped(init, opt.init(init), o_sh, d_sh, t_sh)

    assert float(l2) == pytest.approx(float(l1), rel=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-5)


def test_diff_flat_albedo_bwd_grad_parity(small_scene, rays):
    """DiffRenderer's flat-scatter albedo VJP must produce the identical
    loss and gradients as the default row-scatter VJP."""
    o, d = rays
    r_flat = DiffRenderer(small_scene, max_inner=256)  # default: flat bwd
    r_row = DiffRenderer(small_scene, max_inner=256, flat_albedo_bwd=False)
    params = r_flat.init_params()
    target = jnp.zeros((o.shape[0], 3), dtype=jnp.float32)

    def grads_of(r):
        def loss_fn(p):
            return r.loss(p, o, d, target)

        return jax.value_and_grad(loss_fn)(params)

    l_flat, g_flat = grads_of(r_flat)
    l_row, g_row = grads_of(r_row)
    assert np.allclose(float(l_flat), float(l_row), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(g_flat), np.asarray(g_row), rtol=1e-6, atol=1e-7
    )
    assert float(np.abs(np.asarray(g_flat)).sum()) > 0


def test_sharded_soft_e2e_trace_and_fit(small_scene):
    """VERDICT r3 #2: the soft forward trace runs ON the mesh — per-shard
    device raygen + per-shard multi-hit march.  The sharded trace must
    equal the single-device trace_hits, fit_soft_sharded(camera=...) must
    reproduce the single-device fit_soft losses/params, and the e2e
    online step (trace + grad + update in one sharded program) must match
    the single-device online step."""
    from voxelhex_tpu.diff.soft import SoftRenderer, fit_soft
    from voxelhex_tpu.parallel.soft import (
        fit_soft_sharded,
        sharded_soft_train_step_e2e,
        sharded_soft_trace_fn,
    )
    from voxelhex_tpu.render.camera import camera_params, device_rays

    cam = orbit_camera(small_scene.size, resolution=(40, 32))  # 32 rows / 8
    mesh = make_ray_mesh()
    soft = SoftRenderer(small_scene, max_hits=2, max_iters=256)

    # sharded trace == single-device trace (device raygen on both sides)
    o_d, d_d = device_rays(cam)
    c1, v1, t1 = soft.trace_hits(o_d.reshape(-1, 3), d_d.reshape(-1, 3))
    tr = sharded_soft_trace_fn(soft, mesh, cam.resolution)
    c2, v2, t2 = tr(soft.tree, *camera_params(cam))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    params0 = soft.init_params()
    target = np.asarray(soft.composite(params0, jax.lax.stop_gradient(v1)))
    init = {
        "albedo": jnp.clip(params0["albedo"] + 0.25, 0.0, 1.0),
        "logits": params0["logits"] * 0.5,
    }
    o_h = np.asarray(o_d).reshape(-1, 3)
    d_h = np.asarray(d_d).reshape(-1, 3)
    ref_params, ref_losses = fit_soft(
        soft, o_h, d_h, target, steps=3, lr=0.05,
        params0=jax.tree.map(jnp.array, init), opacity_l1=0.01,
    )
    # camera-driven fit: trace sharded on the mesh, no host rays at all
    pw, lw = fit_soft_sharded(
        soft, mesh, None, None, target, steps=3, lr=0.05,
        params0=jax.tree.map(jnp.array, init), opacity_l1=0.01, camera=cam,
    )
    np.testing.assert_allclose(lw, ref_losses, rtol=1e-5)
    for k in ref_params:
        np.testing.assert_allclose(
            np.asarray(pw[k]), np.asarray(ref_params[k]), atol=1e-5
        )

    # e2e ONLINE step (trace + grad + update, one sharded program)
    opt = optax.adam(0.05)
    estep = sharded_soft_train_step_e2e(
        soft, mesh, opt, cam.resolution, opacity_l1=0.01
    )
    from voxelhex_tpu.parallel.render import shard_rays

    (t_sh,), _ = shard_rays(mesh, target)
    p = jax.tree.map(jnp.array, init)
    s = opt.init(p)
    losses = []
    for _ in range(2):
        p, s, loss = estep(soft.tree, p, s, *camera_params(cam), t_sh)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses[:2], rtol=1e-5)


def test_render_sharded_device_raygen(small_scene):
    """render_sharded with per-shard device raygen matches the host-ray
    sharded frame and the single-device render."""
    from voxelhex_tpu.parallel.bitgrid_sharded import render_sharded
    from voxelhex_tpu.render.bitgrid import BitGridRenderer

    r = BitGridRenderer(small_scene, max_iters=256)
    mesh = make_ray_mesh()
    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    single = r.render(cam)
    out = render_sharded(r, cam, mesh)
    np.testing.assert_allclose(out, single, atol=1e-5)
    assert any(
        len(k) == 3 for k in r._sharded_cam_fns
    )  # the cam-variant (device raygen) path ran
    # non-dividing rows: host-ray fallback, still exact
    cam2 = orbit_camera(small_scene.size, resolution=(40, 30))
    np.testing.assert_allclose(
        render_sharded(r, cam2, mesh), r.render(cam2), atol=1e-5
    )


def test_fit_soft_sharded_camera_pipelined(small_scene):
    """camera-driven sharded fit with the PIPELINED psum variant: the
    mesh-traced records feed the microbatched step; losses match the
    plain sharded fit."""
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.soft import fit_soft_sharded

    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    mesh = make_ray_mesh()
    soft = SoftRenderer(small_scene, max_hits=2, max_iters=256)
    params0 = soft.init_params()
    from voxelhex_tpu.render.camera import device_rays

    o_d, d_d = device_rays(cam)
    _c, v, _t = soft.trace_hits(o_d.reshape(-1, 3), d_d.reshape(-1, 3))
    target = np.asarray(soft.composite(params0, jax.lax.stop_gradient(v)))
    init = {
        "albedo": jnp.clip(params0["albedo"] + 0.25, 0.0, 1.0),
        "logits": params0["logits"] * 0.5,
    }
    p1, l1 = fit_soft_sharded(
        soft, mesh, None, None, target, steps=2, lr=0.05,
        params0=jax.tree.map(jnp.array, init), camera=cam,
    )
    p2, l2 = fit_soft_sharded(
        soft, mesh, None, None, target, steps=2, lr=0.05,
        params0=jax.tree.map(jnp.array, init), camera=cam,
        pipelined_microbatches=2,
    )
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-5
        )


def test_sharded_e2e_planned_march_matches_plain(small_scene):
    """The planned per-shard compacted march (record_shard_plan +
    sharded_soft_train_step_e2e(plan=...)) must equal the plain per-shard
    march step exactly, with per-shard counts that validate."""
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.soft import (
        record_shard_plan,
        sharded_soft_train_step_e2e,
        validate_shard_counts,
    )
    from voxelhex_tpu.parallel.render import shard_rays
    from voxelhex_tpu.render.camera import camera_params, device_rays

    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    mesh = make_ray_mesh()
    n = mesh.shape["rays"]
    soft = SoftRenderer(small_scene, max_hits=2, max_iters=256)
    params0 = soft.init_params()
    o_d, d_d = device_rays(cam)
    _c, v, _t = soft.trace_hits(o_d.reshape(-1, 3), d_d.reshape(-1, 3))
    target = np.asarray(soft.composite(params0, jax.lax.stop_gradient(v)))
    (t_sh,), _ = shard_rays(mesh, target)
    init = {
        "albedo": jnp.clip(params0["albedo"] + 0.25, 0.0, 1.0),
        "logits": params0["logits"] * 0.5,
    }

    plan = record_shard_plan(soft, cam, mesh)
    assert plan is not None and len(plan["rounds"]) >= 1

    opt = optax.adam(0.05)
    plain = sharded_soft_train_step_e2e(soft, mesh, opt, cam.resolution)
    planned = sharded_soft_train_step_e2e(soft, mesh, opt, cam.resolution,
                                          plan=plan)
    p1 = jax.tree.map(jnp.array, init)
    s1 = opt.init(p1)
    p2 = jax.tree.map(jnp.array, init)
    s2 = opt.init(p2)
    for _ in range(2):
        p1, s1, l1 = plain(soft.tree, p1, s1, *camera_params(cam), t_sh)
        p2, s2, l2, counts = planned(soft.tree, p2, s2,
                                     *camera_params(cam), t_sh)
        assert validate_shard_counts(counts, plan, n)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6, atol=1e-7
        )

    # a deliberately too-tight plan FAILS validation instead of silently
    # dropping hits
    tight = {"rounds": ((2, 8),) + tuple(plan["rounds"])[1:]}
    tight_step = sharded_soft_train_step_e2e(soft, mesh, opt,
                                             cam.resolution, plan=tight)
    _p, _s, _l, bad_counts = tight_step(soft.tree, p2, s2,
                                        *camera_params(cam), t_sh)
    assert not validate_shard_counts(bad_counts, tight, n)


def test_sharded_render_planned_march_matches_single_device(small_scene):
    """The planned per-shard compacted RENDER march (record_render_shard_plan
    + sharded_render_planned_fn) must match the single-device render, with
    per-shard counts that validate against the plan."""
    from voxelhex_tpu.parallel.bitgrid_sharded import (
        record_render_shard_plan,
        sharded_render_planned_fn,
    )
    from voxelhex_tpu.parallel.soft import validate_shard_counts
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import camera_params

    r = BitGridRenderer(small_scene, max_iters=256)
    mesh = make_ray_mesh()
    n = mesh.shape["rays"]
    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    plan = record_render_shard_plan(r, cam, mesh)
    assert plan is not None
    fn = sharded_render_planned_fn(r, mesh, cam.resolution, plan)
    bg = jnp.zeros(3, dtype=jnp.float32)
    rgb, counts = fn(r.tree, *camera_params(cam), bg)
    assert validate_shard_counts(counts, plan, n)
    single = r.render(cam)
    np.testing.assert_allclose(
        np.asarray(rgb).reshape(single.shape), single, atol=1e-5
    )


def test_sharded_render_planned_beam_march(small_scene):
    """Beam-in-shard: the planned per-shard march with each shard tracing
    its band of the beam grid (replicated beam tree) must match the
    single-device BEAM render (beam starts are identical — a band's beam
    tiles are a row subset of the same grid)."""
    from voxelhex_tpu.parallel.bitgrid_sharded import (
        record_render_shard_plan,
        sharded_render_planned_fn,
    )
    from voxelhex_tpu.parallel.soft import validate_shard_counts
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import camera_params

    r = BitGridRenderer(small_scene, max_iters=256)
    mesh = make_ray_mesh()
    n = mesh.shape["rays"]
    # rows per shard must divide the beam tile: 64 rows / 8 shards = 8
    cam = orbit_camera(small_scene.size, resolution=(64, 64))
    plan = record_render_shard_plan(r, cam, mesh, beam=True)
    if plan is None:
        import pytest

        pytest.skip("beam bound unavailable for this camera/scene")
    assert plan.get("beam_key") is not None
    fn = sharded_render_planned_fn(r, mesh, cam.resolution, plan)
    tree_b, _ = r._beam_setup(plan["beam_key"][0])
    bg = jnp.zeros(3, dtype=jnp.float32)
    rgb, counts = fn(r.tree, tree_b, *camera_params(cam), bg)
    assert validate_shard_counts(counts, plan, n)
    single = r.render(cam, beam_prepass=True)
    np.testing.assert_allclose(
        np.asarray(rgb).reshape(single.shape), single, atol=1e-5
    )


def test_checked_sharded_step_discards_overflowed_update(small_scene):
    """CheckedShardedSoftStep: a good plan matches the plain e2e step and
    skips re-validation on repeated poses; an overflowing plan's update
    is DISCARDED and recomputed plan-free (bit-equal to the plain step),
    never silently returned (advisor finding)."""
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.render import shard_rays
    from voxelhex_tpu.parallel.soft import (
        CheckedShardedSoftStep,
        record_shard_plan,
        sharded_soft_train_step_e2e,
    )
    from voxelhex_tpu.render.camera import camera_params, device_rays

    cam = orbit_camera(small_scene.size, resolution=(40, 32))
    mesh = make_ray_mesh()
    soft = SoftRenderer(small_scene, max_hits=2, max_iters=256)
    params0 = soft.init_params()
    o_d, d_d = device_rays(cam)
    _c, v, _t = soft.trace_hits(o_d.reshape(-1, 3), d_d.reshape(-1, 3))
    target = np.asarray(soft.composite(params0, jax.lax.stop_gradient(v)))
    (t_sh,), _ = shard_rays(mesh, target)
    init = {
        "albedo": jnp.clip(params0["albedo"] + 0.25, 0.0, 1.0),
        "logits": params0["logits"] * 0.5,
    }
    opt = optax.adam(0.05)
    plan = record_shard_plan(soft, cam, mesh)
    plain = sharded_soft_train_step_e2e(soft, mesh, opt, cam.resolution)

    # good plan: matches plain, second step skips the counts read
    good = CheckedShardedSoftStep(soft, mesh, opt, cam.resolution,
                                  plan=plan)
    p1 = jax.tree.map(jnp.array, init)
    s1 = opt.init(p1)
    p2 = jax.tree.map(jnp.array, init)
    s2 = opt.init(p2)
    for _ in range(2):
        p1, s1, l1 = plain(soft.tree, p1, s1, *camera_params(cam), t_sh)
        p2, s2, l2 = good(soft.tree, p2, s2, *camera_params(cam), t_sh)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert good._validated is not None and not good.overflowed
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6, atol=1e-7
        )

    # too-tight plan: the checked step must return the PLAIN result, not
    # the truncated-hits update
    tight = {"rounds": ((2, 8),) + tuple(plan["rounds"])[1:]}
    bad = CheckedShardedSoftStep(soft, mesh, opt, cam.resolution,
                                 plan=tight)
    pa = jax.tree.map(jnp.array, init)
    sa = opt.init(pa)
    pb = jax.tree.map(jnp.array, init)
    sb = opt.init(pb)
    pa, sa, la = plain(soft.tree, pa, sa, *camera_params(cam), t_sh)
    pb, sb, lb = bad(soft.tree, pb, sb, *camera_params(cam), t_sh)
    assert bad.overflowed and bad._planned is None
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for k in pa:
        np.testing.assert_allclose(
            np.asarray(pa[k]), np.asarray(pb[k]), rtol=1e-6, atol=1e-7
        )
