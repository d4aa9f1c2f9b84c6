"""Sharded training of the soft-occupancy (albedo + opacity) path.

The BASELINE "optimize brick albedo/occupancy" config (config 5) over a
device mesh: the multi-hit trace is geometry-only and runs once per view
set (host-driven, non-differentiable — ``SoftRenderer.trace_hits``); the
TRAINING STEP then shards the per-ray hit records and targets over the
``rays`` mesh axis, keeps params (dense albedo [S^3,3] + opacity logits
[S^3]) replicated, and ``pmean``-reduces their gradients across the mesh —
the north star's gradient all-reduce, riding ICI on real chips.

Numerically exact vs the single-device :func:`voxelhex_tpu.diff.soft
.fit_soft` step when the ray count divides the mesh (per-shard mean +
pmean == global mean; the opacity-L1 term is shard-invariant because
params are replicated).

Reference scope: the reference has no distributed anything (SURVEY §2.4);
this is the new-requirement path (BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from voxelhex_tpu.diff.soft import SoftRenderer


def _clip_params(params):
    # mirror fit_soft's post-update clamps exactly
    return {
        "albedo": jnp.clip(params["albedo"], 0.0, 1.0),
        "logits": jnp.clip(params["logits"], -12.0, 12.0),
    }


def _local_loss_fn(soft: SoftRenderer, opacity_l1: float, fit_albedo: bool):
    def local_loss(params, voxels, targets):
        p = params
        if not fit_albedo:
            p = {
                "albedo": jax.lax.stop_gradient(params["albedo"]),
                "logits": params["logits"],
            }
        rgb = soft.composite(p, voxels)
        loss = jnp.mean((rgb - targets) ** 2)
        if opacity_l1:
            loss = loss + opacity_l1 * jnp.mean(jax.nn.sigmoid(p["logits"]))
        return loss

    return local_loss


def sharded_soft_train_step(
    soft: SoftRenderer,
    mesh: Mesh,
    optimizer,
    axis_name: str = "rays",
    opacity_l1: float = 0.0,
    fit_albedo: bool = True,
):
    """One optimizer step of the soft-occupancy loss, rays DP over ``mesh``.

    Returns ``step(params, opt_state, voxels, targets) -> (params,
    opt_state, loss)`` jitted over the mesh; ``voxels`` is the [R, K, 3]
    multi-hit record from ``SoftRenderer.trace_hits`` and ``targets`` the
    [R, 3] target pixels, both sharded on axis 0 (R must divide the mesh —
    zero-padding voxel rows would alias voxel (0,0,0) and skew the mean).
    Gradients flow into BOTH albedo and opacity logits and are pmean'd
    across shards, so the update equals the single-device full-batch
    ``fit_soft`` step."""
    import optax

    local_loss = _local_loss_fn(soft, opacity_l1, fit_albedo)

    def shard_step(params, opt_state, voxels, targets):
        loss, grads = jax.value_and_grad(local_loss)(params, voxels, targets)
        grads = jax.lax.pmean(grads, axis_name)  # all-reduce over ICI
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return _clip_params(params), opt_state, loss

    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_soft_train_step_pipelined(
    soft: SoftRenderer,
    mesh: Mesh,
    optimizer,
    axis_name: str = "rays",
    microbatches: int = 4,
    opacity_l1: float = 0.0,
    fit_albedo: bool = True,
):
    """Soft train step with the gradient all-reduce PIPELINED against the
    backward pass: rays split into ``microbatches``, each microbatch's
    grads psum'd immediately so XLA's latency-hiding scheduler overlaps the
    collective with the next microbatch's backward compute.  Numerically
    identical to :func:`sharded_soft_train_step` (psum is linear); the
    shard-invariant opacity-L1 term is added once after the scan."""
    import optax

    n_dev = mesh.devices.size
    local_mse = _local_loss_fn(soft, 0.0, fit_albedo)

    def shard_step(params, opt_state, voxels, targets):
        K = microbatches
        v = voxels.reshape(K, -1, *voxels.shape[1:])
        t = targets.reshape(K, -1, targets.shape[-1])

        def mb(gsum, xs):
            vk, tk = xs
            loss_k, g = jax.value_and_grad(local_mse)(params, vk, tk)
            g = jax.lax.psum(g, axis_name)
            loss_k = jax.lax.psum(loss_k, axis_name)
            return jax.tree.map(jnp.add, gsum, g), loss_k

        g0 = jax.tree.map(jnp.zeros_like, params)
        gsum, losses = jax.lax.scan(mb, g0, (v, t))
        grads = jax.tree.map(lambda g: g / (K * n_dev), gsum)
        loss = jnp.mean(losses) / n_dev
        if opacity_l1:
            l1_loss, l1_grads = jax.value_and_grad(
                lambda p: opacity_l1 * jnp.mean(jax.nn.sigmoid(p["logits"]))
            )(params)
            grads = jax.tree.map(jnp.add, grads, l1_grads)
            loss = loss + l1_loss
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return _clip_params(params), opt_state, loss

    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_soft_trace_fn(soft: SoftRenderer, mesh: Mesh, resolution,
                          axis_name: str = "rays"):
    """Jitted SHARDED multi-hit trace with per-shard device raygen
    (VERDICT r3 #2): ``fn(tree, origin, right, up, forward, scale) ->
    (count, voxels, dists)`` sharded over ``axis_name`` — each shard
    derives its own row band of rays from the replicated ~60 B of camera
    params and marches them against the replicated occupancy pyramid.  On
    a pod the trace runs data-parallel over every chip instead of
    serializing on one; host->device traffic is the camera params."""
    from voxelhex_tpu.render.camera import raygen_rows_body

    w, h = resolution
    n = mesh.shape[axis_name]
    assert h % n == 0, f"{h} rows must divide the {n}-device mesh"
    rows = h // n
    gen = raygen_rows_body(w, h, rows)
    trace = soft._trace  # the plain multi-hit march (jit inlines here)

    def local(tree, origin, right, up, forward, scale):
        i = jax.lax.axis_index(axis_name)
        o, d = gen(origin, right, up, forward, scale,
                   (i * rows).astype(jnp.float32))
        return trace(tree, o, d)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(fn)


def union_band_plans(band_plans, extra_rounds: int = 1):
    """Union per-band (iters, bucket) schedules into one static ladder:
    per-round iters/bucket = max over the bands still running that round
    (a band that finished early adds no constraint; any band without a
    compaction that round forces None), padded with ``extra_rounds``
    uncompacted safety rounds (a round's while_loop only runs live
    iterations, so padding is ~free).  Shared by the soft and render
    per-shard plan recorders."""
    n_rounds = max(len(r) for r in band_plans)
    rounds = []
    for k in range(n_rounds):
        live = [r[k] for r in band_plans if k < len(r)]
        iters = max(it for it, _b in live)
        buckets = [b for _it, b in live]
        bucket = None if any(b is None for b in buckets) else max(buckets)
        rounds.append((int(iters), bucket))
    for _ in range(int(extra_rounds)):
        rounds.append((rounds[-1][0], None))
    return tuple(rounds)


def record_shard_plan(soft: SoftRenderer, camera, mesh: Mesh,
                      axis_name: str = "rays", extra_rounds: int = 1):
    """Record a conservative PER-SHARD multi-hit schedule for
    :func:`sharded_soft_train_step_e2e`'s planned march: each shard's row
    band is traced adaptively on the current device, and the band
    schedules union into one static (iters, bucket) ladder (per-round
    bucket = max over bands; a band that finished early adds no
    constraint), padded with ``extra_rounds`` uncompacted safety rounds
    (a round's while_loop only runs live iterations, so padding is
    ~free).  Returns ``{"rounds": ...}`` or None when a band's adaptive
    trace did not converge.

    The plan is CONSERVATIVE, not guaranteed: shards see different ray
    distributions, so the sharded program returns its per-shard
    straggler counts and the caller validates them once per
    (plan, tree, camera) — the same validate-once-by-determinism policy
    as the fused single-chip paths; on overflow, fall back to the
    plain (uncompacted) per-shard march."""
    from voxelhex_tpu.render.camera import device_rays

    w, h = camera.resolution
    n = mesh.shape[axis_name]
    assert h % n == 0, f"{h} rows must divide the {n}-device mesh"
    R_shard = (h // n) * w
    o_full, d_full = device_rays(camera)
    o_full = o_full.reshape(-1, 3)
    d_full = d_full.reshape(-1, 3)
    band_plans = []
    max_hits = 0
    for i in range(n):
        sl = slice(i * R_shard, (i + 1) * R_shard)
        soft._soft_plans.pop((R_shard, False), None)
        cnt, _v, _d = soft.trace_hits_compacted(o_full[sl], d_full[sl],
                                                fuse=False)
        p = soft._soft_plans.get((R_shard, False))
        if p is None:
            return None  # band didn't converge within the iter budget
        band_plans.append(tuple(p["rounds"]))
        max_hits = max(max_hits, int(np.asarray((cnt > 0).sum())))
    # per-shard HIT-COMPACTED backward bucket (the single-chip
    # grad_on_hits shrink policy applied to the worst band): the e2e
    # sharded step then backward-passes only rays that hit — without
    # this the sharded step paid a full-width backward the fused
    # single-chip step never pays (the n=1 A/B's discovered tax)
    gb = R_shard
    while gb // 4 >= max(max_hits, 8192):
        gb //= 4
    return {"rounds": union_band_plans(band_plans, extra_rounds),
            "grad_bucket": int(gb)}


def validate_shard_counts(counts, plan, n_shards: int) -> bool:
    """Check a planned sharded march's per-shard straggler counts: True
    when every shard's compaction buckets held (including a planned
    round-0 ``pre`` bucket, when the plan carries one), every shard
    finished, and — when the plan carries a ``grad_bucket`` — every
    shard's hit count fit the compacted backward's bucket (exactness
    gate for the plan; one small host read)."""
    entries = tuple(plan["rounds"])
    pre = plan.get("pre")
    gb = plan.get("grad_bucket")
    off = 1 if pre is not None else 0
    tail = 1 if gb is not None else 0  # trailing per-shard hit count
    c = np.asarray(counts).reshape(n_shards, off + len(entries) + tail)
    for s in range(n_shards):
        if pre is not None and int(c[s, 0]) > int(pre):
            return False
        for k, (_iters, bucket) in enumerate(entries):
            if bucket is not None and int(c[s, off + k]) > bucket:
                return False
        if int(c[s, off + len(entries) - 1]) != 0:
            return False
        if gb is not None and int(c[s, -1]) > int(gb):
            return False
    return True


def sharded_soft_train_step_e2e(
    soft: SoftRenderer,
    mesh: Mesh,
    optimizer,
    resolution,
    axis_name: str = "rays",
    opacity_l1: float = 0.0,
    fit_albedo: bool = True,
    plan=None,
):
    """END-TO-END sharded ONLINE training step: per-shard device raygen,
    per-shard multi-hit march, transmittance composite + backward,
    gradient ``pmean`` and the optimizer update — the WHOLE step is one
    jitted program over the mesh (VERDICT r3 #2: the round-3 form traced
    on one device and sharded only the hit records, idling N-1 chips for
    ~40-50% of the step).

    Returns ``step(tree, params, opt_state, origin, right, up, forward,
    scale, targets) -> (params, opt_state, loss)`` with ``tree`` the
    renderer's device pyramid (``soft.tree``, replicated), ``targets``
    [R, 3] sharded on axis 0 and the camera params replicated.  Matches
    the single-device online step (trace + ``fit_soft``-style update)
    when the ray count divides the mesh.

    ``plan`` (from :func:`record_shard_plan`): the per-shard march runs
    the PLANNED compacted schedule instead of the plain K-serial-march
    tracer — the single-chip beam/compaction lever applied inside the
    mesh, with no host reads in the program.  The step then additionally
    returns the per-shard straggler ``counts``; validate them ONCE per
    (plan, tree, camera) with :func:`validate_shard_counts` (exact by
    determinism afterwards) and fall back to ``plan=None`` on overflow.
    Hit results are identical either way (compaction drops only finished
    rays — parity-tested)."""
    import optax

    from voxelhex_tpu.render.camera import raygen_rows_body

    w, h = resolution
    n = mesh.shape[axis_name]
    assert h % n == 0, f"{h} rows must divide the {n}-device mesh"
    rows = h // n
    gen = raygen_rows_body(w, h, rows)
    trace = soft._trace
    local_loss = _local_loss_fn(soft, opacity_l1, fit_albedo)
    hits_body = None
    grad_f = None
    if plan is not None:
        entries = tuple(
            (int(i), (int(b) if b is not None else None))
            for i, b in plan["rounds"]
        )
        hits_body = soft._hits_body(rows * w, entries, None)
        if plan.get("grad_bucket") is not None:
            # HIT-COMPACTED backward on the shard (grad_on_hits's lever
            # inside the mesh): only rays that recorded a hit enter the
            # backward — a no-hit ray's gradient is exactly zero and its
            # squared error a params-free constant, so results are
            # identical (the single-chip parity argument, diff/soft.py).
            # The per-shard hit count joins the counts output for the
            # caller's validate_shard_counts gate.
            grad_f = soft._make_grad_fn(
                rows * w, int(plan["grad_bucket"]), with_count=True
            )

    def shard_step(tree, params, opt_state, origin, right, up, forward,
                   scale, targets):
        i = jax.lax.axis_index(axis_name)
        o, d = gen(origin, right, up, forward, scale,
                   (i * rows).astype(jnp.float32))
        if hits_body is not None:
            cnt, voxels, _dists, counts = hits_body(tree, o, d, None)
        else:
            cnt, voxels, _dists = trace(tree, o, d)
            counts = None
        voxels = jax.lax.stop_gradient(voxels)
        # NOTE: the L1/fit_albedo handling below mirrors
        # SoftRenderer._fused_loss_grads (the single-chip canon); it
        # cannot reuse it directly because the pmean all-reduce must sit
        # BETWEEN the local grads and the update — keep the two in sync
        # (the e2e parity tests pin equality).
        if grad_f is not None:
            loss, grads, nh = grad_f(params, cnt > 0, voxels, targets)
            if opacity_l1:
                l1_loss, l1_grads = jax.value_and_grad(
                    lambda p: opacity_l1
                    * jnp.mean(jax.nn.sigmoid(p["logits"]))
                )(params)
                grads = jax.tree.map(jnp.add, grads, l1_grads)
                loss = loss + l1_loss
            if not fit_albedo:
                grads = dict(grads, albedo=jnp.zeros_like(grads["albedo"]))
            counts = jnp.concatenate([counts, nh[None].astype(counts.dtype)])
        else:
            loss, grads = jax.value_and_grad(local_loss)(params, voxels,
                                                         targets)
        grads = jax.lax.pmean(grads, axis_name)  # all-reduce over ICI
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if counts is not None:
            return _clip_params(params), opt_state, loss, counts
        return _clip_params(params), opt_state, loss

    out_specs = (P(), P(), P())
    if plan is not None:
        out_specs = out_specs + (P(axis_name),)
    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(axis_name)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


class CheckedShardedSoftStep:
    """:func:`sharded_soft_train_step_e2e` with ``train_step_fused``'s
    overflow POLICY built in: run the PLANNED step, validate the
    per-shard counts once per (tree, camera) — exact by determinism on
    repeats — and when a compaction bucket overflowed DISCARD the
    returned params/opt_state (they were computed from truncated hit
    records) and redo the step through the plan-free program, so callers
    can never silently train on corrupted gradients (advisor finding:
    the raw planned step hands back the inexact params alongside the
    failing counts and trusts the caller to check).

    ``step(tree, params, opt_state, *camera_params, targets) ->
    (params, opt_state, loss)`` — same signature as the plain e2e step.
    After an overflow the instance stays on the plan-free program (the
    plan no longer fits the workload); construct a fresh instance with a
    re-recorded plan to re-engage it."""

    def __init__(self, soft, mesh, optimizer, resolution,
                 axis_name: str = "rays", opacity_l1: float = 0.0,
                 fit_albedo: bool = True, plan=None):
        self._n = mesh.shape[axis_name]
        self._plan = plan
        kw = dict(axis_name=axis_name, opacity_l1=opacity_l1,
                  fit_albedo=fit_albedo)
        self._planned = (
            sharded_soft_train_step_e2e(soft, mesh, optimizer, resolution,
                                        plan=plan, **kw)
            if plan is not None else None
        )
        self._plain = sharded_soft_train_step_e2e(
            soft, mesh, optimizer, resolution, **kw
        )
        self._validated = None
        self.overflowed = False  # latched on the first failed validation

    @staticmethod
    def _vkey(tree, cam_args):
        # camera params are ~60 B — key on their CONTENT (host bytes) so
        # a same-pose array rebuilt per step still skips the counts read.
        # The TREE component is a weakref to its occupancy-pairs array
        # (the dict itself is not weakref-able): jax arrays are immutable
        # and every tree swap/in-place refresh replaces the array, so a
        # recycled dict id can never alias a dead tree (the raw-id bug
        # train_step_fused's token fix closed).
        import weakref

        try:
            ref = weakref.ref(tree["occ_pairs"])
        except TypeError:  # pragma: no cover - exotic tree types
            ref = None
        return ((ref,) + tuple(
            np.asarray(a, dtype=np.float32).tobytes() for a in cam_args
        ))

    @staticmethod
    def _vkey_matches(vkey, validated, tree):
        if validated is None or vkey[1:] != validated[1:]:
            return False
        ref = validated[0]
        return ref is not None and ref() is tree.get("occ_pairs")

    def __call__(self, tree, params, opt_state, origin, right, up,
                 forward, scale, targets):
        if self._planned is not None:
            out = self._planned(tree, params, opt_state, origin, right,
                                up, forward, scale, targets)
            p, s, loss, counts = out
            vkey = self._vkey(tree, (origin, right, up, forward, scale))
            if self._vkey_matches(vkey, self._validated, tree) or \
                    validate_shard_counts(counts, self._plan, self._n):
                self._validated = vkey
                return p, s, loss
            # overflow: the planned march truncated hits — p/s are
            # inexact.  Drop them and recompute plan-free.
            self._planned = None
            self._validated = None
            self.overflowed = True
        return self._plain(tree, params, opt_state, origin, right, up,
                           forward, scale, targets)


def fit_soft_sharded(
    soft: SoftRenderer,
    mesh: Mesh,
    origins,
    dirs,
    targets,
    steps: int = 300,
    lr: float = 0.05,
    params0=None,
    opacity_l1: float = 0.0,
    fit_albedo: bool = True,
    axis_name: str = "rays",
    pipelined_microbatches: int = 0,
    camera=None,
):
    """Multi-device ``fit_soft``: trace once, then run sharded train steps.

    With ``camera`` given (``origins``/``dirs`` may then be None), the
    trace itself runs ON THE MESH — per-shard device raygen + per-shard
    multi-hit march (:func:`sharded_soft_trace_fn`), hit records staying
    sharded on their devices; host->device traffic for the whole fit is
    camera params + the sharded targets (VERDICT r3 #2: the round-3 form
    ran the full-frame trace on one device, then shipped and re-sharded
    the records).  Without a camera the round-3 host-ray form is kept for
    arbitrary ray sets.

    The ray count must divide the mesh (frame resolutions do: 1080p/8
    chips = 259200 rays per shard).  Returns (params, losses)."""
    import optax

    from voxelhex_tpu.parallel.render import shard_rays

    targets = np.asarray(targets).reshape(-1, 3)
    R = targets.shape[0]
    per = mesh.shape[axis_name]
    assert R % per == 0, (
        f"ray count {R} must divide the {per}-device mesh (padding voxel "
        f"rows would alias voxel (0,0,0))"
    )
    params = soft.init_params() if params0 is None else params0
    if camera is not None:
        from voxelhex_tpu.render.camera import camera_params

        w, h = camera.resolution
        assert w * h == R, f"targets ({R}) must match {w}x{h}"
        tr = sharded_soft_trace_fn(soft, mesh, (w, h), axis_name=axis_name)
        _count, voxels, _d = tr(soft.tree, *camera_params(camera))
        voxels = jax.lax.stop_gradient(voxels)  # sharded already
        v_sh = voxels
        (t_sh,), _ = shard_rays(mesh, targets, axis_name=axis_name)
    else:
        _count, voxels, _d = soft.trace_hits(origins, dirs)
        voxels = jax.lax.stop_gradient(voxels)
        (v_sh, t_sh), _ = shard_rays(mesh, np.asarray(voxels), targets,
                                     axis_name=axis_name)

    opt = optax.adam(lr)
    opt_state = opt.init(params)
    if pipelined_microbatches:
        step = sharded_soft_train_step_pipelined(
            soft, mesh, opt, axis_name=axis_name,
            microbatches=pipelined_microbatches,
            opacity_l1=opacity_l1, fit_albedo=fit_albedo,
        )
    else:
        step = sharded_soft_train_step(
            soft, mesh, opt, axis_name=axis_name,
            opacity_l1=opacity_l1, fit_albedo=fit_albedo,
        )
    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, v_sh, t_sh)
        losses.append(float(loss))
    return params, losses
