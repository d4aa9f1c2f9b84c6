"""Mesh-sharded BitGrid rendering: rays data-parallel, scene replicated.

The forward render needs no collectives (each shard traces its rays against
the replicated pyramid); the differentiable paths reuse
:mod:`voxelhex_tpu.parallel.render` for gradient all-reduce.  This module is
the multi-chip forward path and the scaling-efficiency measurement harness.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.jax_renderer import _shade

shard_map = jax.shard_map


def sharded_render_fn(renderer: BitGridRenderer, mesh: Mesh, axis: str = "rays"):
    """Jitted ``render(tree, origins, dirs, bg) -> rgb`` with rays sharded
    over the mesh and the BitGrid replicated."""
    trace = renderer._trace

    def local(tree, o, d, bg):
        hit, voxel, _hv, _hp, hnormal = trace(tree, o, d)
        return _shade(tree, hit, voxel, hnormal, bg)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_render_cam_fn(renderer: BitGridRenderer, mesh: Mesh, resolution,
                          axis: str = "rays"):
    """Jitted sharded frame with PER-SHARD DEVICE RAYGEN (round 4, VERDICT
    r3 #3): ``fn(tree, origin, right, up, forward, scale, bg) -> rgb``
    with each shard deriving its own contiguous row band of rays from the
    replicated ~60 B of camera params and its ``axis_index`` — nothing
    per-ray crosses host->device (the PERF.md transfer discipline; the
    reference derives rays in-shader, viewport_render.wgsl:689-700)."""
    from voxelhex_tpu.render.camera import raygen_rows_body

    w, h = resolution
    n = mesh.shape[axis]
    assert h % n == 0
    rows = h // n
    gen = raygen_rows_body(w, h, rows)
    trace = renderer._trace

    def local(tree, origin, right, up, forward, scale, bg):
        i = jax.lax.axis_index(axis)
        o, d = gen(origin, right, up, forward, scale,
                   (i * rows).astype(jnp.float32))
        hit, voxel, _hv, _hp, hnormal = trace(tree, o, d)
        return _shade(tree, hit, voxel, hnormal, bg)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def record_render_shard_plan(renderer: BitGridRenderer, camera, mesh: Mesh,
                             axis: str = "rays", extra_rounds: int = 1,
                             beam: bool = False):
    """Record a conservative per-shard compaction schedule for
    :func:`sharded_render_cam_fn`'s planned march: each shard's row band
    traces adaptively on the current device; band schedules union into
    one static ladder (per-round max bucket + an uncompacted safety
    round).  Returns ``{"rounds": ...}`` or None when a band's trace
    didn't converge.  Validate the sharded program's per-shard counts
    once per (plan, tree, pose) — same policy as the soft path's
    :func:`voxelhex_tpu.parallel.soft.record_shard_plan`.

    ``beam=True``: the BEAM PREPASS joins the per-shard march — bands
    record with conservative beam starts (sliced from the full-frame
    beam grid; per-shard beam tracing reproduces them exactly, since a
    band's beam tiles are a row subset of the same grid) and the plan
    carries a planned round-0 compaction bucket (``pre``).  Returns
    None when the camera/scene can't satisfy the beam bound (callers
    fall back to ``beam=False``)."""
    from voxelhex_tpu.render.camera import device_rays

    w, h = camera.resolution
    n = mesh.shape[axis]
    assert h % n == 0, f"{h} rows must divide the {n}-device mesh"
    rows = h // n
    R_shard = rows * w
    o_full, d_full = device_rays(camera)
    o_full = o_full.reshape(-1, 3)
    d_full = d_full.reshape(-1, 3)
    st_full = None
    spec = None
    if beam:
        spec = renderer._beam_spec(camera)
        if spec is None or rows % spec["key"][3] != 0:
            return None  # no beam bound, or tile doesn't divide the band
        st_full = renderer._beam_fn(*spec["key"])(
            spec["tree_b"], spec["o_b"], spec["d_b"]
        )
    band_plans = []
    pres = []
    for i in range(n):
        sl = slice(i * R_shard, (i + 1) * R_shard)
        for key in list(renderer._plans):
            if key[0] == R_shard:
                renderer._plans.pop(key)
        if st_full is not None:
            renderer.trace_compacted(
                o_full[sl], d_full[sl], start_t=st_full[sl],
                first_round_iters=renderer.beam_first_iters,
            )
        else:
            renderer.trace_compacted(o_full[sl], d_full[sl])
        p = None
        for key, val in renderer._plans.items():
            if key[0] == R_shard:
                p = val
        if p is None:
            return None
        rounds = p["rounds"] if isinstance(p, dict) else p
        if not rounds:
            return None
        band_plans.append(tuple(rounds))
        pres.append(p.get("pre") if isinstance(p, dict) else None)
    from voxelhex_tpu.parallel.soft import union_band_plans

    plan = {"rounds": union_band_plans(band_plans, extra_rounds)}
    if beam:
        plan["beam_key"] = spec["key"]
        pre = (None if any(p is None for p in pres)
               else max(int(p) for p in pres))
        if pre is not None:
            plan["pre"] = pre
    return plan


def sharded_render_planned_fn(renderer: BitGridRenderer, mesh: Mesh,
                              resolution, plan, axis: str = "rays"):
    """Device-raygen sharded frame with the PLANNED per-shard compacted
    march (the single-chip schedule lever inside the mesh, no host
    reads): ``fn(tree[, tree_b], origin, right, up, forward, scale, bg)
    -> (rgb sharded, counts [n*C])``.  Shading rides the frame body's
    shade-on-retire accumulator, so per-shard math matches the fused
    single-chip frame exactly.

    Plans recorded with ``beam=True`` carry a ``beam_key`` (+ optional
    planned ``pre`` bucket): each shard then traces ITS band of the beam
    grid against the replicated beam tree (``tree_b``, pass
    ``renderer._beam_setup(plan['beam_key'][0])[0]``), computes its
    conservative starts in-program and runs the planned round-0
    compaction — the full single-chip beam lever on the mesh."""
    from voxelhex_tpu.render.camera import raygen_rows_body

    w, h = resolution
    n = mesh.shape[axis]
    assert h % n == 0
    rows = h // n
    R_shard = rows * w
    gen = raygen_rows_body(w, h, rows)
    entries = tuple(
        (int(i), (int(b) if b is not None else None))
        for i, b in plan["rounds"]
    )
    beam_key = plan.get("beam_key")
    if beam_key is None:
        body = renderer._frame_body(R_shard, None, entries, False)

        def local(tree, origin, right, up, forward, scale, bg):
            i = jax.lax.axis_index(axis)
            o, d = gen(origin, right, up, forward, scale,
                       (i * rows).astype(jnp.float32))
            _hit, _v, _hv, _hp, _hn, rgb, counts = body(tree, o, d, None,
                                                        bg)
            return rgb, counts

        in_specs = (P(), P(), P(), P(), P(), P(), P())
    else:
        L, th, tw, tile = beam_key
        assert rows % tile == 0
        th_shard = rows // tile
        preb = plan.get("pre")
        preb = int(preb) if preb is not None else None
        body = renderer._frame_body(R_shard, preb, entries, True)
        beam_body = renderer._beam_body(L, th_shard, tw, tile)
        gen_beam = raygen_rows_body(w // tile, h // tile, th_shard)

        def local(tree, tree_b, origin, right, up, forward, scale, bg):
            i = jax.lax.axis_index(axis)
            o, d = gen(origin, right, up, forward, scale,
                       (i * rows).astype(jnp.float32))
            o_b, d_b = gen_beam(origin, right, up, forward, scale,
                                (i * th_shard).astype(jnp.float32))
            st = beam_body(tree_b, o_b, d_b)
            _hit, _v, _hv, _hp, _hn, rgb, counts = body(tree, o, d, st, bg)
            return rgb, counts

        in_specs = (P(), P(), P(), P(), P(), P(), P(), P())

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def render_sharded(renderer: BitGridRenderer, camera, mesh: Mesh,
                   bg=(0.0, 0.0, 0.0), axis: str = "rays"):
    """Render one frame with rays data-parallel over ``mesh``; returns
    ``[h, w, 3]`` f32.  Device raygen per shard when the frame's rows
    divide the mesh; host-built sharded rays otherwise."""
    w, h = camera.resolution
    n = mesh.shape[axis]
    bgc = jnp.asarray(bg, dtype=jnp.float32)
    cache = renderer.__dict__.setdefault("_sharded_cam_fns", {})
    if h % n == 0:
        from voxelhex_tpu.render.camera import camera_params

        key = (id(mesh), axis, (w, h))
        fn = cache.get(key)
        if fn is None:
            fn = sharded_render_cam_fn(renderer, mesh, (w, h), axis=axis)
            cache[key] = fn
        rgb = fn(renderer.tree, *camera_params(camera), bgc)
        return np.asarray(rgb).reshape(h, w, 3)
    o, d = camera.rays()
    (o_sh, d_sh), n_rays = shard_rays(
        mesh, o.reshape(-1, 3), d.reshape(-1, 3), axis=axis
    )
    key = (id(mesh), axis)
    fn = cache.get(key)
    if fn is None:
        fn = sharded_render_fn(renderer, mesh, axis=axis)
        cache[key] = fn
    rgb = fn(renderer.tree, o_sh, d_sh, bgc)
    return np.asarray(rgb)[:n_rays].reshape(h, w, 3)


def shard_rays(mesh: Mesh, *arrays, axis: str = "rays"):
    n = arrays[0].shape[0]
    per = mesh.shape[axis]
    padded = ((n + per - 1) // per) * per
    out = []
    for a in arrays:
        a = np.asarray(a)
        if padded != n:
            a = np.concatenate(
                [a, np.zeros((padded - n,) + a.shape[1:], dtype=a.dtype)]
            )
        out.append(jax.device_put(a, NamedSharding(mesh, P(axis))))
    return out, n


def measure_scaling(renderer: BitGridRenderer, origins, dirs, device_counts=None):
    """Rays/sec at different mesh sizes (weak scaling per device).

    Returns {n_devices: rays_per_sec}; efficiency(n) =
    rate(n) / (n * rate(1)).
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    origins = np.asarray(origins, dtype=np.float32).reshape(-1, 3)
    dirs = np.asarray(dirs, dtype=np.float32).reshape(-1, 3)
    bg = jnp.zeros(3, dtype=jnp.float32)

    results = {}
    for n in device_counts:
        mesh = Mesh(np.array(devices[:n]), ("rays",))
        fn = sharded_render_fn(renderer, mesh)
        # weak scaling: each device gets the full per-device batch
        o_n = np.tile(origins, (n, 1))
        d_n = np.tile(dirs, (n, 1))
        (o_sh, d_sh), _ = shard_rays(mesh, o_n, d_n)
        out = fn(renderer.tree, o_sh, d_sh, bg)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(renderer.tree, o_sh, d_sh, bg)
        jax.block_until_ready(out)
        dt = time.time() - t0
        results[n] = o_n.shape[0] / dt
    return results
