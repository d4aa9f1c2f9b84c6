"""Mesh-sharded STREAMING rendering: the out-of-core terrain path with
rays data-parallel over a device mesh.

This is the BASELINE "large terrain scene at 1080p with sharded ray
tiles (streaming path)" configuration as one composition: host-side
paging (window updates, far-ring refresh) is exactly
:class:`~voxelhex_tpu.render.streaming.StreamingView`'s, while the
per-frame device work — ray generation, the window trace, one coarse
trace per far-field LOD ring, and the min-distance composite — runs
per-shard under ``shard_map`` with the window and ring grids REPLICATED
and the rays sharded.  The composite is elementwise, so the whole frame
needs no collectives (rays are embarrassingly parallel; the reference's
analog is the single-GPU streaming render of
``src/raytracing/bevy/streaming/`` — here the same frame fans out over
every chip on the mesh).

RAY GENERATION IS PER-SHARD AND ON DEVICE (round 4, VERDICT r3 #3): the
frame's host->device traffic is ~60 B of camera params + one origin row
per far ring — each shard derives its own contiguous row band of rays
from ``axis_index`` (:func:`voxelhex_tpu.render.camera.raygen_rows_body`),
and every ring trace reuses the SAME directions (ring cameras differ
from the window camera only by a translation + uniform scale, which
leaves pixel directions unchanged).  Nothing per-ray crosses the host
link — the PERF.md "second key finding" discipline, matching the
reference's in-shader ray derivation (viewport_render.wgsl:689-700).
Frames where the row count doesn't divide the mesh fall back to
host-built sharded ray arrays (the round-3 form).

Shading and the ring composite mirror ``StreamingView._render_far``
(min-distance fold over spatially disjoint rings) without the per-shard
perf-only levers (hit pre-kill, compaction, beam) — results match the
single-device frame (parity: ``tests/test_streaming_sharded.py``).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from voxelhex_tpu.parallel.bitgrid_sharded import shard_rays
from voxelhex_tpu.render.jax_renderer import _shade

shard_map = jax.shard_map


def sharded_streaming_render_cam_fn(view, mesh: Mesh, resolution,
                                    axis: str = "rays"):
    """Jitted per-frame render with PER-SHARD DEVICE RAYGEN:
    ``fn(win_tree, tier_trees, origin0, tier_origins, right, up, forward,
    scale, bg) -> rgb[R, 3]`` (rays implicitly sharded by row band; every
    grid and the camera params replicated).

    ``origin0`` is the camera origin in window space; ``tier_origins``
    is a [T, 3] row per far ring (the camera origin in each ring's scaled
    frame).  Directions are generated once per shard and shared by the
    window and every ring trace (translation + uniform scale preserves
    pixel directions).
    """
    from voxelhex_tpu.render.camera import raygen_rows_body

    w, h = resolution
    n = mesh.shape[axis]
    assert h % n == 0
    rows = h // n
    gen = raygen_rows_body(w, h, rows)
    win_trace = view.renderer._trace
    tiers = tuple(view.far.tiers) if view.far is not None else ()
    tier_traces = tuple(t.renderer._trace for t in tiers)
    factors = tuple(float(t.factor) for t in tiers)

    def local(win_tree, tier_trees, origin0, tier_origins, right, up,
              forward, scale, bg):
        i = jax.lax.axis_index(axis)
        o, d = gen(origin0, right, up, forward, scale,
                   (i * rows).astype(jnp.float32))
        hit, voxel, _hv, hpoint, hn = win_trace(win_tree, o, d)
        rgb = _shade(win_tree, hit, voxel, hn, bg)
        dist = jnp.where(
            hit, jnp.linalg.norm(hpoint - o, axis=-1), jnp.float32(np.inf)
        )
        for t_i, (trace_t, F, ttree) in enumerate(
            zip(tier_traces, factors, tier_trees)
        ):
            o_t = jnp.broadcast_to(tier_origins[t_i], d.shape)
            thit, tvox, _thv, thp, thn = trace_t(ttree, o_t, d)
            trgb = _shade(ttree, thit, tvox, thn, bg)
            tdist = jnp.where(
                thit,
                jnp.linalg.norm(thp - o_t, axis=-1) * jnp.float32(F),
                jnp.float32(np.inf),
            )
            # min-distance composite (StreamingView._far_accum): ring
            # contents are spatially disjoint, nearest hit wins
            use = thit & ((~hit) | (tdist < dist))
            hit = hit | thit
            dist = jnp.where(use, tdist, dist)
            rgb = jnp.where(use[:, None], trgb, rgb)
        return rgb

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_streaming_render_fn(view, mesh: Mesh, axis: str = "rays"):
    """Host-ray fallback render fn (rays passed in, sharded): used when
    the frame's row count doesn't divide the mesh.  See
    :func:`sharded_streaming_render_cam_fn` for the primary path."""
    win_trace = view.renderer._trace
    tiers = tuple(view.far.tiers) if view.far is not None else ()
    tier_traces = tuple(t.renderer._trace for t in tiers)
    factors = tuple(float(t.factor) for t in tiers)

    def local(win_tree, tier_trees, o, d, tier_rays, bg):
        hit, voxel, _hv, hpoint, hn = win_trace(win_tree, o, d)
        rgb = _shade(win_tree, hit, voxel, hn, bg)
        dist = jnp.where(
            hit, jnp.linalg.norm(hpoint - o, axis=-1), jnp.float32(np.inf)
        )
        for trace_t, F, ttree, (o_t, d_t) in zip(
            tier_traces, factors, tier_trees, tier_rays
        ):
            thit, tvox, _thv, thp, thn = trace_t(ttree, o_t, d_t)
            trgb = _shade(ttree, thit, tvox, thn, bg)
            tdist = jnp.where(
                thit,
                jnp.linalg.norm(thp - o_t, axis=-1) * jnp.float32(F),
                jnp.float32(np.inf),
            )
            use = thit & ((~hit) | (tdist < dist))
            hit = hit | thit
            dist = jnp.where(use, tdist, dist)
            rgb = jnp.where(use[:, None], trgb, rgb)
        return rgb

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def render_streaming_sharded(view, camera, mesh: Mesh, bg=(0.0, 0.0, 0.0),
                             axis: str = "rays"):
    """Update the streaming window for ``camera`` and render the frame
    with rays sharded over ``mesh``.  Returns ``[h, w, 3]`` f32.

    Paging, far-ring refresh, placeholder/occlusion logic are the
    single-device :meth:`StreamingView.render` path unchanged; only the
    device work shards.  Host->device traffic is camera params only
    (per-shard device raygen) when the frame's rows divide the mesh.
    """
    view.update(np.asarray(camera.target, dtype=np.float64), camera=camera)
    origin32 = view.origin.astype(np.float32)
    cam_local = replace(
        camera,
        origin=np.asarray(camera.origin, dtype=np.float32) - origin32,
        target=np.asarray(camera.target, dtype=np.float32) - origin32,
    )
    if view._want_far:
        if view.far is None:
            from voxelhex_tpu.render.streaming import FarField

            view.far = FarField(view)
        view.far.refresh()

    w, h = camera.resolution
    n = mesh.shape[axis]
    tiers = tuple(view.far.tiers) if view.far is not None else ()
    cache = view.__dict__.setdefault("_sharded_stream_fns", {})

    if h % n == 0:
        from voxelhex_tpu.render.camera import camera_params

        origin0, right, up, forward, scale = camera_params(cam_local)
        tier_origins = np.stack(
            [
                (np.asarray(camera.origin, dtype=np.float32)
                 - t.origin.astype(np.float32)) / np.float32(t.factor)
                for t in tiers
            ]
        ) if tiers else np.zeros((0, 3), dtype=np.float32)
        key = (id(mesh), axis, len(tiers), (w, h), "cam")
        fn = cache.get(key)
        if fn is None:
            fn = sharded_streaming_render_cam_fn(
                view, mesh, (w, h), axis=axis
            )
            cache[key] = fn
        rgb = fn(
            view.renderer.tree,
            tuple(t.renderer.tree for t in tiers),
            origin0,
            jnp.asarray(tier_origins),
            right,
            up,
            forward,
            scale,
            jnp.asarray(bg, dtype=jnp.float32),
        )
        return np.asarray(rgb).reshape(h, w, 3)

    # fallback: rows don't divide the mesh — host-built sharded rays
    o, d = cam_local.rays()
    o = np.asarray(o, dtype=np.float32).reshape(-1, 3)
    d = np.asarray(d, dtype=np.float32).reshape(-1, 3)
    flat_rays = [o, d]
    for tier in tiers:
        F = float(tier.factor)
        torig = tier.origin.astype(np.float32)
        cam_t = replace(
            camera,
            origin=(np.asarray(camera.origin, dtype=np.float32) - torig) / F,
            target=(np.asarray(camera.target, dtype=np.float32) - torig) / F,
        )
        o_t, d_t = cam_t.rays()
        flat_rays.append(np.asarray(o_t, dtype=np.float32).reshape(-1, 3))
        flat_rays.append(np.asarray(d_t, dtype=np.float32).reshape(-1, 3))

    sharded, n_rays = shard_rays(mesh, *flat_rays, axis=axis)
    o_sh, d_sh = sharded[0], sharded[1]
    tier_rays = tuple(
        (sharded[2 + 2 * i], sharded[3 + 2 * i]) for i in range(len(tiers))
    )
    key = (id(mesh), axis, len(tiers))
    fn = cache.get(key)
    if fn is None:
        fn = sharded_streaming_render_fn(view, mesh, axis=axis)
        cache[key] = fn
    rgb = fn(
        view.renderer.tree,
        tuple(t.renderer.tree for t in tiers),
        o_sh,
        d_sh,
        tier_rays,
        jnp.asarray(bg, dtype=jnp.float32),
    )
    return np.asarray(rgb)[:n_rays].reshape(h, w, 3)
