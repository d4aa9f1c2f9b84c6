"""Mesh-sharded STREAMING rendering: the out-of-core terrain path with
rays data-parallel over a device mesh.

This is the BASELINE "large terrain scene at 1080p with sharded ray
tiles (streaming path)" configuration as one composition: host-side
paging (window updates, far-ring refresh) is exactly
:class:`~voxelhex_tpu.render.streaming.StreamingView`'s, while the
per-frame device work — the window trace, one coarse trace per far-field
LOD ring, and the min-distance composite — runs per-shard under
``shard_map`` with the window and ring grids REPLICATED and the rays
sharded.  The composite is elementwise, so the whole frame needs no
collectives (rays are embarrassingly parallel; the reference's analog is
the single-GPU streaming render of ``src/raytracing/bevy/streaming/`` —
here the same frame fans out over every chip on the mesh).

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


def sharded_streaming_render_fn(view, mesh: Mesh, axis: str = "rays"):
    """Jitted per-frame render over the view's CURRENT ring structure:
    ``fn(win_tree, tier_trees, o, d, tier_rays, bg) -> rgb[R, 3]`` with
    rays sharded over ``axis`` and every grid replicated.

    The traced ring structure (count, factors) is fixed per
    (world size, view size); :func:`render_streaming_sharded` caches one
    fn per ring count and rebuilds only if it changes.
    """
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
    traces shard.
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
    o, d = cam_local.rays()
    o = np.asarray(o, dtype=np.float32).reshape(-1, 3)
    d = np.asarray(d, dtype=np.float32).reshape(-1, 3)

    tiers = tuple(view.far.tiers) if view.far is not None else ()
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

    sharded, n = shard_rays(mesh, *flat_rays, axis=axis)
    o_sh, d_sh = sharded[0], sharded[1]
    tier_rays = tuple(
        (sharded[2 + 2 * i], sharded[3 + 2 * i]) for i in range(len(tiers))
    )

    cache = view.__dict__.setdefault("_sharded_stream_fns", {})
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
    return np.asarray(rgb)[:n].reshape(h, w, 3)
