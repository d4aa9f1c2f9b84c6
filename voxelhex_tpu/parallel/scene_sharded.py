"""Scene-sharded rendering: the WORLD split across devices, rays replicated.

The TP analog from SURVEY §2.4 — "sharding the brick pool for vast scenes":
where :mod:`voxelhex_tpu.parallel.bitgrid_sharded` replicates the scene and
shards rays (DP), this module partitions the world into per-device cubic
octant sub-volumes, so each chip stores only 1/N of the voxel data.  Scenes
can then exceed single-chip HBM by the octant factor (8 for a 2x2x2 split,
64 for 4x4x4).

No ray routing is needed: rays travel straight lines, so the global first
hit is simply the minimum-distance hit over the per-octant independent
marches.  (Rays hitting EXACTLY on a voxel edge have two equal-distance
first hits; the octant-local march may resolve such measure-zero ties
differently from the global march — both answers are valid first hits.)  Each device traces ALL rays against its own sub-volume (the
tracer's ray/AABB clip starts them at the octant boundary, so per-device
march lengths shrink with the octant size), then one ``pmin``/``psum``
combine selects the winning hit per ray — communication is O(rays), not
O(scene), and rides ICI.

Reference analog: the victim-cache streaming of
src/raytracing/bevy/streaming/cache.rs keeps ONE GPU's memory bounded; this
is the multi-chip generalization the reference lacks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voxelhex_tpu.render.bitgrid import (
    BitGrid,
    BitGridRenderer,
    device_bitgrid,
    _pack_bits,
)
from voxelhex_tpu.render.jax_renderer import _shade
from voxelhex_tpu.tree.flat import FlatTree, flatten

F32 = jnp.float32
I32 = jnp.int32

shard_map = jax.shard_map


def _window_occ_colors(flat: FlatTree, origin, wsize: int):
    """Dense (occ bool [x,y,z], colors u16 flat x-fastest) of one window."""
    from voxelhex_tpu import native

    nat = native.rasterize_window(flat, int(origin[0]), int(origin[1]),
                                  int(origin[2]), wsize)
    if nat is not None:
        occ_flat, col_flat = nat
        # native output is x-fastest flat -> [z,y,x]; _pack_bits wants [x,y,z]
        occ = occ_flat.reshape(wsize, wsize, wsize).transpose(2, 1, 0)
        return occ.astype(bool), col_flat
    # NumPy fallback: rasterize the full grid once (cached) and slice
    from voxelhex_tpu.render.bitgrid import _dense_from_flat

    cache = getattr(flat, "_dense_cache", None)
    if cache is None:
        cache = _dense_from_flat(flat)
        try:
            flat._dense_cache = cache
        except Exception:
            pass
    occ_full, col_full = cache  # [x,y,z] grids
    ox, oy, oz = (int(c) for c in origin)
    occ = occ_full[ox:ox + wsize, oy:oy + wsize, oz:oz + wsize]
    col = col_full[ox:ox + wsize, oy:oy + wsize, oz:oz + wsize]
    return occ.astype(bool), col.transpose(2, 1, 0).ravel()


def build_octant_grids(source, n_per_axis: int = 2):
    """Partition the scene into ``n_per_axis**3`` cubic sub-volumes.

    Returns ``(stacked_tree, octant_mins, renderer)``: a device-tree dict
    with a leading octant axis on every leaf (shard it over the mesh), the
    [N, 3] f32 octant origins, and a :class:`BitGridRenderer` built for the
    octant shape whose ``_trace`` closure drives the per-device march.
    """
    flat = source if isinstance(source, FlatTree) else flatten(source)
    S = int(flat.size)
    W = S // n_per_axis
    assert W * n_per_axis == S and W >= 4, (S, n_per_axis)

    n_colors = max(1, len(flat.palette))
    n_rows = 64
    while n_rows < n_colors:
        n_rows *= 2
    palette = np.zeros((n_rows, 4), dtype=np.float32)
    palette[:len(flat.palette)] = np.asarray(flat.palette, dtype=np.float32)

    # u8 device color grids when the palette fits a byte: halves the color
    # HBM per octant — the dominant per-voxel cost for resident vast scenes.
    # One global decision so every octant's arrays share a dtype (stacking).
    use_u8 = len(flat.palette) <= 254

    trees = []
    mins = []
    renderer = None
    for oz in range(n_per_axis):
        for oy in range(n_per_axis):
            for ox in range(n_per_axis):
                origin = (ox * W, oy * W, oz * W)
                occ, colors = _window_occ_colors(flat, origin, W)
                levels_lo, levels_hi = [], []
                grid = occ
                while grid.shape[0] > 1:
                    lo, hi, coarse = _pack_bits(grid)
                    levels_lo.append(lo)
                    levels_hi.append(hi)
                    grid = coarse
                bases = np.zeros(len(levels_lo), dtype=np.int64)
                for i in range(1, len(levels_lo)):
                    bases[i] = bases[i - 1] + len(levels_lo[i - 1])
                bg = BitGrid(
                    size=W,
                    n_levels=len(levels_lo),
                    level_bases=bases,
                    occ_lo=np.concatenate(levels_lo),
                    occ_hi=np.concatenate(levels_hi),
                    colors=np.asarray(colors, dtype=np.uint16),
                    palette=palette,
                )
                if renderer is None:
                    renderer = BitGridRenderer(bg, color_u8=use_u8)
                trees.append(device_bitgrid(bg, color_u8=use_u8))
                mins.append(origin)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    octant_mins = jnp.asarray(np.array(mins, dtype=np.float32))
    return stacked, octant_mins, renderer


def sharded_scene_render_fn(renderer: BitGridRenderer, mesh: Mesh,
                            axis: str = "scene"):
    """Jitted ``render(stacked_tree, octant_mins, origins, dirs, bg) -> rgb``
    with the SCENE sharded over the mesh axis and rays replicated.

    Per device: march all rays against the local sub-volume (ray/AABB clip
    starts them at the octant boundary), then select the global first hit by
    minimum hit distance across the axis and psum the winner's shading."""
    trace = renderer._trace

    def local(tree, omins, o, d, bg):
        local_tree = jax.tree.map(lambda a: a[0], tree)
        omin = omins[0]  # [3] this device's octant origin
        o_local = o - omin[None, :]
        hit, voxel, _hv, hpoint, hnormal = trace(local_tree, o_local, d)
        t = jnp.linalg.norm(hpoint - o_local, axis=-1)
        t = jnp.where(hit, t, jnp.inf)
        rgb = _shade(local_tree, hit, voxel, hnormal, jnp.zeros(3, dtype=F32))

        idx = jax.lax.axis_index(axis).astype(I32)
        tmin = jax.lax.pmin(t, axis)
        big = jnp.iinfo(jnp.int32).max
        cand = jnp.where(hit & (t <= tmin), idx, big)
        sel = jax.lax.pmin(cand, axis)  # winning device per ray (big = miss)
        mine = (sel == idx)[:, None]
        rgb_out = jax.lax.psum(jnp.where(mine, rgb, 0.0), axis)
        return jnp.where((sel == big)[:, None], bg[None, :], rgb_out)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def hybrid_render_fn(renderer: BitGridRenderer, mesh: Mesh, octs_per_dev: int,
                     scene_axis: str = "scene", ray_axis: str = "rays"):
    """Jitted render over a 2-D mesh: scene octants sharded on ``scene_axis``,
    rays data-parallel on ``ray_axis`` — HBM capacity and ray throughput
    scale together.

    Each device holds ``octs_per_dev`` world octants and traces only its ray
    shard against them (octants combine locally by min hit distance), then
    one ``pmin``/``psum`` across the scene axis selects the global first hit
    per ray.  Collectives move O(rays/ray_shards) data and ride ICI; the ray
    axis needs no communication at all.  A (1, N) mesh degenerates to pure
    ray DP (:mod:`voxelhex_tpu.parallel.bitgrid_sharded`); an (N, 1) mesh to
    pure scene sharding (:func:`sharded_scene_render_fn`).
    """
    trace = renderer._trace

    def local(tree, omins, o, d, bg):
        R = o.shape[0]
        best_t = jnp.full(R, jnp.inf, dtype=F32)
        best_rgb = jnp.zeros((R, 3), dtype=F32)
        for k in range(octs_per_dev):
            k_tree = jax.tree.map(lambda a: a[k], tree)
            omin = omins[k]
            o_local = o - omin[None, :]
            hit, voxel, _hv, hpoint, hnormal = trace(k_tree, o_local, d)
            t = jnp.where(hit, jnp.linalg.norm(hpoint - o_local, axis=-1), jnp.inf)
            rgb = _shade(k_tree, hit, voxel, hnormal, jnp.zeros(3, dtype=F32))
            better = t < best_t  # strict: first octant wins exact-edge ties
            best_rgb = jnp.where(better[:, None], rgb, best_rgb)
            best_t = jnp.minimum(t, best_t)

        idx = jax.lax.axis_index(scene_axis).astype(I32)
        tmin = jax.lax.pmin(best_t, scene_axis)
        big = jnp.iinfo(jnp.int32).max
        hit_any = jnp.isfinite(best_t)
        cand = jnp.where(hit_any & (best_t <= tmin), idx, big)
        sel = jax.lax.pmin(cand, scene_axis)  # winning device (big = miss)
        mine = (sel == idx)[:, None]
        rgb_out = jax.lax.psum(jnp.where(mine, best_rgb, 0.0), scene_axis)
        return jnp.where((sel == big)[:, None], bg[None, :], rgb_out)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(scene_axis), P(scene_axis), P(ray_axis), P(ray_axis), P()),
        out_specs=P(ray_axis),
        check_vma=False,
    )
    return jax.jit(fn)


def render_hybrid(source, camera, mesh: Mesh, bg=(0.0, 0.0, 0.0),
                  n_per_axis: int = 2, scene_axis: str = "scene",
                  ray_axis: str = "rays"):
    """Convenience one-shot over a 2-D (scene, rays) mesh: build octant
    grids, shard scene + rays, render a frame."""
    from voxelhex_tpu.render.camera import device_rays

    stacked, mins, renderer = build_octant_grids(source, n_per_axis)
    n_scene = mesh.shape[scene_axis]
    n_rays = mesh.shape[ray_axis]
    n_oct = n_per_axis**3
    assert n_oct % n_scene == 0, (n_oct, n_scene)
    fn = hybrid_render_fn(renderer, mesh, n_oct // n_scene, scene_axis, ray_axis)
    o, d = device_rays(camera)
    R = o.shape[0]
    pad = (-R) % n_rays
    if pad:  # pad with copies of the last ray (zero-direction rays are UB)
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])
    rgb = fn(stacked, mins, o, d, jnp.asarray(bg, dtype=F32))[:R]
    w, h = camera.resolution
    return np.asarray(rgb).reshape(h, w, 3)


def render_scene_sharded(source, camera, mesh: Mesh, bg=(0.0, 0.0, 0.0),
                         n_per_axis: int = 2):
    """Convenience one-shot: build octant grids, shard them, render a frame."""
    from voxelhex_tpu.render.camera import device_rays

    stacked, mins, renderer = build_octant_grids(source, n_per_axis)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_oct = n_per_axis**3
    assert n_oct % n_dev == 0, (n_oct, n_dev)
    fn = sharded_scene_render_fn(renderer, mesh, axis)
    o, d = device_rays(camera)
    rgb = fn(stacked, mins, o, d, jnp.asarray(bg, dtype=F32))
    w, h = camera.resolution
    return np.asarray(rgb).reshape(h, w, 3)
