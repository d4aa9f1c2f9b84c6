"""Jitted JAX renderer: the vectorized boxtree ray-march automaton.

The reference's WGSL compute shader (reference:
src/raytracing/bevy/viewport_render.wgsl:366-612) re-expressed as a per-ray
``lax.while_loop`` state machine, vmapped over rays and jitted:

* PUSH/POP/ADVANCE over sectants with a 4-deep wrap-around register stack;
* occupancy culling via the 64-bit sectant bitmaps (as u32 word pairs) and
  the per-octant ray-reachability masks;
* in-brick DDA march with early exit;
* sectant offsets / steps computed arithmetically (no gathers where math is
  cheaper — the TPU-native choice).

This renderer is the *correctness* device path and the baseline for the
Pallas kernel in :mod:`voxelhex_tpu.ops`; both are validated against the
NumPy oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, BOX_NODE_DIMENSION
from voxelhex_tpu.spatial.luts import ray_occupancy_masks_u32
from voxelhex_tpu.tree.flat import EMPTY_DESC, NO_COLOR_HIT, SOLID_FLAG, FlatTree

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

_BIG = jnp.float32(1e30)
OOB = BOX_NODE_CHILDREN_COUNT  # 64

_MASK_LO, _MASK_HI = ray_occupancy_masks_u32()


def device_tree(flat: FlatTree) -> dict:
    """Upload a flat snapshot as a pytree of device arrays."""
    if flat.bricks.shape[0] == 0:
        # keep gathers well-defined for scenes with only solid bricks
        flat = flat.with_padding(node_multiple=1, brick_multiple=1)
    return {
        "node_meta": jnp.asarray(flat.node_meta, dtype=U32),
        "node_children": jnp.asarray(flat.node_children, dtype=I32),
        "node_ocbits": jnp.asarray(flat.node_ocbits, dtype=U32),
        "node_mips": jnp.asarray(flat.node_mips, dtype=I32),
        "bricks": jnp.asarray(flat.bricks, dtype=I32),
        "palette": jnp.asarray(flat.palette, dtype=F32),
        "size": jnp.asarray(float(flat.size), dtype=F32),
    }


# ---------------------------------------------------------------------------
# vector helpers (traced, scalar-per-ray)
# ---------------------------------------------------------------------------


def _offset_sectant(offset, size):
    idx = jnp.clip(
        jnp.floor(offset * BOX_NODE_DIMENSION / size), 0, BOX_NODE_DIMENSION - 1
    ).astype(I32)
    return idx[0] + idx[1] * 4 + idx[2] * 16


def _step_sectant(sectant, step):
    s = jnp.sign(step).astype(I32)
    x = sectant % 4 + s[0]
    y = (sectant // 4) % 4 + s[1]
    z = sectant // 16 + s[2]
    inside = (
        (x >= 0) & (x < 4) & (y >= 0) & (y < 4) & (z >= 0) & (z < 4)
    )
    return jnp.where(inside, x + y * 4 + z * 16, OOB)


def _sectant_offset(sectant):
    return (
        jnp.stack([sectant % 4, (sectant // 4) % 4, sectant // 16]).astype(F32) * 0.25
    )


def _dda_scale_factors(d):
    dx, dy, dz = d[0], d[1], d[2]
    fx = jnp.sqrt(1.0 + (dz / dx) ** 2 + (dy / dx) ** 2)
    fy = jnp.sqrt((dx / dy) ** 2 + 1.0 + (dz / dy) ** 2)
    fz = jnp.sqrt((dx / dz) ** 2 + 1.0 + (dy / dz) ** 2)
    return jnp.stack([fx, fy, fz])


def _dda_step(d, sf, point, cell_min, cell_size):
    """One DDA step to the next sibling cell; returns (new_point, step)."""
    signum = jnp.sign(d)
    steps_needed = cell_size * jnp.maximum(signum, 0.0) - signum * (point - cell_min)
    dists = jnp.abs(steps_needed * sf)
    dists = jnp.where(d == 0.0, _BIG, dists)  # kill inf*0 NaNs
    dists = jnp.where(jnp.isnan(dists), _BIG, dists)
    min_step = jnp.min(dists)
    new_point = point + d * min_step
    step = jnp.where(dists == min_step, signum, 0.0)
    return new_point, step


def _impact_normal(cell_min, cell_size, point):
    mid_to_impact = cell_min + cell_size / 2.0 - point
    a = jnp.abs(mid_to_impact)
    m = jnp.max(a)
    n = jnp.where(a == m, -mid_to_impact, 0.0)
    norm = jnp.sqrt(jnp.sum(n * n))
    return n / jnp.maximum(norm, 1e-12)


def _intersect_root(o, d, size):
    t_lo = (0.0 - o) / d
    t_hi = (size - o) / d
    per_min = jnp.fmin(t_lo, t_hi)
    per_max = jnp.fmax(t_lo, t_hi)
    tmin = jnp.fmax(jnp.fmax(per_min[0], per_min[1]), per_min[2])
    tmax = jnp.fmin(jnp.fmin(per_max[0], per_max[1]), per_max[2])
    hit = ~((tmax < 0.0) | (tmin > tmax))
    enter = jnp.maximum(tmin, 0.0)
    return hit, enter


def _occ_bit(lo, hi, sectant):
    """Bit ``sectant`` (0..63) of the (lo, hi) u32 occupancy pair."""
    s = jnp.clip(sectant, 0, 63)
    word = jnp.where(s < 32, lo, hi)
    return (word >> (s % 32).astype(U32)) & U32(1)


# ---------------------------------------------------------------------------
# per-ray traversal
# ---------------------------------------------------------------------------


def _make_trace_ray(brick_dim: int, max_outer: int = 8, max_inner: int = 512):
    """Build the scalar per-ray tracer for a static brick dimension."""
    d3 = brick_dim**3

    def probe_brick(tree, desc, point, dirv, sf, bmin, bsize):
        """Returns (hit, voxel, brick_idx, cell_flat, point_after, hit_point,
        normal).  ``brick_idx``/``cell_flat`` are -1 for solid bricks."""
        is_solid = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) != 0)
        is_parted = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) == 0)

        def solid_case(_):
            voxel = desc & (~SOLID_FLAG)
            return (
                jnp.bool_(True),
                voxel,
                I32(-1),
                I32(-1),
                point,
                point,
                _impact_normal(bmin, bsize, point),
            )

        def parted_case(_):
            unit = bsize / brick_dim
            rel = (point - bmin) * brick_dim / bsize
            idx0 = jnp.clip(rel.astype(I32), 0, brick_dim - 1)
            brick_row = tree["bricks"][jnp.maximum(desc, 0)]

            def cond(st):
                idx, p, hit, _v, it = st
                inb = jnp.all((idx >= 0) & (idx < brick_dim))
                return inb & (~hit) & (it < max_inner)

            def body(st):
                idx, p, hit, v, it = st
                flat = idx[0] + idx[1] * brick_dim + idx[2] * brick_dim * brick_dim
                voxel = brick_row[flat]
                found = voxel != EMPTY_DESC
                cell_min = bmin + idx.astype(F32) * unit
                new_p, step = _dda_step(dirv, sf, p, cell_min, unit)
                p2 = jnp.where(found, p, new_p)
                idx2 = jnp.where(found, idx, idx + step.astype(I32))
                return (idx2, p2, found, jnp.where(found, voxel, v), it + 1)

            idx, p, hit, v, _ = jax.lax.while_loop(
                cond, body, (idx0, point, jnp.bool_(False), I32(EMPTY_DESC), I32(0))
            )
            cell_min = bmin + idx.astype(F32) * unit
            normal = _impact_normal(cell_min, unit, p)
            idxc = jnp.clip(idx, 0, brick_dim - 1)
            flat = idxc[0] + idxc[1] * brick_dim + idxc[2] * brick_dim * brick_dim
            return hit, v, desc, flat, p, p, normal

        def empty_case(_):
            return (
                jnp.bool_(False),
                I32(EMPTY_DESC),
                I32(-1),
                I32(-1),
                point,
                point,
                jnp.zeros(3, dtype=F32),
            )

        return jax.lax.cond(
            is_solid,
            solid_case,
            lambda _: jax.lax.cond(is_parted, parted_case, empty_case, None),
            None,
        )

    def trace_ray(tree, o, dirv):
        size = tree["size"]
        sf = _dda_scale_factors(dirv)
        octant = (
            (dirv[0] >= 0).astype(I32)
            + (dirv[2] >= 0).astype(I32) * 2
            + (dirv[1] >= 0).astype(I32) * 4
        )
        mask_lo = jnp.asarray(_MASK_LO)[:, octant]
        mask_hi = jnp.asarray(_MASK_HI)[:, octant]

        root_hit, enter = _intersect_root(o, dirv, size)
        point0 = o + dirv * enter
        tsect0 = jnp.where(
            root_hit, _offset_sectant(point0, size), I32(OOB)
        ).astype(I32)

        def inner(carry):
            """One full root-restart pass: run the stack automaton dry."""
            (point, tsect, hit, voxel, hbrick, hcell, hpoint, hnormal,
             _restarts) = carry

            cur_min = jnp.zeros(3, dtype=F32)
            cur_size = size
            toff = _sectant_offset(tsect) * cur_size
            tmin = cur_min + toff
            tsize = cur_size / BOX_NODE_DIMENSION
            stack = jnp.zeros(4, dtype=I32)
            head = I32(0)
            count = I32(1)
            cur_key = I32(0)

            st = (point, tsect, tmin, tsize, cur_min, cur_size, cur_key,
                  stack, head, count, hit, voxel, hbrick, hcell, hpoint,
                  hnormal, I32(0))

            def cond(st):
                count, hit, it = st[9], st[10], st[16]
                return (count > 0) & (~hit) & (it < max_inner)

            def body(st):
                (point, tsect, tmin, tsize, cur_min, cur_size, cur_key,
                 stack, head, count, hit, voxel, hbrick, hcell, hpoint,
                 hnormal, it) = st

                top = stack[head]
                occ_lo = tree["node_ocbits"][top, 0]
                occ_hi = tree["node_ocbits"][top, 1]
                meta = tree["node_meta"][cur_key]
                is_leaf = (meta & U32(1)) != 0
                is_uniform = (meta & U32(2)) != 0

                # --- probe bricks on leaf nodes
                tsect_c = jnp.clip(tsect, 0, 63)
                desc = tree["node_children"][cur_key, tsect_c]
                child_off = _sectant_offset(tsect_c) * cur_size
                bmin = jnp.where(is_uniform, cur_min, cur_min + child_off)
                bsize = jnp.where(
                    is_uniform, cur_size, cur_size / BOX_NODE_DIMENSION
                )
                do_probe = is_leaf & (tsect < OOB) & (~hit)
                (p_hit, p_voxel, p_brick, p_cell, p_point, p_hpoint,
                 p_normal) = jax.lax.cond(
                    do_probe,
                    lambda _: probe_brick(tree, desc, point, dirv, sf, bmin, bsize),
                    lambda _: (jnp.bool_(False), I32(EMPTY_DESC), I32(-1),
                               I32(-1), point, point, jnp.zeros(3, dtype=F32)),
                    None,
                )
                point = p_point
                hit2 = hit | p_hit
                voxel = jnp.where(p_hit, p_voxel, voxel)
                hbrick = jnp.where(p_hit, p_brick, hbrick)
                hcell = jnp.where(p_hit, p_cell, hcell)
                hpoint = jnp.where(p_hit, p_hpoint, hpoint)
                hnormal = jnp.where(p_hit, p_normal, hnormal)

                do_backtrack = is_uniform  # uniform leaf miss -> POP

                occ_zero = (occ_lo == 0) & (occ_hi == 0)
                m_lo = mask_lo[tsect_c]
                m_hi = mask_hi[tsect_c]
                no_overlap = ((occ_lo & m_lo) == 0) & ((occ_hi & m_hi) == 0)
                want_pop = (
                    do_backtrack | (tsect >= OOB) | occ_zero | no_overlap
                )

                occ_target = _occ_bit(occ_lo, occ_hi, tsect) != 0
                want_push = (~is_leaf) & occ_target & (tsect < OOB)

                # --- POP
                def pop_case(_):
                    new_count = count - 1
                    new_head = (head - 1) % 4
                    p_tmin = cur_min
                    p_tsize = cur_size
                    p_cur_size = cur_size * BOX_NODE_DIMENSION
                    p_cur_min = cur_min - jnp.mod(cur_min, p_cur_size)
                    ts = _offset_sectant(
                        p_tmin + p_tsize / 2.0 - p_cur_min, p_cur_size
                    )
                    new_point, step = _dda_step(dirv, sf, point, p_tmin, p_tsize)
                    ts = _step_sectant(ts, step)
                    p_tmin2 = p_tmin + step * p_tsize
                    new_key = jnp.where(new_count > 0, stack[new_head], cur_key)
                    return (new_point, ts, p_tmin2, p_tsize, p_cur_min,
                            p_cur_size, new_key, stack, new_head, new_count)

                # --- PUSH
                def push_case(_):
                    child_key = tree["node_children"][cur_key, tsect_c]
                    n_cur_min = tmin
                    n_cur_size = tsize
                    ts = _offset_sectant(point - n_cur_min, n_cur_size)
                    n_tmin = n_cur_min + _sectant_offset(ts) * n_cur_size
                    n_tsize = n_cur_size / BOX_NODE_DIMENSION
                    new_head = (head + 1) % 4
                    new_stack = stack.at[new_head].set(child_key)
                    new_count = jnp.minimum(count + 1, 4)
                    return (point, ts, n_tmin, n_tsize, n_cur_min, n_cur_size,
                            child_key, new_stack, new_head, new_count)

                # --- ADVANCE
                def advance_case(_):
                    def acond(ast):
                        ts, _tm, _p, it2 = ast
                        stop = (ts >= OOB) | (_occ_bit(occ_lo, occ_hi, ts) != 0)
                        return (~stop) & (it2 < 16)

                    def abody(ast):
                        ts, tm, p, it2 = ast
                        new_p, step = _dda_step(dirv, sf, p, tm, tsize)
                        ts2 = _step_sectant(ts, step)
                        tm2 = jnp.where(ts2 < OOB, tm + step * tsize, tm)
                        return ts2, tm2, new_p, it2 + 1

                    # always take at least one step (mirrors the do-while)
                    new_p, step = _dda_step(dirv, sf, point, tmin, tsize)
                    ts = _step_sectant(tsect, step)
                    tm = jnp.where(ts < OOB, tmin + step * tsize, tmin)
                    ts, tm, new_p, _ = jax.lax.while_loop(
                        acond, abody, (ts, tm, new_p, I32(0))
                    )
                    return (new_p, ts, tm, tsize, cur_min, cur_size, cur_key,
                            stack, head, count)

                new_state = jax.lax.cond(
                    want_pop & (~hit2),
                    pop_case,
                    lambda _: jax.lax.cond(
                        want_push & (~hit2), push_case, advance_case, None
                    ),
                    None,
                )
                (point2, tsect2, tmin2, tsize2, cur_min2, cur_size2, cur_key2,
                 stack2, head2, count2) = jax.lax.cond(
                    hit2,
                    lambda _: (point, tsect, tmin, tsize, cur_min, cur_size,
                               cur_key, stack, head, count),
                    lambda _: new_state,
                    None,
                )
                return (point2, tsect2, tmin2, tsize2, cur_min2, cur_size2,
                        cur_key2, stack2, head2, count2, hit2, voxel, hbrick,
                        hcell, hpoint, hnormal, it + 1)

            st = jax.lax.while_loop(cond, body, st)
            (point, tsect, _tm, _ts, _cm, _cs, _ck, _stk, _h, _c, hit, voxel,
             hbrick, hcell, hpoint, hnormal, _it) = st

            # restart logic: nudge forward, re-derive sectant
            point = point + dirv * 0.1
            inside = jnp.all((point > 0.0) & (point < size))
            tsect = jnp.where(
                hit, I32(OOB), jnp.where(inside, _offset_sectant(point, size), I32(OOB))
            ).astype(I32)
            return (point, tsect, hit, voxel, hbrick, hcell, hpoint, hnormal,
                    carry[8] + 1)

        def outer_cond(carry):
            tsect, hit, restarts = carry[1], carry[2], carry[8]
            return (tsect < OOB) & (~hit) & (restarts < max_outer)

        init = (point0, tsect0, jnp.bool_(False), I32(EMPTY_DESC), I32(-1),
                I32(-1), jnp.zeros(3, dtype=F32), jnp.zeros(3, dtype=F32),
                I32(0))
        final = jax.lax.while_loop(outer_cond, lambda c: inner(c), init)
        _point, _tsect, hit, voxel, hbrick, hcell, hpoint, hnormal, _r = final
        return hit, voxel, hbrick, hcell, hpoint, hnormal

    return trace_ray


class JaxRenderer:
    """Jitted whole-frame renderer over a device-resident flat tree."""

    def __init__(self, flat: FlatTree, max_inner: int = 2048):
        self.flat = flat
        self.tree = device_tree(flat)
        self.brick_dim = flat.brick_dim
        self._trace = _make_trace_ray(flat.brick_dim, max_inner=max_inner)

        @jax.jit
        def trace_batch(tree, origins, dirs):
            return jax.vmap(lambda o, d: self._trace(tree, o, d))(origins, dirs)

        self._trace_batch = trace_batch

        @jax.jit
        def shade_batch(tree, origins, dirs, bg):
            hit, voxel, _hb, _hc, hpoint, hnormal = jax.vmap(
                lambda o, d: self._trace(tree, o, d)
            )(origins, dirs)
            return _shade(tree, hit, voxel, hnormal, bg)

        self._shade_batch = shade_batch

    def trace(self, origins, directions):
        """Raw per-ray results: (hit [R], voxel [R], brick [R], cell [R],
        point [R,3], normal [R,3])."""
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        d = jnp.asarray(directions, dtype=F32).reshape(-1, 3)
        return self._trace_batch(self.tree, o, d)

    def render(self, camera, bg=(0.0, 0.0, 0.0)):
        """Render a full frame; returns [H, W, 3] float32."""
        origins, dirs = camera.rays()
        h, w = origins.shape[:2]
        rgb = self._shade_batch(
            self.tree,
            jnp.asarray(origins.reshape(-1, 3)),
            jnp.asarray(dirs.reshape(-1, 3)),
            jnp.asarray(bg, dtype=F32),
        )
        return np.asarray(rgb).reshape(h, w, 3)


def _shade(tree, hit, voxel, normal, bg):
    """Reference shading: albedo * (dot(n, L)/2 + 0.5) on hit, else
    background (reference: viewport_render.wgsl:749-753)."""
    light = jnp.asarray([-0.5, 0.5, -0.5], dtype=F32)
    has_color = hit & (voxel != NO_COLOR_HIT) & (voxel >= 0)
    albedo = tree["palette"][jnp.clip(voxel, 0, tree["palette"].shape[0] - 1), :3]
    albedo = jnp.where(has_color[:, None], albedo, 0.0)
    lambert = jnp.sum(normal * light[None, :], axis=-1) / 2.0 + 0.5
    lit = albedo * lambert[:, None]
    return jnp.where(hit[:, None], lit, jnp.broadcast_to(bg, lit.shape))
